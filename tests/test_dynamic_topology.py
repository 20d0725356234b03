"""Dynamic graph topology without retraces (``dynamic_topology=True``).

The reference's edge count is a RUNTIME kernel parameter — launches guard
``idx < N`` (util.t:728 getValidGraphElement), so per-frame topology changes
(nonrigid tracking) never recompile. Under jit the edge axis is a shape, so
the plan instead pads every graph to a power-of-two edge bucket with
zero-``valid`` edges (exact edge-mask semantics, tests/test_edge_mask.py),
buckets the derived incidence-table widths, and skips the
topology-specialized DIA split: topologies in one bucket share one
trace/compile, and only the cheap vectorized host tables rebuild.
"""

import numpy as np
import pytest

import opt_tpu as ot
from opt_tpu.models.specs import arap_mesh_deformation

from test_edge_mask import _arap_edges, _inputs


def _subset(v0, v1, seed, frac):
    keep = np.random.RandomState(seed).rand(len(v0)) > frac
    return v0[keep], v1[keep]


def test_operator_matches_exact_topology():
    """Padded edges contribute exactly nothing: JᵀJ from the dynamic plan's
    (padded) dumped J equals the exact-topology plan's, in float64."""
    N, pos, v0, v1, con = _arap_edges(6)
    v0s, v1s = _subset(v0, v1, 0, 0.25)
    plan_d = ot.Problem(arap_mesh_deformation).plan(
        dims={"N": N}, dynamic_topology=True
    )
    plan_r = ot.Problem(arap_mesh_deformation).plan(dims={"N": N})
    inp = _inputs(pos, con, {"v0": v0s, "v1": v1s})
    Jd = np.asarray(plan_d.dump_jacobian(inp, dense=True), np.float64)
    Jr = np.asarray(plan_r.dump_jacobian(dict(inp), dense=True), np.float64)
    np.testing.assert_allclose(Jd.T @ Jd, Jr.T @ Jr, rtol=1e-6, atol=1e-9)
    # every extra (padded) row is exactly zero
    assert int((~Jd.any(axis=1)).sum()) >= Jd.shape[0] - Jr.shape[0]


@pytest.mark.parametrize("kind", ["gaussNewtonGPU", "LMGPU"])
def test_same_bucket_topologies_share_one_trace(kind):
    """Different edge counts / max degrees within one bucket: the second
    and third solves must hit the jit cache, and each must match an
    exact-topology plan's result (loose tolerance: the exact plan runs the
    DIA-split apply, a different float reduction order)."""
    N, pos, v0, v1, con = _arap_edges(8)
    sp = dict(nIterations=3, lIterations=15)
    plan = ot.Problem(arap_mesh_deformation, kind=kind).plan(
        dims={"N": N}, dynamic_topology=True
    )
    topos = [
        (v0, v1),
        _subset(v0, v1, 0, 0.25),
        _subset(v0, v1, 1, 0.35),
    ]
    results, sizes = [], []
    for va, vb in topos:
        results.append(plan.solve(_inputs(pos, con, {"v0": va, "v1": vb}), **sp))
        sizes.append(plan.solver._solve_fused._cache_size())
    assert sizes[1] == sizes[0], "second topology retraced"
    assert sizes[2] == sizes[0], "third topology retraced"
    for (va, vb), res in zip(topos[1:], results[1:]):
        ref = ot.Problem(arap_mesh_deformation, kind=kind).plan(
            dims={"N": N}
        ).solve(_inputs(pos, con, {"v0": va, "v1": vb}), **sp)
        np.testing.assert_allclose(res.final_cost, ref.final_cost, rtol=2e-3)


def test_user_valid_mask_composes_with_padding():
    """A user 0/1 mask on a dynamic plan equals the exact kept-subset solve
    on a plain plan (mask + pad mask merge)."""
    N, pos, v0, v1, con = _arap_edges(8)
    keep = np.random.RandomState(2).rand(len(v0)) > 0.3
    sp = dict(nIterations=3, lIterations=15)
    r_dyn = ot.Problem(arap_mesh_deformation).plan(
        dims={"N": N}, dynamic_topology=True
    ).solve(
        _inputs(
            pos, con,
            {"v0": v0, "v1": v1, "valid": keep.astype(np.float32)},
        ),
        **sp,
    )
    r_ref = ot.Problem(arap_mesh_deformation).plan(dims={"N": N}).solve(
        _inputs(pos, con, {"v0": v0[keep], "v1": v1[keep]}), **sp
    )
    np.testing.assert_allclose(r_dyn.final_cost, r_ref.final_cost, rtol=2e-3)


def test_composed_path_and_bucket_crossing():
    """use_fused_jtj=False exercises the composed Jᵀ(J·p) under padding;
    a topology in a DIFFERENT bucket recompiles (expected) but stays
    correct."""
    N, pos, v0, v1, con = _arap_edges(8)
    sp = dict(nIterations=2, lIterations=10)
    ip = ot.InitializationParameters(use_fused_jtj=False, dynamic_topology=True)
    plan = ot.Problem(arap_mesh_deformation).plan(dims={"N": N}, init_params=ip)
    plan.solve(_inputs(pos, con, {"v0": v0, "v1": v1}), **sp)
    # 20 edges buckets far below len(v0)=224's bucket
    v0t, v1t = v0[:20], v1[:20]
    r_dyn = plan.solve(_inputs(pos, con, {"v0": v0t, "v1": v1t}), **sp)
    r_ref = ot.Problem(arap_mesh_deformation).plan(
        dims={"N": N}, init_params=ot.InitializationParameters(use_fused_jtj=False)
    ).solve(_inputs(pos, con, {"v0": v0t, "v1": v1t}), **sp)
    np.testing.assert_allclose(r_dyn.final_cost, r_ref.final_cost, rtol=2e-3)


def test_dynamic_topology_under_mesh_shares_one_trace():
    """dynamic_topology composes with owner-block sharding: the halo
    tables' per-pair width M is bucketed too, so a changed topology in
    the same buckets hits the jit cache, and the sharded solve matches
    an exact single-device solve (loose tolerance: psum order drift)."""
    from opt_tpu.parallel.mesh import make_mesh

    N, pos, v0, v1, con = _arap_edges(16)
    sp = dict(nIterations=2, lIterations=10)
    # pin the single-device variant config: this test compares the sharded
    # solve against an exact single-device solve (the mesh auto policy
    # would otherwise pick a different CG trajectory — see
    # tests/test_auto_policy.py)
    plan = ot.Problem(arap_mesh_deformation).plan(
        dims={"N": N},
        mesh=make_mesh(),
        dynamic_topology=True,
        init_params=ot.InitializationParameters(
            cg_variant="standard",
            preconditioner="jacobi",
            edge_reorder=False,
        ),
    )
    plan.solve(_inputs(pos, con, {"v0": v0, "v1": v1}), **sp)
    csize = plan.solver._solve_fused._cache_size()
    va, vb = _subset(v0, v1, 4, 0.2)
    r_dyn = plan.solve(_inputs(pos, con, {"v0": va, "v1": vb}), **sp)
    assert plan.solver._solve_fused._cache_size() == csize, "retraced"
    r_ref = ot.Problem(arap_mesh_deformation).plan(dims={"N": N}).solve(
        _inputs(pos, con, {"v0": va, "v1": vb}), **sp
    )
    np.testing.assert_allclose(r_dyn.final_cost, r_ref.final_cost, rtol=5e-3)


def test_table_cache_is_bounded():
    """Per-frame topologies must not grow the host table cache without
    bound (LRU cap)."""
    N, pos, v0, v1, con = _arap_edges(5)
    plan = ot.Problem(arap_mesh_deformation).plan(
        dims={"N": N}, dynamic_topology=True
    )
    sp = dict(nIterations=1, lIterations=2)
    for seed in range(36):
        va, vb = _subset(v0, v1, seed, 0.2)
        plan.solve(_inputs(pos, con, {"v0": va, "v1": vb}), **sp)
    assert len(plan._inc_cache) <= 32
