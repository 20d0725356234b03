"""Per-edge ``valid`` masks: runtime edge activation without retraces.

The reference's edge count is a RUNTIME kernel parameter (launches guard
idx < N, util.t:728), so topology changes never recompile; here the edge
AXIS is a shape, but an optional per-graph ``valid`` mask (0/1 floats,
runtime input) deactivates edges per solve: masked edges contribute
nothing to residuals, J, JᵀF, the Jacobi diagonal or the cost — everything
flows through the masked r. Same topology + different mask = jit cache
hit and no table rebuilds."""

import numpy as np
import pytest

import opt_tpu as ot
from opt_tpu.models.specs import arap_mesh_deformation


def _arap_edges(n_side):
    N = n_side * n_side
    ii, jj = np.meshgrid(np.arange(n_side), np.arange(n_side), indexing="ij")
    pos = np.stack([ii.ravel(), jj.ravel(), np.zeros(N)], -1).astype(
        np.float32
    )
    vid = np.arange(N).reshape(n_side, n_side)
    v0 = np.concatenate([vid[:-1].ravel(), vid[:, :-1].ravel()])
    v1 = np.concatenate([vid[1:].ravel(), vid[:, 1:].ravel()])
    v0 = np.concatenate([v0, v1]).astype(np.int32)
    v1 = np.concatenate([v1, v0[: len(v1)]]).astype(np.int32)
    con = -np.ones((N, 3), np.float32)
    con[0] = pos[0]
    con[-1] = pos[-1] + [2, 0, 1]
    return N, pos, v0, v1, con


def _inputs(pos, con, g):
    return {
        "Offset": pos.copy(),
        "Angle": np.zeros_like(pos),
        "UrShape": pos,
        "Constraints": con,
        "G": g,
        "w_fitSqrt": np.float32(1.0),
        "w_regSqrt": np.float32(np.sqrt(0.5)),
    }


@pytest.mark.parametrize("kind", ["gaussNewtonGPU", "LMGPU"])
@pytest.mark.parametrize("fused", [True, False])
def test_masked_edges_match_subset_topology(kind, fused):
    """Solving the superset graph with a 0/1 mask must equal solving the
    kept-subset graph exactly (same energy)."""
    N, pos, v0, v1, con = _arap_edges(8)
    rng = np.random.RandomState(0)
    keep = rng.rand(len(v0)) > 0.3

    ip = ot.InitializationParameters(use_fused_jtj=fused)
    sp = dict(nIterations=4, lIterations=25)
    res_sub = ot.Problem(arap_mesh_deformation, kind=kind).plan(
        dims={"N": N}, init_params=ip
    ).solve(
        _inputs(pos, con, {"v0": v0[keep], "v1": v1[keep]}), **sp
    )
    res_msk = ot.Problem(arap_mesh_deformation, kind=kind).plan(
        dims={"N": N}, init_params=ip
    ).solve(
        _inputs(
            pos, con,
            {"v0": v0, "v1": v1, "valid": keep.astype(np.float32)},
        ),
        **sp,
    )
    np.testing.assert_allclose(
        res_msk.final_cost, res_sub.final_cost, rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res_msk.unknowns["Offset"]),
        np.asarray(res_sub.unknowns["Offset"]),
        atol=5e-4,
    )


def test_masked_edge_jacobian_rows_are_zero():
    from opt_tpu.jacobian import dump_jacobian_dense

    N, pos, v0, v1, con = _arap_edges(4)
    mask = np.ones(len(v0), np.float32)
    mask[[1, 5, 7]] = 0.0
    plan = ot.Problem(arap_mesh_deformation).plan(dims={"N": N})
    inputs = _inputs(pos, con, {"v0": v0, "v1": v1, "valid": mask})
    u, c, g, p = plan._normalize_and_place(dict(inputs))
    J = dump_jacobian_dense(plan.compiled, u, c, g, p)
    # the reg term's rows live per edge; masked edges' rows must be zero.
    # locate the graph term's row block via row count: reg term has
    # 3 channels per edge (find any rows that are all-zero and count them)
    zero_rows = np.where(~J.any(axis=1))[0]
    assert len(zero_rows) >= 3 * 3, (len(zero_rows), J.shape)


def test_mask_change_reuses_compiled_solve():
    """Same topology + different mask: no retrace (the mask is a runtime
    input), and the incidence-table cache key (topology hash) is unhit."""
    N, pos, v0, v1, con = _arap_edges(8)
    plan = ot.Problem(arap_mesh_deformation).plan(dims={"N": N})
    m1 = np.ones(len(v0), np.float32)
    m2 = m1.copy()
    m2[::3] = 0.0
    sp = dict(nIterations=2, lIterations=10)
    r1 = plan.solve(_inputs(pos, con, {"v0": v0, "v1": v1, "valid": m1}), **sp)
    jit_sizes = plan.solver._solve_fused._cache_size()
    n_tables = len(plan._inc_cache)
    r2 = plan.solve(_inputs(pos, con, {"v0": v0, "v1": v1, "valid": m2}), **sp)
    assert plan.solver._solve_fused._cache_size() == jit_sizes, "retraced"
    assert len(plan._inc_cache) == n_tables, "tables rebuilt"
    assert np.isfinite(r2.final_cost) and r2.final_cost != r1.final_cost


def test_bad_mask_length_raises():
    from opt_tpu.spec import SpecError

    N, pos, v0, v1, con = _arap_edges(4)
    plan = ot.Problem(arap_mesh_deformation).plan(dims={"N": N})
    with pytest.raises(SpecError, match="valid mask"):
        plan.solve(
            _inputs(
                pos, con,
                {"v0": v0, "v1": v1,
                 "valid": np.ones(len(v0) - 1, np.float32)},
            ),
            nIterations=1,
            lIterations=2,
        )


def test_masked_solve_under_mesh_matches_single_device():
    """valid masks compose with owner-block sharding. Tolerance note:
    masking disconnects mesh regions (gauge freedom), so psum
    reduction-order drift compounds faster across GN steps than on the
    connected graph — step 1 agrees exactly, step 3 to ~1e-3."""
    from opt_tpu.parallel.mesh import make_mesh

    N, pos, v0, v1, con = _arap_edges(16)
    rng = np.random.RandomState(0)
    keep = (rng.rand(len(v0)) > 0.3).astype(np.float32)
    g = {"v0": v0, "v1": v1, "valid": keep}
    sp = dict(nIterations=3, lIterations=15)
    # pin the solver variant on BOTH sides: since round 4 the auto policy
    # (params.resolve_auto_policy) deliberately picks chronopoulos_gear +
    # block_jacobi + owner reorder under a mesh — a different trajectory
    # from the single-device standard/jacobi defaults, which on this
    # gauge-deficient masked problem diverges ~19% in cost after three
    # nonconverged GN steps. This test isolates the mask x sharding math,
    # so both sides must run the same algorithm (test_sharding.py
    # pinned_ip convention); tests/test_auto_policy.py covers auto.
    pin = ot.InitializationParameters(
        cg_variant="standard", preconditioner="jacobi", edge_reorder=False
    )
    r1 = ot.Problem(arap_mesh_deformation).plan(
        dims={"N": N}, init_params=pin
    ).solve(_inputs(pos, con, g), **sp)
    r8 = ot.Problem(arap_mesh_deformation).plan(
        dims={"N": N}, mesh=make_mesh(), init_params=pin
    ).solve(_inputs(pos, con, g), **sp)
    np.testing.assert_allclose(r8.costs[0], r1.costs[0], rtol=1e-5)
    np.testing.assert_allclose(r8.final_cost, r1.final_cost, rtol=2e-3)
