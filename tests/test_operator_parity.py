"""Operator parity across ALL bundled specs against dense oracles.

For every example energy (tiny dims): diag(JᵀJ) from the matrix-free slot
probing must match the dense Jacobian's column norms, and JᵀJ·p must match
J.T @ (J @ p). This is the dumpJ-style oracle (reference o.t:2318-2344)
applied systematically — it pins the slot-form residual function (the basis
for the preconditioner and the assembled stencil operator) to the field-form
F that defines the energy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import opt_tpu as ot
from opt_tpu.functions import FunctionSet
from opt_tpu.models.specs import ALL_SPECS

from test_specs import CASES


def _dense(plan, inputs):
    c = plan.compiled
    unknowns, consts, graphs, params = c.normalize_inputs(inputs)
    fs = FunctionSet(c, consts, graphs, params)
    names = sorted(unknowns)
    shapes = [unknowns[n].shape for n in names]
    sizes = [int(np.prod(s)) for s in shapes]

    def unflatten(v):
        out, o = {}, 0
        for n, s, sz in zip(names, shapes, sizes):
            out[n] = v[o : o + sz].reshape(s)
            o += sz
        return out

    def flatten(d):
        return jnp.concatenate([jnp.ravel(d[n]) for n in names])

    def r_flat(v):
        return jnp.concatenate([t.ravel() for t in fs.F(unflatten(v))])

    x0 = flatten(unknowns)
    J = np.asarray(jax.jacfwd(r_flat)(x0))
    fs.masks(unknowns)
    _, row_masks = fs._mask_cache
    colmask = np.asarray(
        flatten(
            {
                n: (
                    jnp.ones_like(unknowns[n])
                    if row_masks[n] is None
                    else jnp.broadcast_to(row_masks[n], unknowns[n].shape).astype(
                        unknowns[n].dtype
                    )
                )
                for n in names
            }
        )
    )
    return fs, unknowns, names, unflatten, flatten, J, colmask


@pytest.mark.parametrize("name", sorted(CASES))
def test_diag_and_jtjp_match_dense(name):
    dims, inputs = CASES[name]
    plan = ot.Problem(ALL_SPECS[name]).plan(dims=dims)
    fs, unknowns, names, unflatten, flatten, J, colmask = _dense(plan, inputs)

    # masked dense JtJ: excluded unknowns act as frozen columns/rows
    Jm = J * colmask[None, :]

    diag_dense = (Jm * Jm).sum(axis=0)
    diag = np.asarray(flatten(fs.jtj_diag(unknowns)))
    np.testing.assert_allclose(diag, diag_dense, rtol=1e-3, atol=1e-4)

    rng = np.random.RandomState(7)
    p = rng.rand(colmask.size).astype(np.float32)
    _, Jop, JT, apply_jtj = fs.make_jtj_apply(unknowns)
    got = np.asarray(flatten(apply_jtj(unflatten(jnp.asarray(p * colmask)))))
    want = Jm.T @ (Jm @ p)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("name", sorted(CASES))
def test_assembled_jtj_matches_dense(name):
    """The assembled gather-form JᵀJ (assembly.py — the reference's fused
    createjtjcentered/createjtjgraph analogues) must agree with the dense
    oracle including row/column exclusion masking, and its free Jacobi
    diagonal must match."""
    from opt_tpu.assembly import plan_assembly, assemble

    dims, inputs = CASES[name]
    plan = ot.Problem(ALL_SPECS[name]).plan(dims=dims)
    c = plan.compiled
    spec_plan = plan_assembly(ALL_SPECS[name], c)
    assert spec_plan is not None, f"{name}: assembly unexpectedly unavailable"

    fs, unknowns, names, unflatten, flatten, J, colmask = _dense(plan, inputs)
    Jm = J * colmask[None, :]
    _, row_masks = fs._mask_cache
    apply_fn, diag, jtf_fn, _meta = assemble(
        c, spec_plan, unknowns, fs.consts, fs.graphs, fs.params, row_masks
    )

    diag_dense = (Jm * Jm).sum(axis=0)
    np.testing.assert_allclose(
        np.asarray(flatten(diag)), diag_dense, rtol=1e-3, atol=1e-4
    )

    # assembled JtF vs dense J^T r (rows of excluded unknowns masked)
    r_terms = fs.F(unknowns)
    r = np.concatenate([np.asarray(t).ravel() for t in r_terms])
    jtf_dense = (Jm.T @ r)
    jtf = np.asarray(flatten(jtf_fn(r_terms)))
    np.testing.assert_allclose(jtf, jtf_dense, rtol=1e-3, atol=1e-4)

    rng = np.random.RandomState(11)
    p = rng.rand(colmask.size).astype(np.float32)
    got = np.asarray(flatten(apply_fn(unflatten(jnp.asarray(p)))))
    want = Jm.T @ (Jm @ (p * colmask))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("name", sorted(CASES))
def test_dump_jacobian_matches_dense(name):
    """The sparse Jacobian export (jacobian.py — the reference's dumpJ,
    o.t:2318-2344) must reproduce the dense jacfwd Jacobian exactly, modulo
    unknown-name column ordering."""
    dims, inputs = CASES[name]
    plan = ot.Problem(ALL_SPECS[name]).plan(dims=dims)
    c = plan.compiled
    fs, unknowns, names, unflatten, flatten, J, colmask = _dense(plan, inputs)

    Jd = plan.dump_jacobian(dict(inputs), dense=True)
    assert Jd.shape == J.shape

    # _dense flattens sorted(names); dump uses compiled.unknown_names order —
    # build the column permutation between the two orderings.
    sizes_sorted = {n: int(np.prod(unknowns[n].shape)) for n in names}
    col_of_sorted = {}
    o = 0
    for n in names:
        col_of_sorted[n] = o
        o += sizes_sorted[n]
    perm = np.zeros(o, np.int64)
    od = 0
    for n in c.unknown_names:
        sz = sizes_sorted[n]
        perm[od : od + sz] = np.arange(col_of_sorted[n], col_of_sorted[n] + sz)
        od += sz
    np.testing.assert_allclose(Jd, J[:, perm], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "name",
    [
        "arap_mesh_deformation",
        "curve_fitting",  # slots into two different vertex spaces
        "cotangent_mesh_smoothing",  # 4-endpoint hyperedges
        "robust_nonrigid_alignment",
    ],
)
def test_incidence_gather_matches_scatter(name):
    """The packed combined-incidence gather form of the graph JᵀJ apply must
    equal the scatter form exactly. The gather form is what Plan binds
    (_augment_incidence); assemble() without tables is the scatter oracle."""
    from opt_tpu.assembly import plan_assembly, assemble
    from opt_tpu.functions import FunctionSet

    dims, inputs = CASES[name]
    plan = ot.Problem(ALL_SPECS[name]).plan(dims=dims)
    c = plan.compiled
    unknowns, consts, graphs, params = c.normalize_inputs(inputs)
    fs = FunctionSet(c, consts, graphs, params)
    fs.masks(unknowns)
    _, row_masks = fs._mask_cache
    spec_plan = plan_assembly(ALL_SPECS[name], c)

    rng = np.random.RandomState(3)
    p = {k: jnp.asarray(rng.rand(*v.shape), v.dtype) for k, v in unknowns.items()}

    apply_scatter, diag_s, jtf_s, _m1 = assemble(
        c, spec_plan, unknowns, consts, graphs, params, row_masks
    )
    g2 = plan._augment_incidence(graphs)
    assert any("__inc__" in k for slots in g2.values() for k in slots)
    apply_gather, diag_g, jtf_g, _m2 = assemble(
        c, spec_plan, unknowns, consts, g2, params, row_masks
    )

    a = apply_scatter(p)
    b = apply_gather(p)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(diag_s[k]), np.asarray(diag_g[k]), rtol=1e-6, atol=1e-7
        )
    r_terms = FunctionSet(c, consts, graphs, params).F(unknowns)
    ja, jb = jtf_s(r_terms), jtf_g(r_terms)
    for k in ja:
        np.testing.assert_allclose(
            np.asarray(ja[k]), np.asarray(jb[k]), rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize("name", ["poisson_image_editing", "image_warping", "arap_mesh_deformation"])
@pytest.mark.parametrize("kind", ["gaussNewtonGPU", "LMGPU"])
def test_fused_and_composed_solvers_agree(name, kind):
    """Full solves with use_fused_jtj on (assembled operator) and off
    (composed Jt(J p) via linearize/transpose) must produce near-identical
    trajectories — the reference's use_fused_jtj switch equivalence."""
    from opt_tpu.solver.params import InitializationParameters

    dims, inputs = CASES[name]
    r = {}
    for fused in (True, False):
        ip = InitializationParameters(use_fused_jtj=fused)
        plan = ot.Problem(ALL_SPECS[name], kind=kind).plan(dims=dims, init_params=ip)
        assert (plan.solver._stencil_plan is not None) == fused
        r[fused] = plan.solve(dict(inputs), nIterations=4, lIterations=12)
    np.testing.assert_allclose(r[True].costs, r[False].costs, rtol=2e-3)
    for k in r[True].unknowns:
        np.testing.assert_allclose(
            np.asarray(r[True].unknowns[k]),
            np.asarray(r[False].unknowns[k]),
            rtol=5e-3, atol=2e-4,
        )


def test_graph_problem_with_exclusion_masks():
    """Graph JᵀJ/diag/JᵀF with Exclude on the vertex space: ELL fast path and
    dense oracle must agree on row/column masking (exclude gating on the
    unknown index, reference solverGPUGaussNewton.t:371,424,450)."""
    from opt_tpu.assembly import plan_assembly, assemble
    from opt_tpu.functions import FunctionSet

    def spec(S):
        N = S.Dim("N")
        X = S.Unknown("X", 3, (N,))
        A = S.Array("A", 3, (N,))
        M = S.Array("M", 1, (N,))
        G = S.Graph("G", v0=(N,), v1=(N,))
        S.Exclude(ot.Not(ot.eq(M(0), 0)))
        S.Energy(2.0 * (X(0) - A(0)))
        S.Energy(X(G.v0) - X(G.v1))

    n = 12
    rng = np.random.RandomState(5)
    v0 = np.arange(n, dtype=np.int32)
    v1 = ((np.arange(n) + 1) % n).astype(np.int32)
    inputs = {
        "X": rng.rand(n, 3).astype(np.float32),
        "A": rng.rand(n, 3).astype(np.float32),
        "M": (rng.rand(n) > 0.6).astype(np.float32),  # some excluded vertices
        "G": {"v0": v0, "v1": v1},
    }
    plan = ot.Problem(spec).plan(dims={"N": n})
    c = plan.compiled
    fs, unknowns, names, unflatten, flatten, J, colmask = _dense(plan, inputs)
    Jm = J * colmask[None, :]
    _, row_masks = fs._mask_cache
    spec_plan = plan_assembly(spec, c)
    g2 = plan._augment_incidence(fs.graphs)
    apply_fn, diag, jtf_fn, _meta = assemble(
        c, spec_plan, unknowns, fs.consts, g2, fs.params, row_masks
    )

    np.testing.assert_allclose(
        np.asarray(flatten(diag)), (Jm * Jm).sum(0), rtol=1e-4, atol=1e-5
    )
    r_terms = fs.F(unknowns)
    r = np.concatenate([np.asarray(t).ravel() for t in r_terms])
    np.testing.assert_allclose(
        np.asarray(flatten(jtf_fn(r_terms))), Jm.T @ r, rtol=1e-4, atol=1e-5
    )
    p = rng.rand(colmask.size).astype(np.float32)
    got = np.asarray(flatten(apply_fn(unflatten(jnp.asarray(p)))))
    np.testing.assert_allclose(got, Jm.T @ (Jm @ (p * colmask)), rtol=1e-4, atol=1e-4)


def test_validate_assembly_catches_false_const_hoist():
    """validate_assembly traces the const-cache path the solver actually
    runs, and its perturbed-point comparison must reject a plan whose
    const_tsids wrongly claims an X-dependent Jacobian slot is constant
    (the probe-based detection is probabilistic; this is its safety net)."""
    import dataclasses

    name = "image_warping"  # nonlinear: Jacobian genuinely varies with X
    dims, inputs = CASES[name]
    plan = ot.Problem(ALL_SPECS[name]).plan(dims=dims)
    sol = plan.solver
    assert sol._stencil_plan is not None
    u, c, g, p = plan._normalize_and_place(dict(inputs))
    assert sol.validate_assembly(u, c, g, p)

    true_plan = sol._stencil_plan
    all_ts = {
        (t_idx, sid)
        for contribs in list(true_plan.w_spec.values())
        + list(true_plan.g_spec.values())
        for (t_idx, so, si) in contribs
        for sid in (so, si)
    }
    assert any(k not in true_plan.const_tsids for k in all_ts), (
        "test needs at least one genuinely varying slot"
    )
    sol._stencil_plan = dataclasses.replace(
        true_plan, const_tsids=frozenset(all_ts)
    )
    try:
        assert not sol.validate_assembly(u, c, g, p), (
            "stale constant-slot cache passed validation"
        )
    finally:
        sol._stencil_plan = true_plan


@pytest.mark.parametrize(
    "name",
    [
        "arap_mesh_deformation",
        "robust_nonrigid_alignment",
        "cotangent_mesh_smoothing",
        "embedded_mesh_deformation",
        "curve_fitting",
    ],
)
def test_aligned_assembly_matches_stacked(name):
    """The EXPERIMENTAL incidence-aligned graph assembly
    (aligned_graph_assembly=True: narrow probe-column gathers + post-gather
    placement matmuls) must produce the same operator as the default
    stacked-row path: identical JᵀJ·p, Jacobi diagonal and JᵀF up to
    reduction-ordering roundoff."""
    from opt_tpu.solver.params import InitializationParameters

    dims, inputs = CASES[name]
    outs = {}
    for aligned in (True, False):
        plan = ot.Problem(ALL_SPECS[name]).plan(
            dims=dims,
            init_params=InitializationParameters(
                aligned_graph_assembly=aligned
            ),
        )
        if plan.solver._stencil_plan is None:
            pytest.skip("no assembled operator for this spec")
        u, c, g, p = plan._normalize_and_place(dict(inputs))
        fs = FunctionSet(plan.compiled, c, g, p)
        sp = plan.solver._stencil_plan
        A, diag, jtf_fn, _m = fs.assemble_stencil(u, sp)
        if aligned:
            # the aligned branch must actually have engaged: bind-time
            # edge/anchor tables present for at least one graph group
            assert any(
                k.startswith("__edge__") for slots in g.values() for k in slots
            )
        r_terms = plan.compiled.residual_terms(u, c, g, p)
        rng = np.random.RandomState(11)
        probe = {
            k: jnp.asarray(rng.randn(*v.shape), v.dtype) for k, v in u.items()
        }
        outs[aligned] = (A(probe), diag, jtf_fn(r_terms))

    for idx in range(3):
        for k in outs[True][idx]:
            np.testing.assert_allclose(
                np.asarray(outs[True][idx][k]),
                np.asarray(outs[False][idx][k]),
                rtol=2e-5,
                atol=1e-6,
            )
