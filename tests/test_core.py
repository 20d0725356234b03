"""Core correctness tests against dense oracles.

Test strategy per SURVEY.md §4: tiny analytic problems with known optima,
final-cost agreement with an independent dense solver, and Jacobian
extraction versus jax.jacobian on small instances (the reference's dumpJ
machinery, o.t:2318-2344, played by jacfwd here).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import opt_tpu as ot
from opt_tpu.functions import FunctionSet


# ---------------------------------------------------------------------------
# specs
# ---------------------------------------------------------------------------


def laplacian_spec(S):
    # tests/minimal/laplacian.t
    W, H = S.Dim("W"), S.Dim("H")
    X = S.Unknown("X", 1, (W, H))
    A = S.Array("A", 1, (W, H))
    w_fit = 0.2
    S.Energy(
        w_fit * (X(0, 0) - A(0, 0)),
        X(0, 0) - X(1, 0),
        X(0, 0) - X(0, 1),
    )


def poisson_spec(S):
    # examples/poisson_image_editing/poisson_image_editing.t (2 channels here)
    W, H = S.Dim("W"), S.Dim("H")
    X = S.Unknown("X", 2, (W, H))
    T = S.Array("T", 2, (W, H))
    M = S.Array("M", 1, (W, H))
    S.UsePreconditioner(False)
    S.Exclude(ot.Not(ot.eq(M(0, 0), 0)))
    for dx, dy in ot.Stencil([(1, 0), (-1, 0), (0, 1), (0, -1)]):
        e = (X(0, 0) - X(dx, dy)) - (T(0, 0) - T(dx, dy))
        S.Energy(ot.Select(ot.InBounds(dx, dy), e, 0.0))


# ---------------------------------------------------------------------------
# dense oracle helpers
# ---------------------------------------------------------------------------


def dense_system(plan, inputs):
    """Flattened residual vector function + dense J at X0, honoring the same
    bbox masking as the solver. Exclusion applied as row/column projection."""
    c = plan.compiled
    unknowns, consts, graphs, params = c.normalize_inputs(inputs)
    fs = FunctionSet(c, consts, graphs, params)
    names = sorted(unknowns)
    shapes = [unknowns[n].shape for n in names]
    sizes = [int(np.prod(s)) for s in shapes]

    def unflatten(v):
        out = {}
        o = 0
        for n, s, sz in zip(names, shapes, sizes):
            out[n] = v[o : o + sz].reshape(s)
            o += sz
        return out

    def flatten(d):
        return jnp.concatenate([d[n].ravel() for n in names])

    def r_flat(v):
        terms = fs.F(unflatten(v))
        return jnp.concatenate([t.ravel() for t in terms])

    x0 = flatten(unknowns)
    J = jax.jacfwd(r_flat)(x0)
    excl, row_masks = fs.masks(unknowns)
    colmask = flatten(
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
    return fs, names, unflatten, flatten, x0, np.asarray(J), np.asarray(colmask)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_shift_semantics():
    from opt_tpu.ops.shift import shift, shift_adjoint

    x = jnp.arange(12, dtype=jnp.float32).reshape(3, 4, 1)
    s = shift(x, (1, 0))
    assert np.allclose(np.asarray(s)[:2], np.asarray(x)[1:])
    assert np.all(np.asarray(s)[2] == 0)
    # adjoint identity: <shift(x), y> == <x, shift_adjoint(y)>
    y = jnp.arange(12, dtype=jnp.float32).reshape(3, 4, 1) * 0.5 + 1
    lhs = float(jnp.sum(shift(x, (1, -2)) * y))
    rhs = float(jnp.sum(x * shift_adjoint(y, (1, -2))))
    assert abs(lhs - rhs) < 1e-5


def test_laplacian_residuals_match_numpy():
    n = 6
    rng = np.random.RandomState(0)
    a = rng.rand(n, n).astype(np.float32)
    x = rng.rand(n, n).astype(np.float32)
    plan = ot.Problem(laplacian_spec).plan(dims={"W": n, "H": n})
    c = plan.compiled
    unknowns, consts, graphs, params = c.normalize_inputs({"X": x, "A": a})
    terms = c.residual_terms(unknowns, consts, graphs, params)
    # term 0: fit everywhere; term 1: X - X(+1,0), zeroed on last row (bbox)
    t0 = np.asarray(terms[0])[..., 0]
    t1 = np.asarray(terms[1])[..., 0]
    t2 = np.asarray(terms[2])[..., 0]
    assert np.allclose(t0, 0.2 * (x - a), atol=1e-6)
    expect1 = x - np.roll(x, -1, axis=0)
    expect1[-1, :] = 0.0  # auto bbox mask (o.t:1930-1933)
    assert np.allclose(t1, expect1, atol=1e-6)
    expect2 = x - np.roll(x, -1, axis=1)
    expect2[:, -1] = 0.0
    assert np.allclose(t2, expect2, atol=1e-6)


def test_jtf_and_diag_match_dense():
    n = 5
    rng = np.random.RandomState(1)
    inputs = {
        "X": rng.rand(n, n).astype(np.float32),
        "A": rng.rand(n, n).astype(np.float32),
    }
    plan = ot.Problem(laplacian_spec).plan(dims={"W": n, "H": n})
    fs, names, unflatten, flatten, x0, J, colmask = dense_system(plan, inputs)
    r = J @ np.asarray(x0) * 0  # placeholder; recompute properly below
    c = plan.compiled
    unknowns, consts, graphs, params = c.normalize_inputs(inputs)
    terms = c.residual_terms(unknowns, consts, graphs, params)
    r = np.concatenate([np.asarray(t).ravel() for t in terms])
    jtf_dense = J.T @ r
    jtf = fs.jtf(unknowns)
    assert np.allclose(np.asarray(jtf["X"]).ravel(), jtf_dense, atol=1e-4)
    diag_dense = (J * J).sum(axis=0)
    diag = fs.jtj_diag(unknowns)
    assert np.allclose(np.asarray(diag["X"]).ravel(), diag_dense, atol=1e-4)
    # JtJp against dense on a random direction
    p = rng.rand(*unknowns["X"].shape).astype(np.float32)
    _, Jop, JT, apply_jtj = fs.make_jtj_apply(unknowns)
    got = np.asarray(apply_jtj({"X": jnp.asarray(p)})["X"]).ravel()
    want = J.T @ (J @ p.ravel())
    assert np.allclose(got, want, atol=1e-3)


def test_gauss_newton_reaches_normal_equation_optimum():
    n = 8
    rng = np.random.RandomState(2)
    inputs = {
        "X": rng.rand(n, n).astype(np.float32),
        "A": rng.rand(n, n).astype(np.float32),
    }
    plan = ot.Problem(laplacian_spec).plan(dims={"W": n, "H": n})
    _, _, _, _, x0, J, _ = dense_system(plan, inputs)
    # linear LSQ: residual r(x) = J x + r0 with r0 = r(0)
    c = plan.compiled
    unknowns, consts, graphs, params = c.normalize_inputs(inputs)
    zero = {k: jnp.zeros_like(v) for k, v in unknowns.items()}
    fs = FunctionSet(c, consts, graphs, params)
    r0_terms = fs.F(zero)
    r0 = np.concatenate([np.asarray(t).ravel() for t in r0_terms])
    x_star, *_ = np.linalg.lstsq(J, -r0, rcond=None)
    res = plan.solve(inputs, nIterations=2, lIterations=200)
    got = np.asarray(res.unknowns["X"]).ravel()
    assert np.allclose(got, x_star, atol=1e-3)
    cost_star = 0.5 * float(np.sum((J @ x_star + r0) ** 2))
    assert res.final_cost <= cost_star * 1.001 + 1e-6


def test_poisson_exclusion_semantics():
    n = 8
    rng = np.random.RandomState(3)
    x = rng.rand(n, n, 2).astype(np.float32)
    t = rng.rand(n, n, 2).astype(np.float32)
    m = np.zeros((n, n), np.float32)
    m[:2, :] = 1.0  # excluded band (frozen pixels)
    inputs = {"X": x, "T": t, "M": m}
    plan = ot.Problem(poisson_spec).plan(dims={"W": n, "H": n})
    fs, names, unflatten, flatten, x0, J, colmask = dense_system(plan, inputs)
    c = plan.compiled
    unknowns, consts, graphs, params = c.normalize_inputs(inputs)
    # project columns of excluded unknowns (frozen), solve for the rest
    Jm = J * colmask[None, :]
    r0_terms = fs.F({k: jnp.zeros_like(v) for k, v in unknowns.items()})
    r0 = np.concatenate([np.asarray(tt).ravel() for tt in r0_terms])
    # residual at x: J x + r0 ; frozen coords stay at initial values
    xf = np.asarray(x0)
    r_at_frozen = J @ (xf * (1 - colmask)) + r0
    d_star, *_ = np.linalg.lstsq(Jm, -r_at_frozen, rcond=None)
    d_star = d_star * colmask
    x_star = xf * (1 - colmask) + d_star
    res = plan.solve(inputs, nIterations=2, lIterations=400)
    got = np.asarray(res.unknowns["X"]).ravel()
    # frozen pixels unchanged
    assert np.allclose(got * (1 - colmask), xf * (1 - colmask), atol=1e-6)
    assert np.allclose(got, x_star, atol=5e-3)


def test_graph_curve_fitting():
    # tests/minimal_graph_only: y = a cos(bx) + b sin(ax), truth (a,b)=(100,102)
    def curve_spec(S):
        N, U = S.Dim("N"), S.Dim("U")
        funcParams = S.Unknown("funcParams", 2, (U,))
        data = S.Image("data", 2, (N,))
        G = S.Graph("G", d=(N,), p=(U,))
        S.UsePreconditioner(True)
        x = data(G.d)[..., 0]
        y = data(G.d)[..., 1]
        a = funcParams(G.p)[..., 0]
        b = funcParams(G.p)[..., 1]
        S.Energy(y - (a * jnp.cos(b * x) + b * jnp.sin(a * x)))

    a_t, b_t = 100.0, 102.0
    N = 200
    rng = np.random.RandomState(4)
    xs = rng.rand(N).astype(np.float64) * 0.1
    ys = a_t * np.cos(b_t * xs) + b_t * np.sin(a_t * xs)
    data = np.stack([xs, ys], axis=-1).astype(np.float32)
    inputs = {
        "funcParams": np.array([[99.6, 102.4]], np.float32),
        "data": data,
        "G": {"d": np.arange(N, dtype=np.int32), "p": np.zeros(N, np.int32)},
    }
    plan = ot.Problem(curve_spec).plan(dims={"N": N, "U": 1}, kind="gaussNewtonGPU")
    res = plan.solve(inputs, nIterations=20, lIterations=50)
    got = np.asarray(res.unknowns["funcParams"])[0]
    assert abs(got[0] - a_t) < 0.2 and abs(got[1] - b_t) < 0.2, got
    assert res.final_cost < 1e-2


def test_lm_decreases_cost_nonlinear():
    def warp_spec(S):
        W, H = S.Dim("W"), S.Dim("H")
        O = S.Unknown("Offset", 2, (W, H))
        Ang = S.Unknown("Angle", 1, (W, H))
        Ur = S.Array("UrShape", 2, (W, H))
        Con = S.Array("Constraints", 2, (W, H))
        wf = S.Param("w_fitSqrt")
        wr = S.Param("w_regSqrt")
        for dx, dy in ot.Stencil([(1, 0), (-1, 0), (0, 1), (0, -1)]):
            e_reg = wr * (
                (O(0, 0) - O(dx, dy))
                - ot.Rotate2D(Ang(0, 0), Ur(0, 0) - Ur(dx, dy))
            )
            S.Energy(ot.Select(ot.InBounds(dx, dy), e_reg, 0.0))
        valid = ot.All(ot.greatereq(Con(0, 0), 0))
        S.Energy(wf * ot.Select(valid, O(0, 0) - Con(0, 0), 0.0))

    n = 12
    rng = np.random.RandomState(5)
    ur = np.stack(np.meshgrid(np.arange(n), np.arange(n), indexing="ij"), -1).astype(
        np.float32
    )
    con = -np.ones((n, n, 2), np.float32)
    con[0, 0] = [1.0, 1.0]
    con[-1, -1] = [n - 2.0, n - 2.0]
    inputs = {
        "Offset": ur.copy(),
        "Angle": np.zeros((n, n), np.float32),
        "UrShape": ur,
        "Constraints": con,
        "w_fitSqrt": np.sqrt(10.0),
        "w_regSqrt": np.sqrt(1.0),
    }
    plan_lm = ot.Problem(warp_spec).plan(dims={"W": n, "H": n}, kind="LMGPU")
    res_lm = plan_lm.solve(inputs, nIterations=15, lIterations=30)
    plan_gn = ot.Problem(warp_spec).plan(dims={"W": n, "H": n}, kind="gaussNewtonGPU")
    res_gn = plan_gn.solve(inputs, nIterations=15, lIterations=30)
    c0_terms = FunctionSet(
        plan_gn.compiled, *plan_gn.compiled.normalize_inputs(inputs)[1:]
    )
    # both solvers must reduce cost strongly and agree on the final energy
    # (the cross-solver final-cost oracle of SURVEY.md §4)
    assert res_lm.costs[0] > res_lm.final_cost
    assert res_lm.final_cost < 2.0, res_lm.costs
    assert res_gn.final_cost < 2.0, res_gn.costs
    assert abs(res_lm.final_cost - res_gn.final_cost) < 1e-3 * res_gn.final_cost


@pytest.mark.parametrize("fused", [True, False])
def test_lm_with_exclude_solves(fused):
    """Regression (ADVICE r1): multiplicative row-masking of the LM damping
    diagonal produced inf*0=NaN at excluded rows (diag(JᵀJ)=0 ⇒ SSq=0 ⇒
    invS=inf ⇒ ctc=inf), so A(p) went NaN and every trust-region step was
    rejected. LM on an Exclude problem must decrease cost and agree with GN."""
    from opt_tpu.solver.params import InitializationParameters

    n = 10
    rng = np.random.RandomState(7)
    t = rng.rand(n, n, 2).astype(np.float32)
    m = np.zeros((n, n, 1), np.float32)
    m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = 1.0  # border fixed (excluded)
    x0 = t + 0.3 * rng.rand(n, n, 2).astype(np.float32) * (1.0 - m)
    inputs = {"X": x0, "T": t, "M": m}
    ip = InitializationParameters(use_fused_jtj=fused)
    dims = {"W": n, "H": n}
    res_lm = ot.Problem(poisson_spec).plan(dims, kind="LMGPU", init_params=ip).solve(
        inputs, nIterations=12, lIterations=40
    )
    res_gn = ot.Problem(poisson_spec).plan(dims, init_params=ip).solve(
        inputs, nIterations=12, lIterations=40
    )
    assert np.isfinite(res_lm.final_cost)
    assert res_lm.final_cost < 0.5 * res_lm.costs[0] or res_lm.final_cost < 1e-6
    assert abs(res_lm.final_cost - res_gn.final_cost) <= max(
        1e-3 * res_gn.final_cost, 1e-6
    ), (res_lm.final_cost, res_gn.final_cost)


def _gated_spec(S):
    # ADVICE r1 repro: the fit coupling is gated on greater(D, 2.0); real
    # data has D=3.0 (gate open) but the round-1 probe distribution
    # ({0,1,-1} ∪ U(0.3,1.7)) never exceeded 2.0, so the coupling was
    # silently pruned from the assembled JᵀJ and the fused path NaN'd.
    W, H = S.Dim("W"), S.Dim("H")
    X = S.Unknown("X", 1, (W, H))
    D = S.Array("D", 1, (W, H))
    A = S.Array("A", 1, (W, H))
    S.Energy(ot.Select(ot.greater(D(0, 0), 2.0), X(0, 0) - A(0, 0), 0.0))
    S.Energy(0.1 * (X(0, 0) - X(1, 0)))


def _gated_inputs(n):
    rng = np.random.RandomState(11)
    return {
        "X": rng.rand(n, n).astype(np.float32),
        "A": rng.rand(n, n).astype(np.float32),
        "D": np.full((n, n), 3.0, np.float32),
    }


def test_fused_jtj_data_gated_coupling():
    """Threshold-aware probes: comparison constants traced from the spec
    must flip the gate across the probe grid, so the fused path keeps the
    coupling and matches the composed path exactly."""
    from opt_tpu.solver.params import InitializationParameters

    n = 10
    inputs = _gated_inputs(n)
    dims = {"W": n, "H": n}
    plan_f = ot.Problem(_gated_spec).plan(dims)
    assert plan_f.solver._stencil_plan is not None
    res_f = plan_f.solve(inputs, nIterations=6, lIterations=30)
    # threshold probing should have kept the coupling: no fallback happened
    assert plan_f.solver._stencil_plan is not None
    plan_c = ot.Problem(_gated_spec).plan(
        dims, init_params=InitializationParameters(use_fused_jtj=False)
    )
    res_c = plan_c.solve(inputs, nIterations=6, lIterations=30)
    assert np.isfinite(res_f.final_cost)
    assert abs(res_f.final_cost - res_c.final_cost) <= max(
        1e-4 * res_c.final_cost, 1e-7
    ), (res_f.final_cost, res_c.final_cost)


def test_fused_jtj_validation_fallback(monkeypatch):
    """Safety net: if the probes DO miss a gated coupling (threshold
    collection disabled here), the first-solve random-vector validation must
    detect the mismatch and fall back to the composed operator."""
    import opt_tpu.assembly as assembly

    monkeypatch.setattr(assembly, "_comparison_constants", lambda *a, **k: [])

    # fresh function object: compile_spec/plan_assembly memoize per spec
    # function, and _gated_spec's correct (threshold-aware) plan is already
    # cached from the tests above — the monkeypatch must see a cold cache
    def gated_spec_cold(S):
        _gated_spec(S)

    n = 10
    inputs = _gated_inputs(n)
    plan = ot.Problem(gated_spec_cold).plan({"W": n, "H": n})
    assert plan.solver._stencil_plan is not None
    res = plan.solve(inputs, nIterations=6, lIterations=30)
    assert plan.solver._stencil_plan is None  # fell back
    assert np.isfinite(res.final_cost)
    res_c = ot.Problem(gated_spec_cold).plan({"W": n, "H": n}).solve(
        inputs, nIterations=6, lIterations=30
    )
    assert abs(res.final_cost - res_c.final_cost) <= max(
        1e-4 * res_c.final_cost, 1e-7
    )


def test_stepwise_api_matches_fused():
    n = 8
    rng = np.random.RandomState(6)
    inputs = {
        "X": rng.rand(n, n).astype(np.float32),
        "A": rng.rand(n, n).astype(np.float32),
    }
    plan = ot.Problem(laplacian_spec).plan(dims={"W": n, "H": n})
    res_fused = plan.solve(inputs, nIterations=3, lIterations=20)
    plan2 = ot.Problem(laplacian_spec).plan(dims={"W": n, "H": n})
    res_step = plan2.solve(inputs, nIterations=3, lIterations=20, stepwise=True)
    assert np.allclose(res_fused.final_cost, res_step.final_cost, rtol=1e-5)
    assert np.allclose(
        np.asarray(res_fused.unknowns["X"]),
        np.asarray(res_step.unknowns["X"]),
        atol=1e-5,
    )


def test_plan_lifecycle_cycle():
    # tests/create_delete_cycle analogue: 1000 plan-create/free cycles then
    # one real solve, matching the reference's loop exactly (it calls only
    # ProblemPlan+PlanFree inside the cycle — main.cpp:22-27 — and solves
    # once afterwards, main.cpp:27-31).
    prob = ot.Problem(laplacian_spec)
    for _ in range(1000):
        plan = prob.plan(dims={"W": 4, "H": 4})
        plan.free()
    plan = prob.plan(dims={"W": 4, "H": 4})
    res = plan.solve(
        {"X": np.zeros((4, 4), np.float32), "A": np.ones((4, 4), np.float32)},
        nIterations=3,
        lIterations=10,
    )
    assert np.isfinite(res.final_cost)
