"""Explicit sparse-J path (explicit.py — the reference's cusparse branch
analogue): the BCOO two-matvec JᵀJ must reproduce the default matrix-free
path's solves, on grid and graph problems, GN and LM."""

import numpy as np

import opt_tpu as ot
from opt_tpu.models.specs import curve_fitting, poisson_image_editing
from opt_tpu.solver.params import InitializationParameters


def test_explicit_jtj_matches_default_grid():
    n = 24
    rng = np.random.RandomState(0)
    mask = np.ones((n, n), np.float32)
    mask[n // 4 : -n // 4, n // 4 : -n // 4] = 0.0
    inputs = {
        "X": rng.rand(n, n, 4).astype(np.float32),
        "T": rng.rand(n, n, 4).astype(np.float32),
        "M": mask,
    }
    res_def = ot.Problem(poisson_image_editing).plan(dims={"W": n, "H": n}).solve(
        dict(inputs), nIterations=1, lIterations=80
    )
    res_exp = ot.Problem(poisson_image_editing).plan(
        dims={"W": n, "H": n},
        init_params=InitializationParameters(use_explicit_jtj=True),
    ).solve(dict(inputs), nIterations=1, lIterations=80)
    assert np.allclose(res_def.final_cost, res_exp.final_cost, rtol=1e-4), (
        res_def.final_cost,
        res_exp.final_cost,
    )
    assert np.allclose(
        np.asarray(res_def.unknowns["X"]),
        np.asarray(res_exp.unknowns["X"]),
        atol=2e-3,
    )


def test_explicit_jtj_matches_default_graph_lm():
    N = 128
    rng = np.random.RandomState(1)
    xs = rng.rand(N) * 0.1
    ys = 100.0 * np.cos(102.0 * xs) + 102.0 * np.sin(100.0 * xs)
    inputs = {
        "funcParams": np.array([[99.6, 102.4]], np.float32),
        "data": np.stack([xs, ys], -1).astype(np.float32),
        "G": {"d": np.arange(N, dtype=np.int32), "p": np.zeros(N, np.int32)},
    }
    res_def = ot.Problem(curve_fitting, kind="LMGPU").plan(
        dims={"N": N, "U": 1}
    ).solve(dict(inputs), nIterations=12, lIterations=30)
    res_exp = ot.Problem(curve_fitting, kind="LMGPU").plan(
        dims={"N": N, "U": 1},
        init_params=InitializationParameters(use_explicit_jtj=True),
    ).solve(dict(inputs), nIterations=12, lIterations=30)
    got = np.asarray(res_exp.unknowns["funcParams"])[0]
    assert abs(got[0] - 100.0) < 0.3 and abs(got[1] - 102.0) < 0.3, got
    assert np.allclose(res_def.final_cost, res_exp.final_cost, rtol=1e-3), (
        res_def.final_cost,
        res_exp.final_cost,
    )


def test_explicit_j_matches_dump_jacobian_dense():
    """The traced BCOO J must equal the numpy dumpJ export (densified)."""
    import jax

    n = 8
    rng = np.random.RandomState(2)
    inputs = {
        "X": rng.rand(n, n, 4).astype(np.float32),
        "T": rng.rand(n, n, 4).astype(np.float32),
        "M": (rng.rand(n, n) > 0.5).astype(np.float32),
    }
    plan = ot.Problem(poisson_image_editing).plan(dims={"W": n, "H": n})
    unknowns, consts, graphs, params = plan._normalize_and_place(dict(inputs))
    from opt_tpu.explicit import build_explicit_j

    J, n_rows, n_cols = jax.jit(
        lambda X: build_explicit_j(plan.compiled, X, consts, graphs, params),
        static_argnums=(),
    )(unknowns)
    dense = np.zeros((n_rows, n_cols), np.float64)
    idx = np.asarray(J.indices)
    np.add.at(dense, (idx[:, 0], idx[:, 1]), np.asarray(J.data, np.float64))
    oracle = plan.dump_jacobian(dict(inputs), dense=True)
    assert np.allclose(dense, oracle, atol=1e-5)
