"""Batched solves: one XLA program over many problem instances.

New capability over the reference (which runs instances serially): results
must match per-instance solves exactly, including per-instance early exits.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import opt_tpu as ot
from opt_tpu.models.specs import curve_fitting, poisson_image_editing


def test_batched_curve_fitting_matches_single():
    N, B = 64, 5
    rng = np.random.RandomState(0)
    x = np.linspace(0, 1, N)
    truths = rng.uniform(80, 120, (B, 2))
    data = np.stack(
        [
            np.stack(
                [x, a * np.cos(b * x) + b * np.sin(a * x)], -1
            )
            for a, b in truths
        ]
    ).astype(np.float32)
    init = truths + rng.randn(B, 2) * 0.05
    graphs = {"d": np.arange(N, dtype=np.int32), "p": np.zeros(N, np.int32)}
    plan = ot.Problem(curve_fitting, kind="LMGPU").plan(dims={"N": N, "U": 1})

    res = plan.solve_batched(
        {
            "funcParams": init[:, None, :].astype(np.float32),
            "data": data,
            "G": graphs,
        },
        nIterations=12,
        lIterations=20,
    )
    fitted = np.asarray(res.unknowns["funcParams"])[:, 0, :]
    assert fitted.shape == (B, 2)
    np.testing.assert_allclose(fitted, truths, rtol=1e-3, atol=1e-2)

    # exact agreement with per-instance solves
    for i in range(B):
        single = plan.solve(
            {
                "funcParams": init[i : i + 1].astype(np.float32),
                "data": data[i],
                "G": graphs,
            },
            nIterations=12,
            lIterations=20,
        )
        np.testing.assert_allclose(
            fitted[i], np.asarray(single.unknowns["funcParams"])[0],
            rtol=1e-5, atol=1e-5,
        )
        assert res.num_iterations[i] == single.num_iterations


def test_batched_poisson_broadcast_consts():
    n, B = 16, 3
    rng = np.random.RandomState(1)
    mask = np.zeros((n, n), np.float32)  # no exclusions
    T = rng.rand(n, n, 4).astype(np.float32)  # shared target (broadcast)
    X0 = rng.rand(B, n, n, 4).astype(np.float32)
    plan = ot.Problem(poisson_image_editing).plan(dims={"W": n, "H": n})
    res = plan.solve_batched(
        {"X": X0, "T": T, "M": mask}, nIterations=1, lIterations=200
    )
    assert res.final_costs.shape == (B,)
    for i in range(B):
        single = plan.solve(
            {"X": X0[i], "T": T, "M": mask}, nIterations=1, lIterations=200
        )
        np.testing.assert_allclose(
            res.final_costs[i], single.final_cost, rtol=1e-4, atol=1e-8
        )


def test_batched_requires_a_batched_input():
    n = 8
    plan = ot.Problem(poisson_image_editing).plan(dims={"W": n, "H": n})
    with pytest.raises(Exception):
        plan.solve_batched(
            {
                "X": np.zeros((n, n, 4), np.float32),
                "T": np.zeros((n, n, 4), np.float32),
                "M": np.zeros((n, n), np.float32),
            }
        )


def test_batched_solve_with_computed_array_matches_single():
    """ComputedArray precompute (value + gradient slots, recomputed per
    nonlinear iteration) under the vmapped batched solve: per-instance
    results must match the single-instance solve."""
    import opt_tpu as ot

    def spec(S):
        W, H = S.Dim("W"), S.Dim("H")
        X = S.Unknown("X", 1, (W, H))
        A = S.Array("A", 1, (W, H))
        C = S.ComputedArray("C", (W, H), lambda: X(0, 0) * X(0, 0) - A(0, 0))
        S.Energy(C(0, 0) - C(1, 0), 0.5 * (X(0, 0) - 1.0))

    B, n = 3, 12
    rng = np.random.RandomState(0)
    a = rng.rand(B, n, n).astype(np.float32)
    x0 = np.ones((B, n, n), np.float32) + 0.1 * rng.randn(B, n, n).astype(
        np.float32
    )
    plan = ot.Problem(spec).plan({"W": n, "H": n})
    res = plan.solve_batched(
        {"X": x0, "A": a}, nIterations=5, lIterations=15
    )
    for i in range(B):
        r = ot.Problem(spec).plan({"W": n, "H": n}).solve(
            {"X": x0[i], "A": a[i]}, nIterations=5, lIterations=15
        )
        assert np.isclose(r.final_cost, res.final_costs[i], rtol=1e-5), (
            i, r.final_cost, res.final_costs[i],
        )
