"""PyramidPlan: device-side coarse-to-fine schedule in one jitted program
must match the host-driven per-level sequence exactly (reference schedule:
optical_flow/src/CombinedSolver.h:22-61)."""

import numpy as np

import opt_tpu as ot


def lap_spec(S):
    W, H = S.Dim("W"), S.Dim("H")
    X = S.Unknown("X", 1, (W, H))
    A = S.Array("A", 1, (W, H))
    S.Energy(0.4 * (X(0, 0) - A(0, 0)), X(0, 0) - X(1, 0), X(0, 0) - X(0, 1))


def _levels(n):
    rng = np.random.RandomState(3)
    fine = rng.rand(n, n).astype(np.float32)
    coarse = fine[::2, ::2]
    return coarse, fine


def prolong(unknowns, lvl, next_dims):
    return {
        "X": ot.upsample2x_nearest(
            unknowns["X"], (next_dims["W"], next_dims["H"]), scale=1.0
        )
    }


def test_pyramid_matches_host_driven_sequence():
    n = 16
    coarse, fine = _levels(n)
    dims = [{"W": n // 2, "H": n // 2}, {"W": n, "H": n}]
    sp = dict(nIterations=3, lIterations=15)

    # host-driven: solve coarse, upsample on host, solve fine
    prob = ot.Problem(lap_spec)
    r0 = prob.plan(dims=dims[0]).solve(
        {"X": np.zeros_like(coarse), "A": coarse}, **sp
    )
    x_up = np.repeat(np.repeat(np.asarray(r0.unknowns["X"]), 2, 0), 2, 1)[
        :n, :n
    ]
    r1 = prob.plan(dims=dims[1]).solve({"X": x_up, "A": fine}, **sp)

    # fused: both levels inside one jitted program
    pplan = ot.PyramidPlan(ot.Problem(lap_spec), dims, prolong, **sp)
    res = pplan.solve(
        [
            {"X": np.zeros_like(coarse), "A": coarse},
            {"X": np.zeros_like(fine), "A": fine},
        ]
    )
    assert np.allclose(res.costs[0], r0.final_cost, rtol=1e-6)
    assert np.allclose(res.final_cost, r1.final_cost, rtol=1e-6)
    assert np.allclose(
        np.asarray(res.unknowns["X"]), np.asarray(r1.unknowns["X"]), atol=1e-6
    )
    assert res.num_linear_iterations > 0


def test_pyramid_restores_inf_sentinels():
    """±inf invalid markers in the finest level's unknown inputs come back
    verbatim — same contract as Plan.solve / solve_scheduled."""
    n = 16
    coarse, fine = _levels(n)
    dims = [{"W": n // 2, "H": n // 2}, {"W": n, "H": n}]
    fine_x0 = np.zeros_like(fine)
    fine_x0[0, 0] = -np.inf
    pplan = ot.PyramidPlan(
        ot.Problem(lap_spec), dims, prolong, nIterations=2, lIterations=8
    )
    res = pplan.solve(
        [
            {"X": np.zeros_like(coarse), "A": coarse},
            {"X": fine_x0, "A": fine},
        ]
    )
    out = np.asarray(res.unknowns["X"])
    assert np.isneginf(out[0, 0])
    mask = np.ones_like(out, bool)
    mask[0, 0] = False
    assert np.isfinite(out[mask]).all()
    assert np.isfinite(res.final_cost)
