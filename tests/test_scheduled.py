"""Plan.solve_scheduled: the device-side fused outer schedule must match
the host-driven loop (the reference's per-outer-solve input swapping,
CombinedSolver.h:150-152 setConstraintImage)."""

import numpy as np

import opt_tpu as ot


def warp_like_spec(S):
    W, H = S.Dim("W"), S.Dim("H")
    X = S.Unknown("X", 2, (W, H))
    C = S.Array("C", 2, (W, H))
    valid = ot.greatereq(C(0, 0), -999999.9)
    S.Energy(ot.Select(valid, 2.0 * (X(0, 0) - C(0, 0)), 0.0))
    S.Energy(X(0, 0) - X(1, 0), X(0, 0) - X(0, 1))


def _data(n=16):
    rng = np.random.RandomState(2)
    x0 = rng.rand(n, n, 2).astype(np.float32)
    c0 = np.full((n, n, 2), -1e6, np.float32)
    c1 = np.full((n, n, 2), -1e6, np.float32)
    for (i, j) in [(2, 3), (n - 3, n - 2), (5, 9)]:
        c0[i, j] = x0[i, j]
        c1[i, j] = x0[i, j] + [0.8, -0.4]
    return x0, c0, c1


def test_scheduled_matches_host_driven_loop():
    import jax.numpy as jnp

    n, num_outer, nl, lin = 16, 5, 3, 15
    x0, c0, c1 = _data(n)
    prob = ot.Problem(warp_like_spec)

    # host-driven loop
    plan = prob.plan({"W": n, "H": n}, nIterations=nl, lIterations=lin)
    inputs = {"X": x0.copy(), "C": c1}
    for i in range(num_outer):
        a = np.float32((i + 1.0) / num_outer)
        inputs["C"] = (1 - a) * c0 + a * c1
        res = plan.solve(dict(inputs))
        inputs["X"] = res.unknowns["X"]
    host_cost = res.final_cost

    # fused schedule
    C0, C1 = jnp.asarray(c0), jnp.asarray(c1)

    def schedule(consts, i):
        a = (i.astype(jnp.float32) + 1.0) / num_outer
        return {**consts, "C": (1.0 - a) * C0 + a * C1}

    plan2 = prob.plan({"W": n, "H": n})
    res2 = plan2.solve_scheduled(
        {"X": x0.copy(), "C": c1}, schedule, num_outer,
        nIterations=nl, lIterations=lin,
    )
    assert len(res2.costs) == num_outer
    assert np.isclose(res2.final_cost, host_cost, rtol=1e-5), (
        res2.final_cost, host_cost,
    )
    assert np.allclose(
        np.asarray(res2.unknowns["X"]), np.asarray(res.unknowns["X"]),
        atol=1e-5,
    )
    assert res2.num_linear_iterations > 0
