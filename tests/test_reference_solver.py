"""Cross-solver final-cost agreement against the independent scipy solver
(the reference's Ceres-comparison oracle, SURVEY §4.3): Opt(GN)/Opt(LM)
must reach final energies matching scipy.optimize.least_squares on the
same energy definition."""

import numpy as np

import opt_tpu as ot
from opt_tpu.models.specs import curve_fitting
from opt_tpu.reference_solver import solve_scipy


def _curve_inputs(N=64):
    rng = np.random.RandomState(3)
    xs = rng.rand(N) * 0.1
    ys = (
        100.0 * np.cos(102.0 * xs)
        + 102.0 * np.sin(100.0 * xs)
        + rng.randn(N) * 0.1
    )
    return {
        "funcParams": np.array([[99.6, 102.4]], np.float32),
        "data": np.stack([xs, ys], -1).astype(np.float32),
        "G": {"d": np.arange(N, dtype=np.int32), "p": np.zeros(N, np.int32)},
    }


def test_curve_fitting_agrees_with_scipy():
    N = 64
    inputs = _curve_inputs(N)
    dims = {"N": N, "U": 1}
    scipy_cost, scipy_x = solve_scipy(curve_fitting, dims, dict(inputs))

    for kind in ("gaussNewtonGPU", "LMGPU"):
        res = ot.Problem(curve_fitting, kind=kind).plan(dims=dims).solve(
            dict(inputs), nIterations=20, lIterations=40
        )
        # same optimality basin: final energies agree within the optimality
        # gap (the reference compares Opt vs Ceres the same way)
        assert np.isclose(res.final_cost, scipy_cost, rtol=1e-3), (
            kind,
            res.final_cost,
            scipy_cost,
        )


def test_arap_agrees_with_scipy():
    from opt_tpu.models.specs import arap_mesh_deformation

    n_side = 5
    N = n_side * n_side
    ii, jj = np.meshgrid(np.arange(n_side), np.arange(n_side), indexing="ij")
    pos = np.stack([ii.ravel(), jj.ravel(), np.zeros(N)], -1).astype(np.float32)
    vid = np.arange(N).reshape(n_side, n_side)
    v0 = np.concatenate([vid[:-1].ravel(), vid[:, :-1].ravel()])
    v1 = np.concatenate([vid[1:].ravel(), vid[:, 1:].ravel()])
    con = -1e6 * np.ones((N, 3), np.float32)
    con[vid[0, 0]] = pos[vid[0, 0]]
    con[vid[-1, -1]] = pos[vid[-1, -1]] + np.array([1.0, 0, 0.5], np.float32)
    inputs = {
        "Offset": pos.copy(),
        "Angle": np.zeros((N, 3), np.float32),
        "UrShape": pos,
        "Constraints": con,
        "G": {
            "v0": np.concatenate([v0, v1]).astype(np.int32),
            "v1": np.concatenate([v1, v0]).astype(np.int32),
        },
        "w_fitSqrt": np.float32(1.0),
        "w_regSqrt": np.float32(0.7),
    }
    dims = {"N": N}
    scipy_cost, _ = solve_scipy(
        arap_mesh_deformation, dims, dict(inputs), max_nfev=400
    )
    res = ot.Problem(arap_mesh_deformation, kind="LMGPU").plan(dims=dims).solve(
        dict(inputs), nIterations=30, lIterations=60
    )
    assert np.isclose(res.final_cost, scipy_cost, rtol=5e-3), (
        res.final_cost,
        scipy_cost,
    )


def test_harness_scipy_slot():
    """The CombinedSolver harness runs the scipy reference in the Ceres
    comparison slot and reports it in the Final Costs block."""
    from opt_tpu.harness import CombinedSolverBase

    N = 48
    inputs = _curve_inputs(N)

    class CurveSolver(CombinedSolverBase):
        def combined_solve_init(self):
            self.problem_inputs = dict(inputs)

    s = CurveSolver(
        curve_fitting,
        {"N": N, "U": 1},
        {"numIter": 1, "nonLinearIter": 15, "linearIter": 40},
    )
    s.add_opt_solvers(["gaussNewtonGPU"])
    s.add_scipy_reference_solver()
    s.solve_all()
    text = s.report_final_costs()
    assert "CERES-analogue(scipy)" in text
    costs = [r.final_cost for r in s.runs]
    assert np.isclose(costs[0], costs[1], rtol=1e-3), costs
