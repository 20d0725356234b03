"""API-shim, logging, timer, and IO tests."""

import numpy as np

import opt_tpu.api as api
from opt_tpu.models.specs import laplacian


def test_opt_h_api_lifecycle():
    state = api.new_state(verbosity=0)
    problem = api.problem_define(state, laplacian, "gaussNewtonGPU")
    plan = api.problem_plan(state, problem, {"W": 8, "H": 8})
    api.set_solver_parameter(plan, "nIterations", 2)
    api.set_solver_parameter(plan, "lIterations", 20)
    rng = np.random.RandomState(0)
    inputs = {"X": rng.rand(8, 8).astype(np.float32),
              "A": rng.rand(8, 8).astype(np.float32)}
    api.problem_init(plan, inputs)
    steps = 0
    while api.problem_step(plan):
        steps += 1
        c = api.problem_current_cost(plan)
        assert np.isfinite(c)
    assert steps >= 1
    api.plan_free(plan)
    api.problem_delete(state, problem)
    assert not state.problems


def test_profile_plan(capsys):
    from opt_tpu.problem import Problem
    from opt_tpu.utils.timer import profile_plan

    rng = np.random.RandomState(0)
    inputs = {"X": rng.rand(16, 16).astype(np.float32),
              "A": rng.rand(16, 16).astype(np.float32)}
    plan = Problem(laplacian).plan(dims={"W": 16, "H": 16})
    rep = profile_plan(plan, inputs, n_nonlinear=2, l_small=5, l_big=15)
    out = capsys.readouterr().out
    assert "TIMING" in out and "Per-iter times ms" in out
    assert rep["nonlinear_ms"] > 0


def test_imagedump_roundtrip(tmp_path):
    from opt_tpu.utils.io import load_imagedump, save_imagedump

    a = np.random.RandomState(0).rand(7, 5, 2).astype(np.float32)
    p = str(tmp_path / "x.imagedump")
    save_imagedump(p, a)
    b = load_imagedump(p)
    assert np.allclose(a, b)


def test_sqrt3_subdivide_counts():
    from opt_tpu.utils.io import sqrt3_subdivide

    # closed tetrahedron: 4 verts, 4 faces -> 8 verts, 12 faces
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    faces = np.array([[0, 2, 1], [0, 1, 3], [1, 2, 3], [0, 3, 2]], np.int32)
    v2, f2 = sqrt3_subdivide(verts, faces)
    assert len(v2) == 4 + 4
    assert len(f2) == 2 * 6  # two triangles per original edge


def test_create_delete_cycle():
    """Plan create/free cycling (reference tests/create_delete_cycle:
    1000 iterations; trimmed here — the leak class it guards against is
    per-cycle host object growth, visible within a few cycles)."""
    state = api.new_state(verbosity=0)
    rng = np.random.RandomState(0)
    inputs = {"X": rng.rand(8, 8).astype(np.float32),
              "A": rng.rand(8, 8).astype(np.float32)}
    for _ in range(50):
        problem = api.problem_define(state, laplacian, "gaussNewtonGPU")
        plan = api.problem_plan(state, problem, {"W": 8, "H": 8})
        api.problem_init(plan, dict(inputs))
        api.plan_free(plan)
        api.problem_delete(state, problem)
    assert not state.problems
