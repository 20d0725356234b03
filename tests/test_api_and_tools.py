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
    assert "TIMING" in out and "Marginal times ms" in out
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


def test_report_solve_timing_lines(capsys):
    """collect_per_kernel_timing emits the reference's greppable surface
    (util.t:469-508): the kernel table, the TIMING line and the
    'Per-iter times ms' aggregate pair."""
    import opt_tpu as ot
    from opt_tpu.problem import Problem

    rng = np.random.RandomState(0)
    inputs = {"X": rng.rand(12, 12).astype(np.float32),
              "A": rng.rand(12, 12).astype(np.float32)}
    plan = Problem(laplacian).plan(
        dims={"W": 12, "H": 12},
        init_params=ot.InitializationParameters(
            collect_per_kernel_timing=True
        ),
    )
    plan.solve(inputs, nIterations=2, lIterations=5)
    out = capsys.readouterr().out
    assert "TIMING " in out
    assert "Per-iter times ms (nonlinear,linear):" in out
    assert "PCGInit1" in out and "PCGStep1" in out


def test_sentinel_memo_not_fooled_by_id_reuse():
    """free() drops the sentinel memo, and memo hits require the SAME live
    object — a fresh finite array occupying a freed array's id must not
    inherit its inf-mask (id-reuse bug class; cf. solve_scheduled cache)."""
    from opt_tpu.problem import Problem

    rng = np.random.RandomState(0)
    a_inf = rng.rand(8, 8).astype(np.float32)
    a_inf[0, 0] = -np.inf
    inputs = {"X": a_inf, "A": rng.rand(8, 8).astype(np.float32)}
    plan = Problem(laplacian).plan(dims={"W": 8, "H": 8})
    res = plan.solve(dict(inputs), nIterations=2, lIterations=5)
    assert np.isneginf(np.asarray(res.unknowns["X"])[0, 0])
    plan.free()
    assert plan.__dict__.get("_sentinel_memo") is None
    # a finite unknown after free() must come back finite everywhere
    fin = {"X": rng.rand(8, 8).astype(np.float32),
           "A": inputs["A"]}
    res2 = plan.solve(fin, nIterations=2, lIterations=5)
    assert np.isfinite(np.asarray(res2.unknowns["X"])).all()


def test_compile_cache_bounded():
    """Throwaway spec lambdas do not accumulate past the LRU cap."""
    import opt_tpu.compile as oc

    # build a handful of distinct spec closures; cache length must stay
    # bounded by the cap regardless
    def make(i):
        def spec(S):
            laplacian(S)
        spec.__name__ = f"spec_{i}"
        return spec

    for i in range(5):
        oc.compile_spec(make(i), {"W": 4, "H": 4}, np.float32)
    assert oc._COMPILE_CACHE is not None
    assert len(oc._COMPILE_CACHE) <= oc._COMPILE_CACHE_MAX


def test_dump_hlo_and_verbosity3(tmp_path, monkeypatch):
    """Plan.dump_hlo returns the compiled solve program; verbosity>=3
    writes it once per plan (the reference's PTX/schedule dump analogue)."""
    import os

    from opt_tpu.problem import Problem
    from opt_tpu.utils.logging import set_verbosity

    rng = np.random.RandomState(0)
    inputs = {"X": rng.rand(8, 8).astype(np.float32),
              "A": rng.rand(8, 8).astype(np.float32)}
    plan = Problem(laplacian).plan(dims={"W": 8, "H": 8})
    txt = plan.dump_hlo(inputs, nIterations=1, lIterations=3)
    assert "HloModule" in txt and "while" in txt

    monkeypatch.chdir(tmp_path)
    set_verbosity(3)
    try:
        plan.solve(dict(inputs), nIterations=1, lIterations=3)
    finally:
        set_verbosity(0)
    import glob

    assert glob.glob(str(tmp_path / "opt_tpu_solve_hlo_*.txt"))
