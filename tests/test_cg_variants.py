"""Chronopoulos–Gear single-reduction CG (cg_variant, GN path).

Same iterates as standard PCG in exact arithmetic, but γ=rᵀu and δ=uᵀAu
are independent reductions computed on the same vectors, so under a mesh
they lower to ONE all-reduce per CG iteration instead of two dependent
ones (PAPERS.md: communication-reduced CG variants)."""

import numpy as np
import pytest

import opt_tpu as ot
from opt_tpu.models.specs import arap_mesh_deformation, poisson_image_editing


def _poisson_inputs(n):
    rng = np.random.RandomState(0)
    mask = np.ones((n, n), np.float32)
    mask[n // 4 : -n // 4, n // 4 : -n // 4] = 0.0
    return {
        "X": rng.rand(n, n, 4).astype(np.float32),
        "T": rng.rand(n, n, 4).astype(np.float32),
        "M": mask,
    }


def _arap_inputs(n_side):
    N = n_side * n_side
    ii, jj = np.meshgrid(np.arange(n_side), np.arange(n_side), indexing="ij")
    pos = np.stack([ii.ravel(), jj.ravel(), np.zeros(N)], -1).astype(
        np.float32
    )
    vid = np.arange(N).reshape(n_side, n_side)
    v0 = np.concatenate([vid[:-1].ravel(), vid[:, :-1].ravel()])
    v1 = np.concatenate([vid[1:].ravel(), vid[:, 1:].ravel()])
    con = -np.ones((N, 3), np.float32)
    con[0] = pos[0]
    con[-1] = pos[-1] + [2, 0, 1]
    return N, {
        "Offset": pos.copy(),
        "Angle": np.zeros((N, 3), np.float32),
        "UrShape": pos,
        "Constraints": con,
        "G": {
            "v0": np.concatenate([v0, v1]).astype(np.int32),
            "v1": np.concatenate([v1, v0]).astype(np.int32),
        },
        "w_fitSqrt": np.float32(1.0),
        "w_regSqrt": np.float32(np.sqrt(0.5)),
    }


@pytest.mark.parametrize("case", ["poisson", "arap"])
def test_cs_cg_matches_standard_final_cost(case):
    if case == "poisson":
        spec, dims, inputs = (
            poisson_image_editing,
            {"W": 24, "H": 24},
            _poisson_inputs(24),
        )
        sp = dict(nIterations=3, lIterations=80)
        rtol = 5e-3
    else:
        # nonconvex graph case: plain GN oscillates around the ARAP basin,
        # where float-rounding differences between the two (algebraically
        # identical) recurrences compound chaotically after ~5 steps —
        # compare the early trajectory, where the iterates still shadow
        # each other tightly
        N, inputs = _arap_inputs(8)
        spec, dims = arap_mesh_deformation, {"N": N}
        sp = dict(nIterations=4, lIterations=40)
        rtol = 5e-3

    res_std = ot.Problem(spec).plan(dims=dims).solve(dict(inputs), **sp)
    plan_cs = ot.Problem(spec).plan(
        dims=dims,
        init_params=ot.InitializationParameters(
            cg_variant="chronopoulos_gear"
        ),
    )
    res_cs = plan_cs.solve(dict(inputs), **sp)
    assert np.isfinite(res_cs.final_cost)
    np.testing.assert_allclose(
        res_cs.final_cost, res_std.final_cost, rtol=rtol, atol=1e-6
    )
    # identical iterates in exact arithmetic; rounding shifts the rᵀz-floor
    # exit by a few iterations at most
    assert (
        abs(res_cs.num_linear_iterations - res_std.num_linear_iterations)
        <= 0.1 * res_std.num_linear_iterations + 2
    ), (res_cs.num_linear_iterations, res_std.num_linear_iterations)


@pytest.mark.parametrize("case", ["poisson", "arap"])
def test_cs_cg_matches_standard_lm(case):
    """LM path: the CS loop reproduces the standard LM inner loop's
    final cost (incl. the Q/ζ exit and residual-reset semantics) and a
    comparable linear-iteration count."""
    if case == "poisson":
        spec, dims, inputs = (
            poisson_image_editing,
            {"W": 24, "H": 24},
            _poisson_inputs(24),
        )
        sp = dict(nIterations=4, lIterations=60)
    else:
        N, inputs = _arap_inputs(8)
        spec, dims = arap_mesh_deformation, {"N": N}
        sp = dict(nIterations=5, lIterations=40)

    res_std = ot.Problem(spec, kind="LMGPU").plan(dims=dims).solve(
        dict(inputs), **sp
    )
    res_cs = ot.Problem(spec, kind="LMGPU").plan(
        dims=dims,
        init_params=ot.InitializationParameters(
            cg_variant="chronopoulos_gear"
        ),
    ).solve(dict(inputs), **sp)
    assert np.isfinite(res_cs.final_cost)
    np.testing.assert_allclose(
        res_cs.final_cost, res_std.final_cost, rtol=5e-3, atol=1e-6
    )
    assert (
        abs(res_cs.num_linear_iterations - res_std.num_linear_iterations)
        <= 0.15 * res_std.num_linear_iterations + 3
    ), (res_cs.num_linear_iterations, res_std.num_linear_iterations)


def test_cs_cg_lm_q_exit_fires():
    """The ζ early-exit must terminate the CS LM inner loop the same way
    it terminates the standard one: with a loose q_tolerance both loops
    use far fewer linear iterations than the cap, and agree."""
    inputs = _poisson_inputs(24)
    sp = dict(nIterations=2, lIterations=200, q_tolerance=1e-2)
    counts = {}
    for variant in ["standard", "chronopoulos_gear"]:
        res = ot.Problem(poisson_image_editing, kind="LMGPU").plan(
            dims={"W": 24, "H": 24},
            init_params=ot.InitializationParameters(cg_variant=variant),
        ).solve(dict(inputs), **sp)
        counts[variant] = res.num_linear_iterations
    assert counts["standard"] < 2 * 200, counts
    assert (
        abs(counts["chronopoulos_gear"] - counts["standard"])
        <= 0.15 * counts["standard"] + 3
    ), counts


def test_cs_cg_halves_loop_all_reduces_on_mesh():
    """Under the 8-device mesh the CS loop's two independent reductions
    merge: the compiled while-body carries fewer all-reduce ops than the
    standard loop's two dependent ones."""
    import jax

    from opt_tpu.parallel.mesh import make_mesh

    n = 32
    inputs = _poisson_inputs(n)
    mesh = make_mesh()
    sp_kw = dict(nIterations=1, lIterations=20)

    def hlo(variant):
        plan = ot.Problem(poisson_image_editing).plan(
            {"W": n, "H": n},
            mesh=mesh,
            init_params=ot.InitializationParameters(cg_variant=variant),
        )
        u, c, g, p = plan._normalize_and_place(dict(inputs))
        sp = plan.solver._traced_sp(
            ot.SOLVER_PARAMETER_DEFAULTS | sp_kw
        )
        return (
            jax.jit(
                lambda X, cs, gs, ps: plan.solver._solve_core(
                    X, cs, gs, ps, sp, 1
                )
            )
            .lower(u, c, g, p)
            .compile()
            .as_text()
        )

    h_std = hlo("standard")
    h_cs = hlo("chronopoulos_gear")
    # compare totals: the loop body dominates the all-reduce count
    assert h_cs.count(" all-reduce(") < h_std.count(" all-reduce("), (
        h_cs.count(" all-reduce("),
        h_std.count(" all-reduce("),
    )


@pytest.mark.parametrize("seed", range(4))
def test_solver_option_combos_on_random_specs(seed):
    """Random specs x random solver-option combos (variant, preconditioner,
    coefficient dtype, kind): every combination must solve finitely and
    land near the baseline f32/standard/jacobi result (GN; LM trajectories
    legitimately differ on nonconvex specs, so LM asserts finiteness and
    non-increase only)."""
    import sys
    import os

    sys.path.insert(0, os.path.dirname(__file__))
    import test_fuzz_operator as tfo

    # both generators return (spec, dims, inputs)
    gen = tfo._random_grid_spec if seed % 2 == 0 else tfo._random_graph_spec
    rng = np.random.RandomState(7000 + seed)
    spec, dims, inputs = gen(rng)

    kind = "gaussNewtonGPU" if seed % 2 == 0 else "LMGPU"
    combo = dict(
        cg_variant=["standard", "chronopoulos_gear"][rng.randint(2)],
        preconditioner=["jacobi", "block_jacobi"][rng.randint(2)],
        coefficient_dtype=[None, "bfloat16"][rng.randint(2)],
        dynamic_topology=bool(rng.randint(2)),
    )
    sp = dict(nIterations=3, lIterations=15)
    base = ot.Problem(spec, kind=kind).plan(dims=dims).solve(
        dict(inputs), **sp
    )
    plan = ot.Problem(spec, kind=kind).plan(
        dims=dims, init_params=ot.InitializationParameters(**combo)
    )
    res = plan.solve(dict(inputs), **sp)
    assert np.isfinite(res.final_cost), (combo, res.costs)
    assert res.final_cost <= res.costs[0] + 1e-5, (combo, res.costs)
    if kind == "gaussNewtonGPU" and combo["coefficient_dtype"] is None:
        np.testing.assert_allclose(
            res.final_cost, base.final_cost, rtol=2e-2, atol=1e-6
        )
