"""Fused Pallas CG kernel parity (ops/pallas_cg.py).

Runs the kernel in Pallas interpret mode on CPU and checks the whole solve
matches the XLA while_loop path — same final cost, same unknowns, and that
the kernel actually activated (the plan qualifies) where expected.
"""

import numpy as np

import opt_tpu as ot
from opt_tpu.models.specs import poisson_image_editing
from opt_tpu.solver.params import InitializationParameters


def _poisson_inputs(n):
    rng = np.random.RandomState(0)
    mask = np.ones((n, n), np.float32)
    mask[n // 4 : -n // 4, n // 4 : -n // 4] = 0.0
    return {
        "X": rng.rand(n, n, 4).astype(np.float32),
        "T": rng.rand(n, n, 4).astype(np.float32),
        "M": mask,
    }


def test_fused_pallas_cg_matches_xla_loop():
    n = 32
    inputs = _poisson_inputs(n)
    base = ot.Problem(poisson_image_editing).plan(dims={"W": n, "H": n})
    res_xla = base.solve(dict(inputs), nIterations=1, lIterations=120)

    plan_p = ot.Problem(poisson_image_editing).plan(
        dims={"W": n, "H": n},
        init_params=InitializationParameters(use_pallas_cg="interpret"),
    )
    # the qualifying check: poisson (single 2-D unknown, scalar couplings)
    # must activate the kernel
    assert plan_p.solver._pallas_mode == "interpret"
    res_pal = plan_p.solve(dict(inputs), nIterations=1, lIterations=120)

    assert np.allclose(res_xla.final_cost, res_pal.final_cost, rtol=1e-4), (
        res_xla.final_cost,
        res_pal.final_cost,
    )
    assert np.allclose(
        np.asarray(res_xla.unknowns["X"]),
        np.asarray(res_pal.unknowns["X"]),
        atol=2e-3,
    )
    # iteration accounting flows through the kernel's SMEM output
    assert res_pal.num_linear_iterations > 10


def test_fused_pallas_cg_mixed_unknown_blocks():
    """image_warping class: two unknowns packed on one index space with
    scalar + block couplings must match the XLA loop."""
    from opt_tpu.models.specs import image_warping

    n = 24
    rng = np.random.RandomState(1)
    ur = np.stack(
        np.meshgrid(np.arange(n), np.arange(n), indexing="ij"), -1
    ).astype(np.float32)
    con = -np.ones((n, n, 2), np.float32)
    con[2, 2] = [3.0, 1.5]
    con[n - 3, n - 3] = [n - 5.0, n - 2.0]
    inputs = {
        "Offset": ur + rng.rand(n, n, 2).astype(np.float32) * 0.1,
        "Angle": np.zeros((n, n), np.float32),
        "UrShape": ur,
        "Constraints": con,
        "Mask": np.zeros((n, n), np.float32),
        "w_fitSqrt": np.sqrt(10.0).astype(np.float32),
        "w_regSqrt": np.sqrt(1.0).astype(np.float32),
    }
    base = ot.Problem(image_warping).plan(dims={"W": n, "H": n})
    res_xla = base.solve(dict(inputs), nIterations=3, lIterations=30)

    plan_p = ot.Problem(image_warping).plan(
        dims={"W": n, "H": n},
        init_params=InitializationParameters(use_pallas_cg="interpret"),
    )
    assert plan_p.solver._pallas_mode == "interpret"
    res_pal = plan_p.solve(dict(inputs), nIterations=3, lIterations=30)
    assert np.allclose(res_xla.final_cost, res_pal.final_cost, rtol=1e-3), (
        res_xla.final_cost,
        res_pal.final_cost,
    )
    for u in ("Offset", "Angle"):
        assert np.allclose(
            np.asarray(res_xla.unknowns[u]),
            np.asarray(res_pal.unknowns[u]),
            atol=5e-3,
        ), u


def test_fused_pallas_cg_lm_trust_region():
    """LM in-kernel: CtC damping, residual reset and Q/ζ exit must track the
    XLA loop through the trust-region accept/reject sequence."""
    n = 24
    inputs = _poisson_inputs(n)
    base = ot.Problem(poisson_image_editing, kind="LMGPU").plan(
        dims={"W": n, "H": n}
    )
    res_xla = base.solve(
        dict(inputs), nIterations=4, lIterations=40, residual_reset_period=7
    )
    plan_p = ot.Problem(poisson_image_editing, kind="LMGPU").plan(
        dims={"W": n, "H": n},
        init_params=InitializationParameters(use_pallas_cg="interpret"),
    )
    res_pal = plan_p.solve(
        dict(inputs), nIterations=4, lIterations=40, residual_reset_period=7
    )
    assert np.allclose(res_xla.final_cost, res_pal.final_cost, rtol=1e-3), (
        res_xla.final_cost,
        res_pal.final_cost,
    )


def test_fused_pallas_cg_3d_grid():
    """volumetric class: 3-D index space, 6-neighbor stencil, mixed
    Offset+Angle unknowns."""
    from opt_tpu.models.specs import volumetric_mesh_deformation

    n = 8
    rng = np.random.RandomState(2)
    ii, jj, kk = np.meshgrid(
        np.arange(n), np.arange(n), np.arange(n), indexing="ij"
    )
    ur = np.stack([ii, jj, kk], -1).astype(np.float32)
    con = -1e6 * np.ones((n, n, n, 3), np.float32)
    con[0, 0, 0] = ur[0, 0, 0]
    con[-1, -1, -1] = ur[-1, -1, -1] + [1.0, 0.5, 0.0]
    inputs = {
        "Offset": ur + rng.rand(n, n, n, 3).astype(np.float32) * 0.05,
        "Angle": np.zeros((n, n, n, 3), np.float32),
        "UrShape": ur,
        "Constraints": con,
        "w_fitSqrt": np.sqrt(2.0).astype(np.float32),
        "w_regSqrt": np.sqrt(1.0).astype(np.float32),
    }
    dims = {"W": n, "H": n, "D": n}
    base = ot.Problem(volumetric_mesh_deformation).plan(dims=dims)
    res_xla = base.solve(dict(inputs), nIterations=2, lIterations=15)

    plan_p = ot.Problem(volumetric_mesh_deformation).plan(
        dims=dims,
        init_params=InitializationParameters(use_pallas_cg="interpret"),
    )
    assert plan_p.solver._pallas_mode == "interpret"
    res_pal = plan_p.solve(dict(inputs), nIterations=2, lIterations=15)
    assert np.allclose(res_xla.final_cost, res_pal.final_cost, rtol=1e-3), (
        res_xla.final_cost,
        res_pal.final_cost,
    )


def test_fused_pallas_cg_under_vmap_batched_solve():
    """solve_batched vmaps the whole solve; the pallas_call inside must
    batch correctly (maps the batch to a kernel grid dimension)."""
    from opt_tpu.models.specs import laplacian

    B, n = 4, 16
    rng = np.random.RandomState(0)
    inputs = {
        "X": rng.rand(B, n, n).astype(np.float32),
        "A": rng.rand(B, n, n).astype(np.float32),
    }
    r1 = ot.Problem(laplacian).plan(dims={"W": n, "H": n}).solve_batched(
        dict(inputs), nIterations=3, lIterations=20
    )
    r2 = ot.Problem(laplacian).plan(
        dims={"W": n, "H": n},
        init_params=InitializationParameters(use_pallas_cg="interpret"),
    ).solve_batched(dict(inputs), nIterations=3, lIterations=20)
    assert np.allclose(r1.final_costs, r2.final_costs, rtol=1e-3), (
        r1.final_costs,
        r2.final_costs,
    )


def test_pallas_auto_mode_stays_off_on_cpu():
    n = 16
    plan = ot.Problem(poisson_image_editing).plan(dims={"W": n, "H": n})
    assert plan.solver._pallas_mode is None  # tests force the CPU backend


def test_pallas_not_planned_for_graph_problems():
    """Graph problems must not produce a fused-CG descriptor."""
    from opt_tpu.models.specs import arap_mesh_deformation

    n_side = 6
    N = n_side * n_side
    ii, jj = np.meshgrid(np.arange(n_side), np.arange(n_side), indexing="ij")
    pos = np.stack([ii.ravel(), jj.ravel(), np.zeros(N)], -1).astype(np.float32)
    vid = np.arange(N).reshape(n_side, n_side)
    v0 = np.concatenate([vid[:-1].ravel(), vid[:, :-1].ravel()])
    v1 = np.concatenate([vid[1:].ravel(), vid[:, 1:].ravel()])
    con = -1e6 * np.ones((N, 3), np.float32)
    con[0] = pos[0]
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
    plan = ot.Problem(arap_mesh_deformation).plan(
        dims={"N": N},
        init_params=InitializationParameters(use_pallas_cg="interpret"),
    )
    res = plan.solve(dict(inputs), nIterations=2, lIterations=10)
    assert np.isfinite(res.final_cost)


def test_fused_pallas_cg_computed_array_spec():
    """SFS-style spec with ComputedArray (precomputed value + gradient
    slots): the fused Pallas CG (interpret mode on CPU) must match the XLA
    loop — this is the assembled-field + Pallas combination the TPU bench
    runs for shape_from_shading."""
    from opt_tpu.models.specs import shape_from_shading

    rng = np.random.RandomState(0)
    h = w = 32
    depth = (rng.rand(h, w) + 1).astype(np.float32)
    inputs = {
        "X": depth + 0.01 * rng.randn(h, w).astype(np.float32),
        "D_i": depth,
        "Im": rng.rand(h, w).astype(np.float32),
        "edgeMaskR": np.ones((h, w), np.float32),
        "edgeMaskC": np.ones((h, w), np.float32),
        "w_p": 1.0, "w_s": 1.0, "w_g": 10.0,
        "f_x": 500.0, "f_y": 500.0, "u_x": w / 2, "u_y": h / 2,
        **{f"L_{i}": (0.5 if i == 1 else 0.1) for i in range(1, 10)},
    }
    ipp = ot.InitializationParameters(use_pallas_cg="interpret")
    res_p = ot.Problem(shape_from_shading).plan(
        {"W": h, "H": w}, init_params=ipp
    ).solve(dict(inputs), nIterations=4, lIterations=10)
    res_x = ot.Problem(shape_from_shading).plan({"W": h, "H": w}).solve(
        dict(inputs), nIterations=4, lIterations=10
    )
    assert np.isclose(res_p.final_cost, res_x.final_cost, rtol=1e-4), (
        res_p.final_cost,
        res_x.final_cost,
    )


def test_fused_pallas_cg_bf16_coefficients():
    """coefficient_dtype="bfloat16" keeps the fused kernel active (the
    fields are stored bf16 in VMEM — the capacity win) and the solve lands
    on the f32 final cost via outer refinement."""
    n = 32
    inputs = _poisson_inputs(n)
    res_f32 = ot.Problem(poisson_image_editing).plan(
        dims={"W": n, "H": n}
    ).solve(dict(inputs), nIterations=4, lIterations=60)

    plan_p = ot.Problem(poisson_image_editing).plan(
        dims={"W": n, "H": n},
        init_params=InitializationParameters(
            use_pallas_cg="interpret", coefficient_dtype="bfloat16"
        ),
    )
    assert plan_p.solver._pallas_mode == "interpret"
    res_pal = plan_p.solve(dict(inputs), nIterations=4, lIterations=60)
    import jax.numpy as jnp

    # the kernel really stores bf16 fields
    fs_meta = None
    from opt_tpu.functions import FunctionSet

    u, c, g, p = plan_p._normalize_and_place(dict(inputs))
    fs = FunctionSet(plan_p.compiled, c, g, p)
    fs.masks(u)
    _a, _d, _j, fs_meta = fs.assemble_stencil(
        u, plan_p.solver._stencil_plan, coeff_dtype="bfloat16"
    )
    assert fs_meta is not None and fs_meta["F"].dtype == jnp.bfloat16
    assert np.allclose(res_pal.final_cost, res_f32.final_cost, rtol=5e-3), (
        res_pal.final_cost,
        res_f32.final_cost,
    )
