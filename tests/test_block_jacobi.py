"""Block-Jacobi preconditioner (InitializationParameters.preconditioner).

Per-element Δ=0 coupling-block inverses couple the channels scalar Jacobi
ignores; with an rᵀz convergence floor the CG inner loop must need FEWER
iterations on mixed-unknown problems while landing on the same final cost
(no reference counterpart — scalar Jacobi only, o.t:2149-2168)."""

import numpy as np
import pytest

import opt_tpu as ot
from opt_tpu.models.specs import arap_mesh_deformation, image_warping


def _warp_case(n=24):
    rng = np.random.RandomState(0)
    ur = np.stack(
        np.meshgrid(np.arange(n), np.arange(n), indexing="ij"), -1
    ).astype(np.float32)
    con = -np.ones((n, n, 2), np.float32)
    con[2, 2] = [4.0, 4.0]
    con[n - 3, n - 3] = [n - 6.0, n - 2.0]
    inputs = {
        "Offset": ur + 0.05 * rng.randn(n, n, 2).astype(np.float32),
        "Angle": np.zeros((n, n), np.float32),
        "UrShape": ur,
        "Constraints": con,
        "Mask": np.zeros((n, n), np.float32),
        "w_fitSqrt": np.float32(3.0),
        "w_regSqrt": np.float32(1.0),
    }
    return image_warping, {"W": n, "H": n}, inputs


def _arap_case(n_side=8):
    N = n_side * n_side
    ii, jj = np.meshgrid(np.arange(n_side), np.arange(n_side), indexing="ij")
    pos = np.stack([ii.ravel(), jj.ravel(), np.zeros(N)], -1).astype(
        np.float32
    )
    vid = np.arange(N).reshape(n_side, n_side)
    v0 = np.concatenate([vid[:-1].ravel(), vid[:, :-1].ravel()])
    v1 = np.concatenate([vid[1:].ravel(), vid[:, 1:].ravel()])
    con = -np.ones((N, 3), np.float32)
    # pin the whole first row and displace the whole last row: a deformation
    # with a single well-defined optimum. (With only two pinned corners the
    # 15-step landscape has several basins ~15% apart in cost and the
    # scalar-vs-block comparison turns into a roundoff-seeded coin flip —
    # observed when switching the block inversion from pivoted LU to
    # Gauss-Jordan, both ~1e-7-accurate on these cond<=10 blocks.)
    con[vid[0, :]] = pos[vid[0, :]]
    con[vid[-1, :]] = pos[vid[-1, :]] + [2, 0, 1]
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
        "w_regSqrt": np.float32(np.sqrt(0.5)),
    }
    return arap_mesh_deformation, {"N": N}, inputs


@pytest.mark.parametrize(
    "case,n_outer,cost_rtol,iter_ratio",
    [
        # convex-ish: trajectories coincide, ~30%+ fewer CG iterations
        ("warp", 6, 5e-3, 1.0),
        # nonconvex ARAP: plain-GN trajectories differ step by step, so
        # compare near convergence; the inner solves need ~3x fewer
        # iterations (measured 118 vs 346)
        ("arap", 15, 5e-2, 0.6),
    ],
)
def test_block_jacobi_converges_faster_to_same_cost(
    case, n_outer, cost_rtol, iter_ratio
):
    spec, dims, inputs = _warp_case() if case == "warp" else _arap_case()
    sp = dict(nIterations=n_outer, lIterations=200, cg_rz_tolerance=1e-5)

    res_j = ot.Problem(spec).plan(dims=dims).solve(dict(inputs), **sp)
    plan_b = ot.Problem(spec).plan(
        dims=dims,
        init_params=ot.InitializationParameters(
            preconditioner="block_jacobi"
        ),
    )
    res_b = plan_b.solve(dict(inputs), **sp)

    assert np.isfinite(res_b.final_cost)
    np.testing.assert_allclose(
        res_b.final_cost, res_j.final_cost, rtol=cost_rtol, atol=1e-6
    )
    # the whole point: fewer CG iterations to the same rz floor
    assert (
        res_b.num_linear_iterations
        < iter_ratio * res_j.num_linear_iterations
    ), (res_b.num_linear_iterations, res_j.num_linear_iterations)


def test_block_pre_built_from_full_precision_under_bf16():
    """coefficient_dtype narrows only CG-loop storage: M⁻¹ must be built
    from solve-dtype blocks, so the block-pre output is identical with and
    without bf16 narrowing."""
    import jax.numpy as jnp

    from opt_tpu.functions import FunctionSet

    spec, dims, inputs = _arap_case()
    rng = np.random.RandomState(3)
    r = None
    for coeff in (None, "bfloat16"):
        plan = ot.Problem(spec).plan(
            dims=dims,
            init_params=ot.InitializationParameters(
                preconditioner="block_jacobi", coefficient_dtype=coeff
            ),
        )
        u, c, g, p = plan._normalize_and_place(dict(inputs))
        fs = FunctionSet(plan.compiled, c, g, p)
        fs.masks(u)
        A, _d, _j, _m = fs.assemble_stencil(
            u, plan.solver._stencil_plan, coeff_dtype=coeff
        )
        if r is None:
            r = {
                k: jnp.asarray(
                    rng.randn(*plan.compiled.unknown_shape(k)),
                    plan.compiled.dtype,
                )
                for k in plan.compiled.unknown_names
            }
        z = A.block_pre()(r)
        if coeff is None:
            z_ref = z
    for k in z_ref:
        np.testing.assert_array_equal(np.asarray(z_ref[k]), np.asarray(z[k]))


def test_validation_survives_domain_restricted_specs():
    """The perturbed-point validation must not drop the assembled path for
    specs whose residuals leave the numeric domain under an O(1) unknown
    perturbation (sqrt of an unknown)."""
    import jax.numpy as jnp

    def sqrt_spec(S):
        W, H = S.Dim("W"), S.Dim("H")
        X = S.Unknown("X", 1, (W, H))
        A = S.Array("A", 1, (W, H))
        # domain X > -2; optimum X = (1+A)^2 - 2 ∈ [-1, 2] keeps the SOLVE
        # inside, while validation's O(1) perturbation from X0 = -1.5
        # (±(0.5·1.5+0.5) = ±1.25) crosses the domain edge — both
        # operators NaN there, which must not drop the assembled path
        S.Energy(
            jnp.sqrt(X(0, 0) + 2.0) - (1.0 + A(0, 0)),
            X(0, 0) - X(1, 0),
        )

    rng = np.random.RandomState(0)
    inputs = {"X": np.full((8, 8), -1.5, np.float32),
              "A": rng.rand(8, 8).astype(np.float32)}
    plan = ot.Problem(sqrt_spec).plan(dims={"W": 8, "H": 8})
    assert plan.solver._stencil_plan is not None
    res = plan.solve(dict(inputs), nIterations=2, lIterations=10)
    assert np.isfinite(res.final_cost)
    assert plan.solver._stencil_plan is not None, (
        "validation dropped the assembled path on a domain-restricted spec"
    )


def test_block_jacobi_lm_damped_blocks():
    """LM inverts the DAMPED block (B + diag(CtC)): same converged cost,
    fewer CG iterations (LM's Q/zeta exits already truncate CG, so the
    gain is smaller than GN's; measured 63 vs 99)."""
    spec, dims, inputs = _arap_case()
    sp = dict(nIterations=10, lIterations=200, cg_rz_tolerance=1e-5)
    res_j = ot.Problem(spec, kind="LMGPU").plan(dims=dims).solve(
        dict(inputs), **sp
    )
    res_b = ot.Problem(spec, kind="LMGPU").plan(
        dims=dims,
        init_params=ot.InitializationParameters(
            preconditioner="block_jacobi"
        ),
    ).solve(dict(inputs), **sp)
    np.testing.assert_allclose(
        res_b.final_cost, res_j.final_cost, rtol=5e-3
    )
    assert res_b.num_linear_iterations < 0.8 * res_j.num_linear_iterations, (
        res_b.num_linear_iterations, res_j.num_linear_iterations,
    )
