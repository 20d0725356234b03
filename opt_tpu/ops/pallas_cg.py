"""Fused multi-iteration PCG as ONE Pallas TPU kernel (VMEM-resident CG).

The XLA formulation of the CG inner loop (solver/gauss_newton.py) already
keeps state VMEM-resident across ``lax.while_loop`` iterations, but every
iteration still round-trips the loop carry through the XLA while-loop
machinery op by op. For grid problems whose whole working set fits in VMEM
— the reference's flagship poisson_image_editing class: one 2-D unknown
image, channel-identical ("scalar") stencil couplings — the entire PCG
solve can instead run as a single Pallas kernel: weights, residual, search
direction and iterate never leave VMEM, the K stencil shifts are register
rolls, and the two CG dot products are in-kernel reductions.

This is the hand-written analogue of the reference's fused PCGStep1/2/3
CUDA kernels (solverGPUGaussNewton.t:421-550) taken one step further: the
reference fuses one linear iteration per launch; here ALL linear
iterations (with the same rᵀz-floor early exit as the XLA path) are one
launch.

Correctness notes
-----------------
* Shifts use circular rolls. ``shift(p, Δ)`` (ops/shift.py) is zero-padded;
  the kernel folds the in-bounds mask of each offset into its weight field
  at setup (W'_Δ = W_Δ · M_Δ), which makes roll and zero-padded shift give
  bit-equal products: wherever the roll wraps, the weight is exactly zero.
* State is channel-major [C, H, W] inside the kernel so the minor two dims
  are the large spatial dims (trailing [.., C] lane-pads at small C).
* The iteration algebra matches GaussNewtonSolver._gn_step body exactly
  (same guarded divisions, same break conditions), so final costs agree
  with the XLA loop to reduction-ordering roundoff.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# conservative single-core VMEM working-set budget (v5e/v5p have 128 MiB;
# leave headroom for Mosaic temporaries and double-buffering)
VMEM_BUDGET_BYTES = 80 * 1024 * 1024


def _roll(x, s: int, axis: int, interpret: bool):
    """Circular roll by s >= 0 (result[i] = x[i - s] along axis)."""
    n = x.shape[axis]
    s = s % n
    if s == 0:
        return x
    if interpret:
        hi = jax.lax.slice_in_dim(x, n - s, n, axis=axis)
        lo = jax.lax.slice_in_dim(x, 0, n - s, axis=axis)
        return jnp.concatenate([hi, lo], axis=axis)
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(x, s, axis)


def _kernel(
    W_ref,
    b_ref,
    pre_ref,
    lits_ref,
    tol_ref,
    delta_ref,
    iters_ref,
    *,
    deltas: Tuple[Tuple[int, int], ...],
    guard_div: bool,
    interpret: bool,
):
    W = W_ref[...]  # [K, H, W] masked scalar weight fields
    b = b_ref[...]  # [C, H, W] = -JᵀF
    pre = pre_ref[...]  # [C, H, W] guarded-inverted preconditioner

    H, Wd = b.shape[1], b.shape[2]

    def apply(p):
        # (JᵀJ p)[q] = Σ_Δ W'_Δ[q] · p[q+Δ]; roll is exact because the
        # in-bounds masks are folded into W' (see module docstring)
        acc = None
        for k, (dy, dx) in enumerate(deltas):
            pk = p
            if dy % H:
                pk = _roll(pk, (-dy) % H, 1, interpret)
            if dx % Wd:
                pk = _roll(pk, (-dx) % Wd, 2, interpret)
            t = W[k][None, :, :] * pk
            acc = t if acc is None else acc + t
        return acc

    def safe_div(num, den):
        if not guard_div:
            return num / den
        return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)

    r = b
    p = pre * r
    rz0 = jnp.sum(r * p)
    floor = tol_ref[0] * rz0
    lits = lits_ref[0]

    def cond(c):
        _delta, _r, _p, _rz, l, brk = c
        return jnp.logical_and(l < lits, jnp.logical_not(brk))

    def body(c):
        delta, r, p, rz, l, brk = c
        Ap = apply(p)
        den = jnp.sum(p * Ap)
        alpha = safe_div(rz, den)
        delta = delta + alpha * p
        r = r - alpha * Ap
        z = pre * r
        rz_new = jnp.sum(z * r)
        beta = safe_div(rz_new, rz)
        p = z + beta * p
        brk = jnp.logical_or(rz_new <= floor, den <= 0)
        return (delta, r, p, rz_new, l + 1, brk)

    delta, _r, _p, _rz, l, _brk = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.zeros_like(b),
            r,
            p,
            rz0,
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.bool_),
        ),
    )
    delta_ref[...] = delta
    iters_ref[0] = l


def plan_fused_grid_cg(
    compiled, w_packed, grp_exec, pair_exec, g_unhandled
) -> Optional[Dict]:
    """Decide applicability from the assembled operator structure and build
    the kernel inputs: {u, deltas, W [K, H, W] with in-bounds masks folded}.

    Requirements: no graph couplings of any kind, exactly one 2-D index
    space with one unknown image, every stencil coupling 'scalar'
    (channel-identical weight), float32, and a VMEM-sized working set.
    """
    from .shift import in_bounds_mask

    if grp_exec or pair_exec or g_unhandled:
        return None
    if not w_packed:
        return None
    if compiled.dtype != jnp.float32:
        return None
    isps = {e[0] for e in w_packed}
    if len(isps) != 1:
        return None
    (isp,) = isps
    if isp.ndim != 2:
        return None
    us = [u for u in compiled.unknown_names]
    if len(us) != 1:
        return None
    u = us[0]
    if any(e[2] != "scalar" for e in w_packed):
        return None
    dom = isp.shape(compiled.dim_sizes)
    C = compiled.unknown_shape(u)[-1]
    K = len(w_packed)
    working = (K * dom[0] * dom[1] + 7 * C * dom[0] * dom[1]) * 4
    if working > VMEM_BUDGET_BYTES:
        return None
    deltas = []
    fields = []
    for (_isp, delta, _kind, W, _oo, _oi, _co, _ci) in w_packed:
        deltas.append(tuple(int(d) for d in delta))
        m = in_bounds_mask(dom, delta, dtype=compiled.dtype)[..., 0]
        fields.append(W[..., 0] * m)
    return {
        "u": u,
        "deltas": tuple(deltas),
        "W": jnp.stack(fields, axis=0),
    }


def fused_grid_cg(
    meta: Dict,
    r0: Dict[str, jnp.ndarray],
    pre: Dict[str, jnp.ndarray],
    l_iterations,
    rz_tolerance,
    *,
    guard_div: bool = True,
    interpret: bool = False,
):
    """Run the fused CG kernel; returns (delta pytree, iterations executed)."""
    from jax.experimental import pallas as pl

    u = meta["u"]
    b = jnp.moveaxis(r0[u], -1, 0)  # [C, H, W]
    prem = jnp.moveaxis(pre[u], -1, 0)
    W = meta["W"]
    C, H, Wd = b.shape

    kernel = functools.partial(
        _kernel,
        deltas=meta["deltas"],
        guard_div=guard_div,
        interpret=interpret,
    )
    if interpret:
        in_specs = None
        out_specs = None
    else:
        from jax.experimental.pallas import tpu as pltpu

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        out_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
    kwargs = {}
    if in_specs is not None:
        from jax.experimental.pallas import tpu as pltpu

        kwargs = {
            "in_specs": in_specs,
            "out_specs": out_specs,
            # the while-loop carry (delta, r, p + Ap/z temporaries) lives on
            # the kernel's scoped-VMEM stack; the 16 MiB default rejects
            # 512²x4 problems that comfortably fit physical VMEM
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        }
    delta, iters = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((C, H, Wd), b.dtype),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        interpret=interpret,
        **kwargs,
    )(
        W,
        b,
        prem,
        jnp.asarray(l_iterations, jnp.int32).reshape(1),
        jnp.asarray(rz_tolerance, b.dtype).reshape(1),
    )
    return {u: jnp.moveaxis(delta, 0, -1)}, iters[0]
