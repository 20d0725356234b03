#!/usr/bin/env python3
"""Piecewise TPU timing of the ARAP per-step graph assembly.

Splits the ~18 ms per-GN-step fixed cost (scripts/profile_step.py) into:
  probes      — varying-slot jvp probe evaluation (_slot_jacobians), the
                [E, r, P] `moved` tensors materialized as jit outputs
  products    — probes + every B_all coupling block [E, C, C]
  full        — the real assemble() returning the Jacobi diagonal (same as
                profile_step's assembly_only)

plus synthetic layout microbenches of the product+stack step in the current
trailing-[C, C] layout vs an E-minor [C*C, E] layout, to test the
docs/ROADMAP.md tile-padding hypothesis before touching the real code.

    python scripts/layout_probe.py [--cpu] [--side 192]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

from profile_step import _from_bench_arap


def _time(fn, *args, reps=4):
    import jax

    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def real_pieces(side):
    import jax

    import opt_tpu as ot
    from opt_tpu import assembly
    from opt_tpu.functions import FunctionSet

    spec, dims, inputs = _from_bench_arap(side)
    plan = ot.Problem(spec).plan(dims=dims)
    u, c, g, p = plan._normalize_and_place(dict(inputs))
    sp = plan.solver._stencil_plan
    fs = FunctionSet(plan.compiled, c, g, p)
    cc_host = jax.jit(lambda X: fs.assemble_const(X, sp))(u)
    var_slots = cc_host["var_slots"]

    out = {}

    def probes(X):
        D, moved, _ = assembly._slot_jacobians(
            plan.compiled, X, c, g, p, var_slots
        )
        return moved

    out["probes_ms"] = _time(jax.jit(probes), u)

    def products(X):
        D, moved, base = assembly._slot_jacobians(
            plan.compiled, X, c, g, p, var_slots
        )
        D = dict(D)
        D.update(cc_host["D"])
        B = dict(cc_host["B"])
        for contribs in list(sp.w_spec.values()) + list(sp.g_spec.values()):
            for (t_idx, so, si) in contribs:
                if (t_idx, so, si) not in B:
                    Do = D[(t_idx, so)][..., :, :, None]
                    Di = D[(t_idx, si)][..., :, None, :]
                    B[(t_idx, so, si)] = (Do * Di).sum(-3)
        return list(B.values())

    out["products_ms"] = _time(jax.jit(products), u)

    def full(X):
        cc = fs.assemble_const(X, sp)
        _a, diag, _j, _m = fs.assemble_stencil(X, sp, cc)
        return diag

    out["full_ms"] = _time(jax.jit(full), u)
    return out


def synthetic_layouts(side):
    """Product + stack step alone, two layouts, ARAP-like shapes."""
    import jax
    import jax.numpy as jnp

    E = 2 * 2 * side * (side - 1)  # both edge directions
    r, C, m = 3, 6, 3  # residual ch, packed unknown ch, stacked cross blocks
    P = 6  # varying probe columns
    rng = np.random.RandomState(0)
    moved = jnp.asarray(rng.randn(E, r, P).astype(np.float32))
    movedT = jnp.asarray(np.moveaxis(np.asarray(moved), 0, -1).copy())

    def cur(mv):
        # trailing-block layout: [E, r, C, 1] x [E, r, 1, C] -> [E, C, C]
        Do = mv[..., :, :, None]
        Di = mv[..., :, None, :]
        B = (Do * Di).sum(-3)  # [E, P, P] stand-in for [E, C, C]
        rows = jnp.concatenate(
            [B.reshape(E, P * P)] * m, axis=-1
        )  # [E, m*C*C]
        return rows

    def eminor(mvT):
        # E-minor layout: [r, P, E] -> products [P, P, E] -> rows [E, m*C*C]
        Do = mvT[:, :, None, :]
        Di = mvT[:, None, :, :]
        B = (Do * Di).sum(0)  # [P, P, E]
        flat = B.reshape(P * P, E)
        rows = jnp.concatenate([flat] * m, axis=0)  # [m*C*C, E]
        return rows.T  # one final relayout at the stacked-row boundary

    def eminor_notr(mvT):
        Do = mvT[:, :, None, :]
        Di = mvT[:, None, :, :]
        B = (Do * Di).sum(0)
        return jnp.concatenate([B.reshape(P * P, E)] * m, axis=0)

    return {
        "E": E,
        "cur_ms": _time(jax.jit(cur), moved),
        "eminor_ms": _time(jax.jit(eminor), movedT),
        "eminor_noT_ms": _time(jax.jit(eminor_notr), movedT),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--side", type=int, default=192)
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    rep = {"real": real_pieces(args.side), "synthetic": synthetic_layouts(args.side)}
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
