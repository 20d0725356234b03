#!/usr/bin/env python3
"""Interleaved A/B of the ARAP graph assembly modes, drift-robust.

The tunneled rig's throughput can drift by >10x over tens of minutes, so
separate-process A/B runs are not comparable. This harness alternates the
two modes WITHIN one process (A B A B ...), brackets every measurement
with a fixed rig-health probe (a large matmul), and reports per-mode
medians plus the probe times so drift is visible in the record.

    python scripts/ab_arap.py [--side 192] [--rounds 3] [--outer 8]
                              [--inner 100] [--cpu]
"""

import argparse
import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def make_inputs(n_side):
    N = n_side * n_side
    ii, jj = np.meshgrid(np.arange(n_side), np.arange(n_side), indexing="ij")
    pos = np.stack([ii.ravel(), jj.ravel(), np.zeros(N)], -1).astype(np.float32)
    vid = np.arange(N).reshape(n_side, n_side)
    v0 = np.concatenate([vid[:-1].ravel(), vid[:, :-1].ravel()])
    v1 = np.concatenate([vid[1:].ravel(), vid[:, 1:].ravel()])
    v0b = np.concatenate([v0, v1]).astype(np.int32)
    v1b = np.concatenate([v1, v0]).astype(np.int32)
    con = -np.ones((N, 3), np.float32)
    con[vid[0, 0]] = pos[vid[0, 0]]
    con[vid[-1, -1]] = pos[vid[-1, -1]] + np.array([10.0, 0, 5.0], np.float32)
    return N, {
        "Offset": pos.copy(),
        "Angle": np.zeros((N, 3), np.float32),
        "UrShape": pos,
        "Constraints": con,
        "G": {"v0": v0b, "v1": v1b},
        "w_fitSqrt": np.sqrt(1.0).astype(np.float32),
        "w_regSqrt": np.sqrt(0.5).astype(np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=192)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--outer", type=int, default=8)
    ap.add_argument("--inner", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import opt_tpu as ot
    from opt_tpu.models.specs import arap_mesh_deformation

    N, inputs = make_inputs(args.side)

    # rig-health probe: fixed 2048^2 matmul chain, reported per measurement
    a = jnp.ones((2048, 2048), jnp.float32)

    @jax.jit
    def probe(a):
        for _ in range(8):
            a = a @ a * 1e-3
        return a

    def probe_ms():
        jax.block_until_ready(probe(a))
        t0 = time.perf_counter()
        jax.block_until_ready(probe(a))
        return (time.perf_counter() - t0) * 1e3

    plans = {}
    for mode in (True, False):
        plans[mode] = ot.Problem(arap_mesh_deformation).plan(
            dims={"N": N},
            init_params=ot.InitializationParameters(
                aligned_graph_assembly=mode
            ),
        )

    ji = {
        k: (jax.device_put(v) if not isinstance(v, dict) else v)
        for k, v in inputs.items()
    }

    def run(mode, lit):
        res = plans[mode].solve(
            dict(ji), nIterations=args.outer, lIterations=lit
        )
        jax.block_until_ready(res.unknowns)
        return res

    # compile both up front
    for mode in (True, False):
        run(mode, args.inner)
        run(mode, 1)

    recs = []
    for r in range(args.rounds):
        for mode in (True, False):
            hp0 = probe_ms()
            t0 = time.perf_counter()
            res = run(mode, args.inner)
            t_full = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(mode, 1)
            t_one = time.perf_counter() - t0
            hp1 = probe_ms()
            recs.append(
                {
                    "round": r,
                    "aligned": mode,
                    "t_full_s": round(t_full, 4),
                    "t_one_s": round(t_one, 4),
                    "lin_iters": int(res.num_linear_iterations),
                    "cost": float(res.final_cost),
                    "probe_ms": [round(hp0, 2), round(hp1, 2)],
                }
            )
            print(json.dumps(recs[-1]), flush=True)

    out = {}
    for mode in (True, False):
        rs = [x for x in recs if x["aligned"] == mode]
        full = statistics.median(x["t_full_s"] for x in rs)
        one = statistics.median(x["t_one_s"] for x in rs)
        li = rs[0]["lin_iters"]
        extra = max(1, li - args.outer)  # iterations beyond the lIter=1 runs
        out["aligned" if mode else "stacked"] = {
            "median_full_s": round(full, 4),
            "median_one_s": round(one, 4),
            "gn_it_per_s": round(args.outer / full, 2),
            "per_step_fixed_ms": round(one / args.outer * 1e3, 3),
            "per_cg_iter_ms": round((full - one) / extra * 1e3, 4),
            "lin_iters": li,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
