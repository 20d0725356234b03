#!/usr/bin/env python3
"""TPU micro-timings of block-matvec apply formulations in a while-loop.

The graph CG loop applies five [N, ct, ct] coefficient fields to a packed
[N, ct] vector every iteration. Measures, inside one jitted fori_loop
(dependent iterations), the ms/iter of each formulation:

  reshape3d  — carry flat [N, ct²], reshape to [N, ct, ct] in-loop
               (the relayout XLA executes per iteration when it sinks the
               invariant reshape into the body)
  carried3d  — carry [N, ct, ct] directly (stacked-path shape)
  slices     — carry flat [N, ct²], apply via ct sublane slices + reduce;
               no reshape anywhere
  dotcat     — carry [ct², N]ᵀ? no — flat [N, ct²] times a tiled p via
               one elementwise mul + segment reduce by reshape of the
               RESULT only

    python scripts/apply_micro.py [--n 36864] [--ct 6] [--k 32] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=36864)
    ap.add_argument("--ct", type=int, default=6)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--fields", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    N, ct, F = args.n, args.ct, args.fields
    rng = np.random.RandomState(0)
    Ws = [rng.randn(N, ct * ct).astype(np.float32) * 0.01 for _ in range(F)]
    p0 = rng.randn(N, ct).astype(np.float32)

    def time_loop(make_step, carried):
        def prog(carry, n):
            def body(i, c):
                p = c[0]
                out = make_step(c[1], p)
                return (out / (1.0 + jnp.max(jnp.abs(out))), c[1])

            return jax.lax.fori_loop(0, n, body, carry)

        f1 = jax.jit(lambda c: prog(c, 1))
        fk = jax.jit(lambda c: prog(c, args.k))

        def best(f):
            jax.block_until_ready(f((jnp.asarray(p0), carried)))
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f((jnp.asarray(p0), carried)))
                b = min(b, time.perf_counter() - t0)
            return b

        t1, tk = best(f1), best(fk)
        return round((tk - t1) / (args.k - 1) * 1e3, 4)

    out = {}

    # 1) flat carried, reshape in apply
    Wflat = tuple(jnp.asarray(w) for w in Ws)

    def step_reshape(ws, p):
        acc = None
        for w in ws:
            c = jnp.sum(w.reshape(N, ct, ct) * p[:, None, :], axis=-1)
            acc = c if acc is None else acc + c
        return acc

    out["reshape3d_ms"] = time_loop(step_reshape, Wflat)

    # 2) carried 3-D
    W3 = tuple(jnp.asarray(w.reshape(N, ct, ct)) for w in Ws)

    def step_3d(ws, p):
        acc = None
        for w in ws:
            c = jnp.sum(w * p[:, None, :], axis=-1)
            acc = c if acc is None else acc + c
        return acc

    out["carried3d_ms"] = time_loop(step_3d, W3)

    # 3) flat carried, sublane slices
    def step_slices(ws, p):
        acc = None
        for w in ws:
            c = jnp.stack(
                [
                    jnp.sum(w[:, i * ct : (i + 1) * ct] * p, axis=-1)
                    for i in range(ct)
                ],
                axis=-1,
            )
            acc = c if acc is None else acc + c
        return acc

    out["slices_ms"] = time_loop(step_slices, Wflat)

    # 4) flat carried, one mul against a channel-tiled p + result reshape
    def step_tiled(ws, p):
        pt = jnp.tile(p, (1, ct))  # [N, ct*ct], pt[:, i*ct+j] = p[:, j]
        acc = None
        for w in ws:
            c = jnp.sum((w * pt).reshape(N, ct, ct), axis=-1)
            acc = c if acc is None else acc + c
        return acc

    out["tiled_ms"] = time_loop(step_tiled, Wflat)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
