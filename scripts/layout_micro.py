#!/usr/bin/env python3
"""Synthetic TPU micro-timings for the graph-assembly layout candidates.

Each candidate runs K dependent iterations inside one jitted fori_loop
(the rig's ~24 ms dispatch latency swamps single-shot timings); reported
number is (t_K - t_1)/(K-1) in ms.

Shapes mirror the 192^2 ARAP bench: E=146688 edges, N=36864 vertices,
ct=6 packed channels, m=2 slots, r=3 residual channels, d_tot=8.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _loop(fn, args, k=16, reps=3):
    import jax
    import jax.numpy as jnp

    def prog(a0, n):
        def body(i, a):
            outs = fn(a)
            s = sum(jnp.sum(o) for o in outs) * 1e-20
            return a + s

        return jax.lax.fori_loop(0, n, body, a0)

    f1 = jax.jit(lambda a: prog(a, 1))
    fk = jax.jit(lambda a: prog(a, k))

    def best(f):
        jax.block_until_ready(f(args))
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(args))
            b = min(b, time.perf_counter() - t0)
        return b

    return round((best(fk) - best(f1)) / (k - 1) * 1e3, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    side = 192
    N = side * side
    E = 4 * side * (side - 1)
    r, ct, m, dt = 3, 6, 2, 8
    rng = np.random.RandomState(0)
    # base [E, r, 3] varying jacobian stand-in (fed the loop's carry dep)
    Dv = jnp.asarray(rng.randn(E, r, 3).astype(np.float32))
    out = {"E": E, "N": N}

    # incidence table [N, 8] into 2E+1 rows
    inc = rng.randint(0, 2 * E, (N, dt)).astype(np.int32)
    inc_j = jnp.asarray(inc)

    # ---- candidate 1: current form — .at[].add into [E,6,6], reshape, concat
    def cur(D):
        B = {}
        for (oo, oi) in [(0, 0), (0, 3), (3, 0), (3, 3)]:
            Do = D[..., :, :, None]
            Di = D[..., :, None, :]
            B[(oo, oi)] = (Do * Di).sum(-3)  # [E,3,3]
        P = jnp.zeros((E, ct, ct), jnp.float32)
        for (oo, oi), b in B.items():
            P = P.at[:, oo : oo + 3, oi : oi + 3].add(b)
        Pt = jnp.swapaxes(P, -1, -2)
        rows = [
            jnp.concatenate([P.reshape(E, 36), Pt.reshape(E, 36)], -1),
            jnp.concatenate([Pt.reshape(E, 36), P.reshape(E, 36)], -1),
        ]
        W = jnp.concatenate(rows + [jnp.zeros((1, 72), jnp.float32)], 0)
        G = jnp.take(W, inc_j.reshape(-1), axis=0).reshape(N, dt, 72)
        S = G[:, :, :36].sum(1).reshape(N, ct, ct)
        return (S,)

    out["cur_ms"] = _loop(cur, Dv)

    # ---- candidate 2: flat minor — [E,9] blocks, placement matmul, flat S
    # placement matrix: [4*9, 2*36] maps 4 flat blocks to (P | Pt) rows
    M = np.zeros((4 * 9, 72), np.float32)
    for bidx, (oo, oi) in enumerate([(0, 0), (0, 3), (3, 0), (3, 3)]):
        for i in range(3):
            for j in range(3):
                src = bidx * 9 + i * 3 + j
                M[src, (oo + i) * ct + (oi + j)] = 1.0  # P
                M[src, 36 + (oi + j) * ct + (oo + i)] = 1.0  # Pt
    Mj = jnp.asarray(M)
    # second slot-row: (Pt | P) = permute columns of (P | Pt)
    perm = np.concatenate([np.arange(36, 72), np.arange(0, 36)])

    def flat(D):
        Bs = []
        for _ in range(4):
            Do = D[..., :, :, None]
            Di = D[..., :, None, :]
            Bs.append((Do * Di).reshape(E, r, 9).sum(-2))  # [E,9]
        allB = jnp.concatenate(Bs, -1)  # [E,36]
        row0 = allB @ Mj  # [E,72]
        row1 = row0[:, perm]
        W = jnp.concatenate([row0, row1, jnp.zeros((1, 72), jnp.float32)], 0)
        G = jnp.take(W, inc_j.reshape(-1), axis=0).reshape(N, dt, 72)
        S = G[:, :, :36].sum(1)  # [N,36] flat
        return (S,)

    out["flat_ms"] = _loop(flat, Dv)

    # ---- candidate 3: flat via minor-axis at[].add (scatter on static cols)
    def flat_scatter(D):
        P = jnp.zeros((E, 36), jnp.float32)
        for (oo, oi) in [(0, 0), (0, 3), (3, 0), (3, 3)]:
            Do = D[..., :, :, None]
            Di = D[..., :, None, :]
            b = (Do * Di).reshape(E, r, 9).sum(-2)
            cols = jnp.asarray(
                [(oo + i) * ct + (oi + j) for i in range(3) for j in range(3)],
                jnp.int32,
            )
            P = P.at[:, cols].add(b)
        row0 = jnp.concatenate([P, P.reshape(E, 6, 6).swapaxes(1, 2).reshape(E, 36)], -1)
        W = jnp.concatenate([row0, row0[:, perm], jnp.zeros((1, 72), jnp.float32)], 0)
        G = jnp.take(W, inc_j.reshape(-1), axis=0).reshape(N, dt, 72)
        S = G[:, :, :36].sum(1)
        return (S,)

    out["flat_scatter_ms"] = _loop(flat_scatter, Dv)

    # ---- CG-apply consumption: [N,6,6] stored vs [N,36] flat-reshaped
    S66 = jnp.asarray(rng.randn(N, ct, ct).astype(np.float32))
    Sfl = jnp.asarray(rng.randn(N, ct * ct).astype(np.float32))
    pp0 = jnp.asarray(rng.randn(N, ct).astype(np.float32))

    def ap66(pp):
        return (jnp.sum(S66 * pp[:, None, :], -1),)

    def apfl(pp):
        return (jnp.sum(Sfl.reshape(N, ct, ct) * pp[:, None, :], -1),)

    out["apply_S66_ms"] = _loop(ap66, pp0)
    out["apply_Sflat_ms"] = _loop(apfl, pp0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()


def stages():
    import jax
    import jax.numpy as jnp

    side = 192
    N = side * side
    E = 4 * side * (side - 1)
    r, ct, dt = 3, 6, 8
    rng = np.random.RandomState(0)
    Dv = jnp.asarray(rng.randn(E, r, 3).astype(np.float32))
    inc_j = jnp.asarray(rng.randint(0, 2 * E, (N, dt)).astype(np.int32))
    out = {}

    def products(D):
        Bs = []
        for _ in range(4):
            Bs.append((D[..., :, :, None] * D[..., :, None, :]).sum(-3))
        return Bs

    out["s1_products"] = _loop(products, Dv)

    def pbuild(D):
        P = jnp.zeros((E, ct, ct), jnp.float32)
        for (oo, oi) in [(0, 0), (0, 3), (3, 0), (3, 3)]:
            b = (D[..., :, :, None] * D[..., :, None, :]).sum(-3)
            P = P.at[:, oo : oo + 3, oi : oi + 3].add(b)
        return (P,)

    out["s2_pbuild"] = _loop(pbuild, Dv)

    def rows_of(D):
        P = jnp.zeros((E, ct, ct), jnp.float32)
        for (oo, oi) in [(0, 0), (0, 3), (3, 0), (3, 3)]:
            b = (D[..., :, :, None] * D[..., :, None, :]).sum(-3)
            P = P.at[:, oo : oo + 3, oi : oi + 3].add(b)
        Pt = jnp.swapaxes(P, -1, -2)
        rows = [
            jnp.concatenate([P.reshape(E, 36), Pt.reshape(E, 36)], -1),
            jnp.concatenate([Pt.reshape(E, 36), P.reshape(E, 36)], -1),
        ]
        W = jnp.concatenate(rows + [jnp.zeros((1, 72), jnp.float32)], 0)
        return (W,)

    out["s3_rows"] = _loop(rows_of, Dv)

    def wgather(D):
        (W,) = rows_of(D)
        G = jnp.take(W, inc_j.reshape(-1), axis=0).reshape(N, dt, 72)
        return (G,)

    out["s4_gather"] = _loop(wgather, Dv)

    # gather alone on a fixed W (carry-dependent row content)
    W0 = jnp.asarray(rng.randn(2 * E + 1, 72).astype(np.float32))

    def pure_gather(Wc):
        G = jnp.take(Wc, inc_j.reshape(-1), axis=0).reshape(N, dt, 72)
        return (G.sum(1),)

    out["s5_pure_gather"] = _loop(pure_gather, W0)
    print(json.dumps(out))


if __name__ == "__main__" and os.environ.get("STAGES"):
    stages()
