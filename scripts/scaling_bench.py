"""Multi-chip scaling benchmark (BASELINE.json north_star harness).

Measures GN iterations/s and PCG iterations/s for the flagship problems on a
device mesh of each size 1..N and reports strong-scaling efficiency. On real
TPU slices run it as-is; without multi-chip hardware, validate the sharded
program end-to-end on virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/scaling_bench.py --sizes 1,2,4,8 --n 256

(CPU timings say nothing about ICI; the point of the CPU run is that the
sharded solve compiles, executes, and matches the single-device cost. The
same script on a pod slice produces the real scaling table.)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_poisson(mesh, n, n_inner, repeats=3):
    import jax
    import opt_tpu as ot
    from opt_tpu.models.specs import poisson_image_editing

    rng = np.random.RandomState(0)
    f32 = np.float32
    mask = np.ones((n, n), f32)
    mask[n // 8 : -n // 8, n // 8 : -n // 8] = 0.0
    inputs = {
        "X": rng.rand(n, n, 4).astype(f32),
        "T": rng.rand(n, n, 4).astype(f32),
        "M": mask,
    }
    plan = ot.Problem(poisson_image_editing).plan(dims={"W": n, "H": n}, mesh=mesh)
    res = plan.solve(dict(inputs), nIterations=1, lIterations=n_inner)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = plan.solve(dict(inputs), nIterations=1, lIterations=n_inner)
        best = min(best, time.perf_counter() - t0)
    return max(1, res.num_linear_iterations) / best, float(res.final_cost)


def main():
    import jax
    from opt_tpu.parallel.mesh import make_mesh

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--inner", type=int, default=500)
    args = ap.parse_args()

    sizes = [int(s) for s in args.sizes.split(",")]
    devices = jax.devices()
    rows = []
    base_rate = None
    base_cost = None
    for s in sizes:
        if s > len(devices):
            print(f"skip mesh size {s}: only {len(devices)} devices")
            continue
        mesh = make_mesh(devices[:s]) if s > 1 else None
        rate, cost = bench_poisson(mesh, args.n, args.inner)
        if base_rate is None:
            base_rate, base_cost = rate, cost
        eff = rate / (base_rate * s)
        rows.append(
            {
                "devices": s,
                "pcg_iters_per_sec": round(rate, 1),
                "scaling_efficiency": round(eff, 3),
                "final_cost": cost,
            }
        )
        assert abs(cost - base_cost) / max(abs(base_cost), 1e-9) < 1e-3, (
            f"sharded solve diverged from single-device cost: {cost} vs {base_cost}"
        )
        print(json.dumps(rows[-1]))
    print(json.dumps({"scaling": rows}))


if __name__ == "__main__":
    main()
