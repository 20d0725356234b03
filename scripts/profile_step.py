#!/usr/bin/env python3
"""Per-phase GN-step profiler for the flagship workloads.

For each workload reports, per GN step: the fixed cost (assembly + JᵀF +
diag + cost), the marginal CG iteration, and an isolated assembly timing —
the split that drives the remaining perf work (docs/ROADMAP.md). Run on
the rig for TPU numbers; runs on CPU with --cpu for relative checks.

    python scripts/profile_step.py [--cpu] [--only arap sfs] [--scale 0.5]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def _workloads(scale: float):
    n512 = max(32, int(512 * scale))
    n_side = max(16, int(192 * scale))
    return {
        "poisson": lambda: _from_bench_poisson(n512),
        "image_warping": lambda: _from_bench_warp(n512),
        "arap": lambda: _from_bench_arap(n_side),
        "sfs": lambda: _sfs(max(32, int(480 * scale))),
    }


def _from_bench_poisson(n):
    from opt_tpu.models.specs import poisson_image_editing

    rng = np.random.RandomState(0)
    mask = np.ones((n, n), np.float32)
    mask[n // 8 : -n // 8, n // 8 : -n // 8] = 0.0
    return poisson_image_editing, {"W": n, "H": n}, {
        "X": rng.rand(n, n, 4).astype(np.float32),
        "T": rng.rand(n, n, 4).astype(np.float32),
        "M": mask,
    }


def _from_bench_warp(n):
    from opt_tpu.models.specs import image_warping

    rng = np.random.RandomState(0)
    ur = np.stack(
        np.meshgrid(np.arange(n), np.arange(n), indexing="ij"), -1
    ).astype(np.float32)
    con = -np.ones((n, n, 2), np.float32)
    for _ in range(16):
        i, j = rng.randint(0, n, 2)
        con[i, j] = [i + rng.randn() * 3, j + rng.randn() * 3]
    return image_warping, {"W": n, "H": n}, {
        "Offset": ur.copy(),
        "Angle": np.zeros((n, n), np.float32),
        "UrShape": ur,
        "Constraints": con,
        "Mask": np.zeros((n, n), np.float32),
        "w_fitSqrt": np.float32(10.0),
        "w_regSqrt": np.float32(0.1),
    }


def _from_bench_arap(n_side):
    from opt_tpu.models.specs import arap_mesh_deformation

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
    con[-1] = pos[-1] + [10, 0, 5]
    return arap_mesh_deformation, {"N": N}, {
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


def _sfs(n):
    from opt_tpu.models.specs import shape_from_shading

    rng = np.random.RandomState(0)
    depth = (rng.rand(n, n) + 1).astype(np.float32)
    return shape_from_shading, {"W": n, "H": n}, {
        "X": depth + 0.01 * rng.randn(n, n).astype(np.float32),
        "D_i": depth,
        "Im": rng.rand(n, n).astype(np.float32),
        "edgeMaskR": np.ones((n, n), np.float32),
        "edgeMaskC": np.ones((n, n), np.float32),
        "w_p": 1.0, "w_s": 1.0, "w_g": 10.0,
        "f_x": 500.0, "f_y": 500.0, "u_x": n / 2, "u_y": n / 2,
        **{f"L_{i}": (0.5 if i == 1 else 0.1) for i in range(1, 10)},
    }


def profile_one(spec, dims, inputs, n_outer=8, lin=100):
    import jax

    import opt_tpu as ot
    from opt_tpu.functions import FunctionSet

    plan = ot.Problem(spec).plan(dims=dims)

    def timed(lit, reps=3):
        plan.solve(dict(inputs), nIterations=n_outer, lIterations=lit)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            plan.solve(dict(inputs), nIterations=n_outer, lIterations=lit)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tn = timed(lin)
    out = {
        "per_step_fixed_ms": round(t1 / n_outer * 1e3, 3),
        "per_cg_iter_ms": round((tn - t1) / n_outer / max(1, lin - 1) * 1e3, 4),
    }

    # isolated assembly: probe + coefficient-field evaluation + diag/JtF,
    # the reference's per-nonlinear-iteration cost (o.t:2029-2172)
    u, c, g, p = plan._normalize_and_place(dict(inputs))
    sp_plan = plan.solver._stencil_plan
    if sp_plan is not None:
        def asm(X):
            fs = FunctionSet(plan.compiled, c, g, p)
            cc = fs.assemble_const(X, sp_plan)
            _apply, diag, _jtf, _meta = fs.assemble_stencil(X, sp_plan, cc)
            return diag

        jit_asm = jax.jit(asm)
        jax.block_until_ready(jit_asm(u))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jit_asm(u))
            best = min(best, time.perf_counter() - t0)
        out["assembly_only_ms"] = round(best * 1e3, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    ws = _workloads(args.scale)
    report = {}
    for name, make in ws.items():
        if args.only and name not in args.only:
            continue
        spec, dims, inputs = make()
        report[name] = profile_one(spec, dims, inputs)
        print(name, json.dumps(report[name]), flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()


def _from_bench_arap_irregular():
    """armadillo31k fixture with the bench's grid-embed reorder
    (bench.bench_arap_irregular inputs, for arap_pieces --armadillo)."""
    import numpy as np

    from opt_tpu.models.specs import arap_mesh_deformation
    from opt_tpu.utils.reorder import (
        grid_embed_order,
        permute_vertices,
        remap_edges,
    )

    d = np.load(os.path.join(ROOT, "benchdata", "armadillo31k.npz"))
    verts = d["verts"].astype(np.float32)
    v0 = d["v0"].astype(np.int32)
    v1 = d["v1"].astype(np.int32)
    N = verts.shape[0]
    perm = grid_embed_order(v0, v1, N)
    pos = permute_vertices(perm, verts)
    v0r, v1r = remap_edges(perm, v0, v1)
    con = -np.ones((N, 3), np.float32)
    z = pos[:, 2]
    lo = z <= np.quantile(z, 0.01)
    hi = z >= np.quantile(z, 0.99)
    con[lo] = pos[lo]
    con[hi] = pos[hi] + np.array(
        [0.0, 0.0, 0.2 * (z.max() - z.min())], np.float32
    )
    inputs = {
        "Offset": pos.copy(),
        "Angle": np.zeros((N, 3), np.float32),
        "UrShape": pos,
        "Constraints": con,
        "G": {"v0": v0r, "v1": v1r},
        "w_fitSqrt": np.sqrt(1.0).astype(np.float32),
        "w_regSqrt": np.sqrt(0.5).astype(np.float32),
    }
    return arap_mesh_deformation, {"N": N}, inputs
