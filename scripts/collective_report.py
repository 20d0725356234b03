#!/usr/bin/env python3
"""Static collective-volume report for sharded solve programs.

Compiles the fused solve for the flagship grid and graph workloads over a
virtual device mesh and tallies every communication op in the optimized
HLO — the evidence that the sharded design's collective volume scales with
partition BOUNDARY size, not problem size (BASELINE.json north_star; no
reference counterpart, the reference is single-GPU):

* grid: stencil reads lower to collective-permutes of tile edges; CG
  scalars to all-reduce; no all-gathers at all.
* graph: the CG-loop cross-endpoint p reads, the per-GN-step
  assembly/JᵀF gathers AND the residual/probe vertex-array reads all
  ride boundary/alignment-sized all_to_alls (parallel/mesh.py
  halo_gather_parts / slot_halo_gather) — the compiled graph solve
  contains no all-gather at all.

Static counts/bytes describe the program text (a while-body collective is
counted once, executed per iteration). Run on CPU:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/collective_report.py
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}
_COLLECTIVES = ("all-gather", "all-to-all", "all-reduce", "collective-permute",
                "reduce-scatter")


def _shape_bytes(shape_txt: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_txt)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def collective_table(hlo: str):
    out = {}
    for line in hlo.splitlines():
        if "=" not in line or "get-tuple-element" in line:
            continue
        lhs, _, rhs = line.partition("=")
        for kind in _COLLECTIVES:
            # result-producing ops only: "%name = TYPE kind(..."; result
            # TYPE may be a tuple with /*index=k*/ comments. The "-start"
            # async form carries the payload; "-done" repeats the shape.
            m = re.search(r"\b" + kind + r"(?:-start)?\(", rhs)
            if m is None or f"{kind}-done" in rhs:
                continue
            shapes = re.findall(r"\w+\[[\d,]*\]", rhs[: m.start()])
            b = sum(_shape_bytes(s) for s in shapes)
            cnt, tot = out.get(kind, (0, 0))
            out[kind] = (cnt + 1, tot + b)
    return out


def _poisson_hlo(n: int, mesh):
    import numpy as np
    import opt_tpu as ot
    from opt_tpu.models.specs import poisson_image_editing

    rng = np.random.RandomState(0)
    mask = np.ones((n, n), np.float32)
    mask[n // 8: -n // 8, n // 8: -n // 8] = 0.0
    inputs = {
        "X": rng.rand(n, n, 4).astype(np.float32),
        "T": rng.rand(n, n, 4).astype(np.float32),
        "M": mask,
    }
    plan = ot.Problem(poisson_image_editing).plan(
        dims={"W": n, "H": n}, mesh=mesh
    )
    return plan.dump_hlo(inputs, nIterations=1, lIterations=20)


def _arap_hlo(n_side: int, mesh, shuffle: bool = True, owner_sort: bool = False):
    import numpy as np
    import opt_tpu as ot
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
    con[-1] = pos[-1] + [3, 0, 2]
    # shuffled vertex ids exercise the irregular (non-DIA) exchange as the
    # hot path — the adversarial case where the boundary is O(N); with the
    # natural (local) ordering most incidences ride DIA shifts and the
    # exchanged remainder is the true partition boundary
    rng = np.random.RandomState(5)
    perm = (
        rng.permutation(N) if shuffle else np.arange(N)
    ).astype(np.int32)
    inv = np.argsort(perm).astype(np.int32)
    inputs = {
        "Offset": pos[inv].copy(), "Angle": np.zeros((N, 3), np.float32),
        "UrShape": pos[inv], "Constraints": con[inv],
        "G": {"v0": perm[np.concatenate([v0, v1]).astype(np.int32)],
              "v1": perm[np.concatenate([v1, v0]).astype(np.int32)]},
        "w_fitSqrt": np.float32(1.0),
        "w_regSqrt": np.float32(np.sqrt(0.5)),
    }
    ip = (
        ot.InitializationParameters(edge_reorder="owner")
        if owner_sort
        else None
    )
    plan = ot.Problem(arap_mesh_deformation).plan(
        dims={"N": N}, mesh=mesh, init_params=ip
    )
    return plan.dump_hlo(inputs, nIterations=3, lIterations=20)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid-sizes", default="64,128")
    ap.add_argument("--graph-sides", default="16,32")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from opt_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    report = {}
    for n in [int(s) for s in args.grid_sizes.split(",")]:
        t = collective_table(_poisson_hlo(n, mesh))
        report[f"poisson_{n}x{n}"] = {
            k: {"ops": c, "bytes": b} for k, (c, b) in sorted(t.items())
        }
        print(f"poisson {n}x{n}:", json.dumps(report[f"poisson_{n}x{n}"]),
              flush=True)
    for s in [int(s) for s in args.graph_sides.split(",")]:
        for shuffle, owner_sort, tag in (
            (False, False, "local"),
            (True, False, "shuffled"),
            (True, True, "shuffled_ownersort"),
        ):
            t = collective_table(
                _arap_hlo(s, mesh, shuffle=shuffle, owner_sort=owner_sort)
            )
            key = f"arap_{s * s}v_{tag}"
            report[key] = {
                k: {"ops": c, "bytes": b} for k, (c, b) in sorted(t.items())
            }
            print(f"arap {s * s}v {tag}:", json.dumps(report[key]),
                  flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
