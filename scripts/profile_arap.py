#!/usr/bin/env python3
"""Phase profile of the ARAP GN step: probes vs coupling assembly vs CG.

Times each assembly stage as its own jitted program on the bench workload
(bench.py bench_arap_graph) so the constant-slot-hoisting work (ROADMAP
item 1, VERDICT r1 item 2) can be measured stage by stage.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def make_inputs(n_side=192):
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


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import opt_tpu as ot
    from opt_tpu.models.specs import arap_mesh_deformation
    from opt_tpu.functions import FunctionSet
    from opt_tpu import assembly

    N, inputs = make_inputs()
    plan = ot.Problem(arap_mesh_deformation).plan(dims={"N": N})
    plan.init(inputs)
    consts, graphs, params = plan._bound
    X = plan._state["X"]
    solver = plan.solver
    c = solver.compiled
    ap = solver._stencil_plan
    print("backend:", jax.default_backend())
    print("plan slots:", ap.needed_slots,
          "const tsids:", sorted(getattr(ap, "const_tsids", [])))

    fs = FunctionSet(c, consts, graphs, params)
    fs.masks(X)
    row_masks = fs.row_masks

    # stage 1: probe evaluation (slot jacobians)
    def probes(X):
        D, moved, _ = assembly._slot_jacobians(
            c, X, consts, graphs, params, ap.needed_slots
        )
        return moved

    print(f"probes (all {len(ap.needed_slots)} slots): "
          f"{timeit(jax.jit(probes), X):7.2f} ms")

    # stage 2: full assemble (probes + B products + grp_exec build)
    def asm(X):
        A, diag, jtf_fn, _ = assembly.assemble(
            c, ap, X, consts, graphs, params, row_masks
        )
        return diag

    print(f"assemble (probes+blocks+gather): {timeit(jax.jit(asm), X):7.2f} ms")

    # stage 3: assemble + 1 apply
    def asm_apply(X, p):
        A, diag, jtf_fn, _ = assembly.assemble(
            c, ap, X, consts, graphs, params, row_masks
        )
        return A(p)

    p = {k: jnp.ones_like(v) for k, v in X.items()}
    print(f"assemble + 1 apply:              "
          f"{timeit(jax.jit(asm_apply), X, p):7.2f} ms")

    # stage 3b: per-step assemble with the hoisted const cache (the cache
    # itself is built outside the timed function, as in _solve_core)
    cache = jax.jit(
        lambda X0: assembly.assemble_const(c, ap, X0, consts, graphs, params)
    )(X)
    jax.block_until_ready(cache)

    def asm_cached(X, p):
        A, diag, jtf_fn, _ = assembly.assemble(
            c, ap, X, consts, graphs, params, row_masks, const_cache=cache
        )
        return A(p)

    print(f"assemble(cache) + 1 apply:       "
          f"{timeit(jax.jit(asm_cached), X, p):7.2f} ms")

    # stage 4: one full GN step via the solver (incl. CG loop + cost)
    sp = dict(plan.solver_params)
    sp["nIterations"] = 1
    sp["lIterations"] = 100
    state = solver.init(X, consts, graphs, params, sp)
    step = lambda st: solver.step(st, consts, graphs, params, sp)
    st = step(state)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        st["n_iter"] = jnp.zeros((), jnp.int32)
        st["done"] = jnp.zeros((), jnp.bool_)
        st = step(st)
    jax.block_until_ready(st)
    print(f"full GN step (step API):         "
          f"{(time.perf_counter() - t0) / n * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
