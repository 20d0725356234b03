#!/usr/bin/env python3
"""Piecewise TPU timing of the ARAP per-GN-step assembly (current API).

The rig has ~24 ms dispatch latency per program, so each piece is timed
INSIDE one jitted lax.fori_loop: run K iterations with a data dependency
(output folded back into X), and report (t_K - t_1)/(K-1) — pure device
time per iteration of the piece.

  probes     — _slot_jacobians over the varying slots only
  products   — probes + the varying coupling blocks B_all
  step_asm   — full per-step assemble(..., const_cache=cc), Jacobi diag out
  step_jtf   — step_asm + jtf_fn over the residual terms
  residuals  — residual_terms alone
  apply      — one JᵀJ·p (operator rebuilt per outer iter, applied K times)

    python scripts/arap_pieces.py [--cpu] [--side 192] [--k 16]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def _scalar_of(tree):
    import jax.numpy as jnp
    from jax import tree_util

    leaves = [l for l in tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    return sum(jnp.sum(l).astype(jnp.float32) * 1e-20 for l in leaves)


def _loop_time(make_body, X, k, reps=3):
    """Time K dependent iterations of body inside one program; return ms/iter."""
    import jax
    import jax.numpy as jnp

    def prog(X, n):
        def body(i, carry):
            Xc = carry
            s = _scalar_of(make_body(Xc))
            return {u: v + s for u, v in Xc.items()}

        return jax.lax.fori_loop(0, n, body, X)

    f1 = jax.jit(lambda X: prog(X, 1))
    fk = jax.jit(lambda X: prog(X, k))

    def best(f):
        jax.block_until_ready(f(X))
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(X))
            b = min(b, time.perf_counter() - t0)
        return b

    t1, tk = best(f1), best(fk)
    return round((tk - t1) / (k - 1) * 1e3, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--side", type=int, default=192)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--armadillo", action="store_true",
                    help="armadillo31k irregular-mesh fixture")
    ap.add_argument("--pallas", default=None,
                    help="use_pallas_cg override (off/on/interpret)")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from profile_step import _from_bench_arap

    import opt_tpu as ot
    from opt_tpu import assembly
    from opt_tpu.functions import FunctionSet

    if getattr(args, "armadillo", False):
        from profile_step import _from_bench_arap_irregular

        spec, dims, inputs = _from_bench_arap_irregular()
    else:
        spec, dims, inputs = _from_bench_arap(args.side)
    ipkw = (
        {"init_params": ot.InitializationParameters(use_pallas_cg=args.pallas)}
        if args.pallas
        else {}
    )
    plan = ot.Problem(spec).plan(dims=dims, **ipkw)
    u, c, g, p = plan._normalize_and_place(dict(inputs))
    sp = plan.solver._stencil_plan
    fs = FunctionSet(plan.compiled, c, g, p)
    cc = fs.assemble_const(u, sp)  # eager: keeps static ints static
    var_slots = cc["var_slots"]
    out = {"var_slots": var_slots}
    K = args.k

    def probes(X):
        D, moved, base, _pr = assembly._slot_jacobians(
            plan.compiled, X, c, g, p, var_slots
        )
        return moved

    if args.only is None or "probes" in args.only:
        out["probes_ms"] = _loop_time(probes, u, K)

    def products(X):
        D_var, moved, base, _pr = assembly._slot_jacobians(
            plan.compiled, X, c, g, p, var_slots
        )
        D = dict(D_var)
        D.update(cc["D"])
        B = dict(cc["B"])
        outs = []
        for contribs in list(sp.w_spec.values()) + list(sp.g_spec.values()):
            for (t_idx, so, si) in contribs:
                if (t_idx, so, si) not in B:
                    Do = D[(t_idx, so)][..., :, :, None]
                    Di = D[(t_idx, si)][..., :, None, :]
                    B[(t_idx, so, si)] = (Do * Di).sum(-3)
                    outs.append(B[(t_idx, so, si)])
        return outs

    if args.only is None or "products" in args.only:
        out["products_ms"] = _loop_time(products, u, K)

    def step_asm(X):
        _a, diag, _jtf, _m = fs.assemble_stencil(X, sp, const_cache=cc)
        return diag

    if args.only is None or "step_asm" in args.only:
        out["step_asm_ms"] = _loop_time(step_asm, u, K)

    def step_jtf(X):
        _a, diag, jtf_fn, _m = fs.assemble_stencil(X, sp, const_cache=cc)
        r_terms = plan.compiled.residual_terms(X, c, g, p)
        return (diag, jtf_fn(r_terms))

    if args.only is None or "step_jtf" in args.only:
        out["step_jtf_ms"] = _loop_time(step_jtf, u, K)

    def residuals(X):
        return plan.compiled.residual_terms(X, c, g, p)

    if args.only is None or "residuals" in args.only:
        out["residuals_ms"] = _loop_time(residuals, u, K)

    if args.only is None or "apply" in args.only:
        A, diag, jtf_fn, _m = fs.assemble_stencil(u, sp, const_cache=cc)
        out["apply_ms"] = _loop_time(A, u, K)

    if args.only is None or "full_step" in args.only:
        # the solver's REAL per-GN-step body (_gn_step incl. prepare, mask,
        # assembly, JTF, preconditioner, 1 CG iteration, cost), iterated as
        # the fused solve does — the ground truth for the per-step fixed
        # cost that scripts/ab_arap.py reports as per_step_fixed_ms
        import jax

        sol = plan.solver
        spt = sol._traced_sp(
            {
                **plan.solver_params,
                "nIterations": 1 << 30,
                "lIterations": 1,
            }
        )
        cc2 = cc

        def step_body(st):
            fs2 = FunctionSet(plan.compiled, c, g, p)
            return sol._gn_step(st, fs2, spt, cc2)

        st0 = sol._init_state(u, c, g, p, spt)

        def prog(st, n):
            return jax.lax.fori_loop(0, n, lambda i, s: step_body(s), st)

        import time as _t

        f1 = jax.jit(lambda s: prog(s, 1))
        fk = jax.jit(lambda s: prog(s, K))

        def best(f):
            jax.block_until_ready(f(st0))
            b = float("inf")
            for _ in range(3):
                t0 = _t.perf_counter()
                jax.block_until_ready(f(st0))
                b = min(b, _t.perf_counter() - t0)
            return b

        t1, tk = best(f1), best(fk)
        out["full_step_ms"] = round((tk - t1) / (K - 1) * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
