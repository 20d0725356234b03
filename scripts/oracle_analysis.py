#!/usr/bin/env python3
"""Analyze Opt-vs-scipy final-cost gaps on the nonconvex examples.

The converged-oracle regression (regression_logs_oracle/) shows tight
agreement on every convex / mildly nonlinear example but gaps on four
nonconvex ones (image_warping, intrinsic, cotangent, shape_from_shading).
The reference's own Ceres comparisons carry the same caveat — different
trust-region paths find different local minima (CombinedSolverBase.h:62-65
compares, it does not assert equality).

This script turns that caveat into evidence, per example:
  1. grad-norm at Opt's solution     — is Opt at a stationary point?
  2. grad-norm at scipy's solution   — is scipy at a stationary point?
  3. Opt(LM) warm-started from scipy's X — the same-objective check. LM's
     trust region never accepts a step that raises the true cost, so if both
     solvers minimize the same energy the warm-started cost CANNOT end above
     scipy's; it stays (or improves). Undamped GN is reported too, but GN
     has no globalization (always accepts X+=delta, exactly like the
     reference, solverGPUGaussNewton.t:552-557+GN-accept) and may leave a
     minimum of a nonlinear energy — that is a property of plain GN, not an
     objective mismatch.
If 1 and 3 hold, both solvers minimize the same energy and the gap is a
basin-of-attraction difference, not a solver bug.

Run: python scripts/oracle_analysis.py [--only name ...]
Writes regression_logs_oracle/ANALYSIS.md.
"""

import argparse
import importlib
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import opt_tpu as ot
from opt_tpu.compile import compile_spec
from opt_tpu.functions import FunctionSet, _mask_rows
from opt_tpu.reference_solver import solve_scipy


def grad_norm(spec_fn, dims, inputs, X):
    """inf-norm of the masked cost gradient at X (0 => stationary)."""
    compiled = compile_spec(spec_fn, dims, jnp.float32)
    unknowns, consts, graphs, params = compiled.normalize_inputs(inputs)
    fs = FunctionSet(compiled, consts, graphs, params)
    Xj = {k: jnp.asarray(v, jnp.float32) for k, v in X.items()}
    _, row_masks = fs.masks(Xj)
    g = jax.grad(fs.cost)(Xj)
    g = _mask_rows(g, row_masks)
    return max(float(jnp.max(jnp.abs(v))) for v in g.values())


def opt_solve(spec_fn, dims, inputs, kind, nl, lin):
    plan = ot.Problem(spec_fn).plan(
        dims=dims, kind=kind, nIterations=nl, lIterations=lin
    )
    res = plan.solve(dict(inputs))
    return float(res.final_cost), {
        k: np.asarray(v) for k, v in res.unknowns.items()
    }


def setup_image_warping():
    mod = importlib.import_module("image_warping")
    mask, cons, ur = mod.load_inputs(small=True)
    s = mod.WarpSolver(mask, cons, ur, {"numIter": 4})
    s.combined_solve_init()
    s.problem_inputs["Constraints"] = s.constraint_image(1.0)
    return s.spec_fn, s.dims, dict(s.problem_inputs)


def setup_intrinsic():
    mod = importlib.import_module("intrinsic_image_decomposition")
    from opt_tpu.utils.io import load_image
    from common import data_path

    p = data_path("cat512.png")
    img = (
        load_image(p)[..., :3]
        if p
        else np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    )
    h, w = img.shape[:2]
    img = img[h // 2 - 32 : h // 2 + 32, w // 2 - 32 : w // 2 + 32]
    s = mod.IntrinsicSolver(img.astype(np.float32), {})
    s.combined_solve_init()
    return s.spec_fn, s.dims, dict(s.problem_inputs)


def setup_cotangent():
    mod = importlib.import_module("cotangent_mesh_smoothing")
    rng = np.random.RandomState(0)
    n = 12
    g = np.stack(np.meshgrid(np.arange(n), np.arange(n), indexing="ij"), -1)
    verts = np.concatenate([g.reshape(-1, 2), rng.rand(n * n, 1)], -1).astype(
        np.float32
    )
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    edges = mod.cotan_hyperedges(verts, np.array(faces, np.int32))
    s = mod.CotangentSolver(verts, edges, {})
    s.combined_solve_init()
    return s.spec_fn, s.dims, dict(s.problem_inputs)


def setup_sfs():
    mod = importlib.import_module("shape_from_shading")
    inputs = mod.load_inputs(small=True)
    s = mod.SFSSolver(inputs, {})
    s.combined_solve_init()
    return s.spec_fn, s.dims, dict(s.problem_inputs)


SETUPS = {
    "image_warping": setup_image_warping,
    "intrinsic_image_decomposition": setup_intrinsic,
    "cotangent_mesh_smoothing": setup_cotangent,
    "shape_from_shading": setup_sfs,
}


def analyze(name, out):
    spec_fn, dims, inputs = SETUPS[name]()
    lines = [f"## {name}", ""]

    cost_g, X_g = opt_solve(spec_fn, dims, inputs, "gaussNewtonGPU", 60, 200)
    cost_l, X_l = opt_solve(spec_fn, dims, inputs, "LMGPU", 60, 200)
    cost_s, X_s = solve_scipy(spec_fn, dims, dict(inputs), max_nfev=400)

    gn_g = grad_norm(spec_fn, dims, inputs, X_g)
    gn_l = grad_norm(spec_fn, dims, inputs, X_l)
    gn_s = grad_norm(spec_fn, dims, inputs, X_s)

    # warm-start at scipy's solution: LM is the same-objective check (its
    # trust region cannot accept a cost increase); GN shows whether plain
    # undamped GN would stay there.
    warm = dict(inputs)
    warm.update(X_s)
    cost_wl, _ = opt_solve(spec_fn, dims, warm, "LMGPU", 10, 100)
    cost_wg, _ = opt_solve(spec_fn, dims, warm, "gaussNewtonGPU", 10, 100)

    lines += [
        f"- Opt(GN) converged: cost {cost_g:.6g}, grad inf-norm {gn_g:.3g}",
        f"- Opt(LM) converged: cost {cost_l:.6g}, grad inf-norm {gn_l:.3g}",
        f"- scipy TRF:         cost {cost_s:.6g}, grad inf-norm {gn_s:.3g}",
        f"- Opt(LM) warm-started at scipy's X: cost {cost_wl:.6g} "
        f"(must stay <= scipy's {cost_s:.6g} if same objective)",
        f"- Opt(GN) warm-started at scipy's X: cost {cost_wg:.6g} "
        f"(undamped GN may oscillate away; informational)",
        "",
    ]
    same_obj = cost_wl <= cost_s * 1.05 + 1e-6
    lm_agrees = cost_l <= cost_s * 1.15 + 1e-6 or abs(
        cost_l - cost_s
    ) <= 0.05 * max(cost_l, cost_s)
    if same_obj and lm_agrees:
        verdict = (
            "same objective confirmed (LM holds scipy's point); Opt(LM) "
            "and scipy agree at convergence — any remaining GN gap is "
            "undamped-GN oscillation, faithful to the reference's "
            "always-accept GN"
        )
    elif same_obj:
        verdict = (
            "same objective confirmed (LM holds scipy's point); LM and "
            "scipy land in different basins of this nonconvex energy — "
            "the reference's Ceres comparisons carry the same caveat"
        )
    else:
        verdict = (
            "warm-started LM LEAVES scipy's point — objectives may "
            "differ; INVESTIGATE"
        )
    lines += [f"**Verdict:** {verdict}.", ""]
    print("\n".join(lines))
    out.extend(lines)
    return same_obj, lm_agrees


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    out = [
        "# Oracle gap analysis — nonconvex examples",
        "",
        "Generated by scripts/oracle_analysis.py. See module docstring for "
        "method.",
        "",
    ]
    ok = True
    for name in args.only or list(SETUPS):
        same_obj, _ = analyze(name, out)
        ok = ok and same_obj
    path = os.path.join(ROOT, "regression_logs_oracle", "ANALYSIS.md")
    text = "\n".join(out) + "\n"
    if args.only and os.path.exists(path):
        # partial rerun: splice the regenerated sections into the existing
        # file instead of clobbering the examples that were not rerun
        import re

        existing = open(path).read()
        for name in args.only:
            pat = rf"## {re.escape(name)}\n.*?(?=\n## |\Z)"
            m_new = re.search(pat, text, re.S)
            if m_new is None:
                continue
            if re.search(pat, existing, re.S):
                existing = re.sub(pat, m_new.group(0), existing, flags=re.S)
            else:
                existing = existing.rstrip() + "\n\n" + m_new.group(0)
        text = existing
    with open(path, "w") as f:
        f.write(text)
    print(f"wrote {path}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
