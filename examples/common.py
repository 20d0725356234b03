"""Shared example-app plumbing: path setup, data discovery, CLI."""

from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# the reference's checked-in example data (read-only mount); every example
# falls back to synthetic data when absent so the scripts run anywhere.
REFERENCE_DATA = "/root/reference/examples/data"


def data_path(name: str):
    p = os.path.join(REFERENCE_DATA, name)
    return p if os.path.exists(p) else None


def example_argparser(description: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--small", action="store_true", help="tiny config for smoke runs")
    ap.add_argument("--perf", action="store_true", help="reference perf-mode iteration counts")
    ap.add_argument(
        "--ceres",
        action="store_true",
        help="also run the independent scipy reference solver (the "
        "reference's USE_CERES comparison; small problems only)",
    )
    ap.add_argument("--results", default="results", help="CSV output directory")
    ap.add_argument(
        "--timing",
        action="store_true",
        help="collectPerKernelTimingInfo: print the per-phase table and "
        "greppable TIMING / Per-iter lines after each solve (util.t:469-508)",
    )
    ap.add_argument(
        "--double",
        action="store_true",
        help="solve in float64 (the reference's OPT_DOUBLE_PRECISION / "
        "doublePrecision init parameter; OptSolver.h:17-36 converts "
        "per-solve). Process-global (jax x64).",
    )
    ap.add_argument(
        "--converged",
        action="store_true",
        help="raise Opt iteration counts so final costs are at convergence "
        "(for oracle comparisons: the scipy reference runs to its own "
        "convergence, so agreement is only meaningful when Opt does too)",
    )
    return ap


def maybe_add_ceres(solver, args, max_nfev: int = 200) -> None:
    """Register the scipy comparison run when --ceres was passed, and apply
    the --timing / --converged / --double flags."""
    if getattr(args, "ceres", False):
        solver.add_scipy_reference_solver(max_nfev=max_nfev)
    solver.collect_timing = getattr(args, "timing", False)
    solver.converged_override = getattr(args, "converged", False)
    solver.double_precision = getattr(args, "double", False)


def setup_backend(args) -> None:
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "double", False):
        import opt_tpu as ot

        ot.enable_double_precision()
