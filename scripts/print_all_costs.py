"""Collect '**Final Costs**' blocks from example logs (the reference's
scripts/print_all_costs.py + extractCosts.py, which grep the blocks printed
by reportFinalCosts, SolverIteration.h:69-86).

Usage: run scripts/regression_tests.py first (writes <example>.log under
--logdir), then:

    python scripts/print_all_costs.py [--logdir regression_logs]
"""

from __future__ import annotations

import argparse
import glob
import os
import re


def extract_costs(text: str):
    """Final-cost lines following the '**Final Costs**' marker."""
    out = []
    lines = text.splitlines()
    for i, line in enumerate(lines):
        if "**Final Costs**" in line:
            for l in lines[i + 1 :]:
                m = re.match(r"\s*(\S+):\s*([-+0-9.eE]+)\s*$", l)
                if not m:
                    break
                out.append((m.group(1), float(m.group(2))))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="regression_logs")
    args = ap.parse_args()
    for path in sorted(glob.glob(os.path.join(args.logdir, "*.log"))):
        name = os.path.splitext(os.path.basename(path))[0]
        print(f"==={name}===")
        print("**Final Costs**")
        with open(path) as f:
            for solver, cost in extract_costs(f.read()):
                print(f"{solver}: {cost}")


if __name__ == "__main__":
    main()
