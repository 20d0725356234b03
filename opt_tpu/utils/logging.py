"""Verbosity-gated solver logging (reference: logSolver/logAD/logDebug,
o.t:31-78; verbosity levels documented at Opt.h:16-20).

Level 0: silent. 1: solver progress (cost per nonlinear iteration).
2: compiler/AD detail (term classification, slot tables). 3: debug (device
fetches, HLO dumps on request).
"""

from __future__ import annotations

import sys

_VERBOSITY = 0


def set_verbosity(level: int) -> None:
    global _VERBOSITY
    _VERBOSITY = int(level)


def verbosity() -> int:
    return _VERBOSITY


def log_solver(msg: str, *args) -> None:
    if _VERBOSITY >= 1:
        print(msg % args if args else msg, file=sys.stderr)


def log_ad(msg: str, *args) -> None:
    if _VERBOSITY >= 2:
        print(msg % args if args else msg, file=sys.stderr)


def log_debug(msg: str, *args) -> None:
    if _VERBOSITY >= 3:
        print(msg % args if args else msg, file=sys.stderr)
