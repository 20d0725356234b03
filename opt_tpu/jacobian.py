"""Sparse Jacobian export (the reference's dumpJ machinery, o.t:2318-2344,
solverGPUGaussNewton.t:252-304 saveJToCRS).

The reference emits all ∂r/∂u per domain element so J can be saved as CSR
(for its optional cusparse path and for debugging). Here the same per-slot
Jacobian fields used by the assembled JᵀJ operator (assembly.py) are exported
as COO triplets without ever materializing a dense matrix:

* centered terms: residual instance (t, q, rch) couples to unknown
  (u, q+s, c) where s is the stencil offset of the slot — valid only when
  q+s stays on the grid (zero-padded shift semantics).
* graph terms: residual instance (t, e, rch) couples to (u, idx_k(e), c) for
  each edge-endpoint slot k.

Rows are ordered per term then element then residual channel (the flattening
the dense test oracles use); columns index the unknown super-vector in
``compiled.unknown_names`` order. Returns numpy arrays — this is a debugging
and verification surface, mirroring the reference's usage.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .assembly import _slot_jacobians


def _unknown_offsets(compiled) -> Tuple[Dict[str, int], int]:
    offsets, total = {}, 0
    for name in compiled.unknown_names:
        offsets[name] = total
        total += int(np.prod(compiled.unknown_shape(name)))
    return offsets, total


def dump_jacobian(compiled, X, consts, graphs, params):
    """COO export of J at linearization point X.

    Returns dict with ``rows``, ``cols``, ``vals`` (numpy, duplicates summed
    by the caller if building CSR), ``shape`` (n_residuals, n_unknowns) and
    ``row_offsets`` per term.
    """
    slot_ids = [
        sid
        for sid in compiled.unknown_slot_ids()
        if any(sid in t.slot_ids for t in compiled.terms)
    ]
    D, _mv, _bo, _pr = _slot_jacobians(compiled, X, consts, graphs, params, slot_ids)
    col_off, n_cols = _unknown_offsets(compiled)

    rows_l, cols_l, vals_l = [], [], []
    row_base = 0
    row_offsets = []
    for t_idx, term in enumerate(compiled.terms):
        kind, dom = term.domain
        if kind == "centered":
            sp = dom.shape(compiled.dim_sizes)
            n_el = int(np.prod(sp))
        else:
            n_el = None  # set from D below
        rch = term.channels
        for sid in slot_ids:
            if sid not in term.slot_ids:
                continue
            s = compiled.registry.slots[sid]
            Dv = np.asarray(D[(t_idx, sid)])  # [*dom, rch, C]
            u_shape = compiled.unknown_shape(s.image)
            C = u_shape[-1]
            if kind == "centered":
                grid = np.stack(
                    np.meshgrid(*[np.arange(n) for n in sp], indexing="ij"), -1
                )  # [*sp, ndim]
                tgt = grid + np.asarray(s.offset)
                valid = np.all((tgt >= 0) & (tgt < np.asarray(sp)), axis=-1)
                flat_sp = np.ravel_multi_index(
                    tuple(np.clip(tgt[..., d], 0, sp[d] - 1) for d in range(len(sp))),
                    sp,
                )  # [*sp]
                for r in range(rch):
                    for c in range(C):
                        v = Dv[..., r, c]
                        nz = (v != 0) & valid
                        q = np.nonzero(nz)
                        rows_l.append(
                            row_base
                            + np.ravel_multi_index(q, sp) * rch
                            + r
                        )
                        cols_l.append(
                            col_off[s.image] + flat_sp[q] * C + c
                        )
                        vals_l.append(v[q])
            else:
                idx = np.asarray(graphs[s.graph][s.key[3]])
                n_el = Dv.shape[0]
                for r in range(rch):
                    for c in range(C):
                        v = Dv[:, r, c]
                        nz = np.nonzero(v != 0)[0]
                        rows_l.append(row_base + nz * rch + r)
                        cols_l.append(col_off[s.image] + idx[nz] * C + c)
                        vals_l.append(v[nz])
        if kind == "graph" and n_el is None:
            # term had no unknown slots (constant residual)
            g = term.domain[1]
            any_slot = next(iter(graphs[g].values()))
            n_el = int(any_slot.shape[0])
        row_offsets.append(row_base)
        row_base += n_el * rch

    rows = np.concatenate(rows_l) if rows_l else np.zeros(0, np.int64)
    cols = np.concatenate(cols_l) if cols_l else np.zeros(0, np.int64)
    vals = np.concatenate(vals_l) if vals_l else np.zeros(0, np.float64)
    return {
        "rows": rows,
        "cols": cols,
        "vals": vals,
        "shape": (row_base, n_cols),
        "row_offsets": row_offsets,
    }


def dump_jacobian_dense(compiled, X, consts, graphs, params) -> np.ndarray:
    """Dense J for small problems (sums duplicate COO entries)."""
    coo = dump_jacobian(compiled, X, consts, graphs, params)
    J = np.zeros(coo["shape"])
    np.add.at(J, (coo["rows"], coo["cols"]), coo["vals"])
    return J
