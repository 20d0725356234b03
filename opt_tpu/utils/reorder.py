"""Vertex reordering for graph problems.

The DIA-hybrid cross-coupling apply (ops/graph_ops.dia_split,
docs/PERFORMANCE.md) turns gathers into shifted adds when cross-endpoints
concentrate at a few vertex-id offsets — a property of the NUMBERING, not
the mesh. Meshes loaded from files often come with low-locality numbering;
reverse Cuthill-McKee (RCM) renumbering concentrates neighbors into a
narrow band and recovers most of the DIA coverage.

Usage (before binding the problem):

    perm = rcm_order(v0, v1, N)
    verts, cons = permute_vertices(perm, verts, cons)   # all vertex arrays
    v0, v1 = remap_edges(perm, v0, v1)                  # all edge slots
    ... solve ... results come back in the new order; invert with
    inverse_permutation(perm) if the original order is needed.
"""

from __future__ import annotations

import numpy as np


def rcm_order(v0, v1, num_vertices: int) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of the vertex graph given edge
    endpoint lists. Returns ``perm`` with ``perm[new_id] = old_id``."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    v0 = np.asarray(v0)
    v1 = np.asarray(v1)
    a = coo_matrix(
        (np.ones(len(v0), np.float32), (v0, v1)),
        shape=(num_vertices, num_vertices),
    ).tocsr()
    return np.asarray(
        reverse_cuthill_mckee(a, symmetric_mode=False), dtype=np.int64
    )


def inverse_permutation(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return inv


def permute_vertices(perm: np.ndarray, *arrays):
    """Reorder per-vertex arrays into the new numbering (axis 0)."""
    out = tuple(np.asarray(a)[perm] for a in arrays)
    return out if len(out) != 1 else out[0]


def remap_edges(perm: np.ndarray, *index_arrays):
    """Rewrite edge endpoint indices from old ids to new ids."""
    inv = inverse_permutation(perm)
    out = tuple(inv[np.asarray(i)].astype(np.int32) for i in index_arrays)
    return out if len(out) != 1 else out[0]


def dia_coverage(v0, v1, num_vertices: int, max_offsets: int = 8) -> float:
    """Fraction of cross-coupling incidences the top offsets would cover
    under the current numbering — a quick diagnostic for whether
    renumbering is worthwhile (>=0.5 activates the DIA path)."""
    from ..ops.graph_ops import combined_cross_table, dia_split

    cross = combined_cross_table(
        [np.asarray(v0), np.asarray(v1)], num_vertices
    )
    out = dia_split(cross, num_vertices, max_offsets=max_offsets, min_coverage=0.0)
    if out is None:
        return 0.0
    _offsets, masks, _rp, _rc = out
    valid = int((cross < num_vertices).sum())
    return float(masks.sum()) / max(valid, 1)
