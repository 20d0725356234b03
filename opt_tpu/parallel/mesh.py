"""Multi-chip sharding: device meshes and sharding rules for solver state.

The reference is single-GPU, single-stream (SURVEY.md §2.4) — this module is
new design with no reference counterpart. Strategy (BASELINE.json north_star):

* grid index spaces shard by spatial tiles over a 2-D ('gx','gy') mesh; the
  zero-padded shift ops in ops/shift.py lower to XLA SPMD halo exchanges over
  ICI automatically, so stencil JᵀJp needs no hand-written communication.
* graph index spaces shard hyperedges over the flattened mesh; vertex arrays
  (unknowns) shard by contiguous owner blocks along axis 0, and the ELL/
  incidence tables (problem.Plan._augment_incidence) shard by the same
  blocks — each device owns a vertex range plus the accumulation rows that
  produce it. Cross-endpoint reads in the assembled JᵀJ apply are gathers
  through the ELL vertex table, which XLA SPMD lowers to an all-gather of
  the (small) packed p vector per CG iteration; accumulation itself stays
  local to the owner. Odd sizes fall back to replication (perf, not
  correctness).
* CG dot products / costs are plain jnp.sum — XLA inserts the psum.

Everything runs through ``jax.jit`` with sharding constraints; there is no
shard_map requirement, so single-device plans are the mesh=None special case
of the same code path.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GRID_AXES = ("gx", "gy")


def make_mesh(
    devices=None, shape: Optional[Tuple[int, int]] = None, axis_names=GRID_AXES
) -> Mesh:
    """Build a 2-D tiling mesh over the given (or all) devices.

    shape defaults to the most-square factorization of the device count so
    halo surface is minimized for 2-D grids.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        a = int(np.sqrt(n))
        while n % a:
            a -= 1
        shape = (a, n // a)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


class ShardingRules:
    """Maps problem tensors to NamedShardings over a mesh."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def _spec_for_image(
        self, ispace_ndim: int, shape=None, channels_axis: bool = True
    ) -> P:
        if self.mesh is None:
            return P()
        ax = list(self.mesh.axis_names)
        if ispace_ndim >= 2:
            spec = [ax[0], ax[1]] + [None] * (ispace_ndim - 2)
            # NamedSharding requires dims divisible by their mesh axis; for
            # odd problem sizes replicate along the offending axis instead of
            # failing (perf, not correctness, is at stake).
            if shape is not None:
                for d in (0, 1):
                    axis = spec[d]
                    if axis is not None:
                        size = self.mesh.shape[axis]
                        if shape[d] % size != 0:
                            spec[d] = None
        else:
            # 1-D (graph vertex) spaces: owner-block sharding over the
            # flattened mesh; replicate when the count doesn't divide
            spec = [tuple(ax)] + [None] * (ispace_ndim - 1)
            if shape is not None and shape[0] % self.mesh.size != 0:
                spec[0] = None
        if channels_axis:
            spec = spec + [None]
        return P(*spec)

    def _spec_for_edges(self) -> P:
        if self.mesh is None:
            return P()
        # shard hyperedges over the whole mesh (flattened)
        return P(tuple(self.mesh.axis_names))

    def image_sharding(self, ispace_ndim: int, shape=None) -> Optional[NamedSharding]:
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, self._spec_for_image(ispace_ndim, shape))

    def edge_sharding(self) -> Optional[NamedSharding]:
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, self._spec_for_edges())

    # -- application -------------------------------------------------------
    def place_inputs(self, compiled, unknowns, consts, graphs):
        """device_put inputs with their target shardings (host->device once,
        like the reference's cudaMalloc+memcpy at init, o.t:593-632)."""
        if self.mesh is None:
            return unknowns, consts, graphs
        u2, c2, g2 = {}, {}, {}
        for name, arr in unknowns.items():
            nd = compiled.registry.images[name].ispace.ndim
            u2[name] = jax.device_put(arr, self.image_sharding(nd, arr.shape))
        for name, arr in consts.items():
            nd = compiled.registry.images[name].ispace.ndim
            c2[name] = jax.device_put(arr, self.image_sharding(nd, arr.shape))
        for gname, slots in graphs.items():
            g2[gname] = {}
            for s, i in slots.items():
                if s.startswith("__"):
                    # vertex-shaped incidence/ELL tables ([N, D]) shard by
                    # the same owner blocks as the vertex arrays they
                    # accumulate into; replicate odd counts
                    if i.shape[0] % self.mesh.size == 0:
                        es = NamedSharding(
                            self.mesh, P(tuple(self.mesh.axis_names), None)
                        )
                    else:
                        es = NamedSharding(self.mesh, P())
                else:
                    es = self.edge_sharding()
                    if i.shape[0] % self.mesh.size != 0:
                        es = NamedSharding(self.mesh, P())  # replicate odd counts
                g2[gname][s] = jax.device_put(i, es)
        return u2, c2, g2

    def constrain_unknowns(self, compiled, X: Dict[str, jnp.ndarray]):
        """with_sharding_constraint on the unknown pytree inside jit, so the
        whole solver state inherits tile sharding."""
        if self.mesh is None:
            return X
        out = {}
        for name, arr in X.items():
            nd = compiled.registry.images[name].ispace.ndim
            out[name] = jax.lax.with_sharding_constraint(
                arr, self.image_sharding(nd, arr.shape)
            )
        return out
