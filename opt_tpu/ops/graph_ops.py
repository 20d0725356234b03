"""Hypergraph gather/scatter primitives.

TPU-native replacement for the reference's per-edge CUDA kernels with
``atomicAdd`` scatters into unknown-shaped arrays (reference:
API/src/o.t:558-567 ``atomicAddChannel``; o.t:2092-2126 ``createjtjgraph``).
TPUs have no global-memory atomics exposed at this level; instead an edge-wise
gather is ``jnp.take`` and the scatter-add is ``jax.ops.segment_sum``-style
``.at[].add`` which XLA lowers to an efficient sorted scatter. Under autodiff,
``take``'s transpose is exactly the scatter-add, so JᵀF / JᵀJp scatters come
out of ``jax.vjp``/``jax.linear_transpose`` for free.
"""

from __future__ import annotations

import jax.numpy as jnp


def edge_gather(img: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-vertex values at edge endpoints: out[e] = img[idx[e]].

    ``img``: [N, C] vertex array (1-d index space only, like the reference's
    graph vertex slots — o.t:818-834). ``idx``: [E] int32.
    """
    return jnp.take(img, idx, axis=0)


def edge_scatter_add(
    values: jnp.ndarray, idx: jnp.ndarray, num_vertices: int
) -> jnp.ndarray:
    """Scatter-add per-edge values into a [num_vertices, C] vertex array."""
    out = jnp.zeros((num_vertices,) + values.shape[1:], values.dtype)
    return out.at[idx].add(values)
