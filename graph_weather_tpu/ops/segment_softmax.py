"""Segment softmax: attention over ragged graph neighborhoods.

The TPU-native replacement for PyG TransformerConv's destination-grouped
softmax (used by reference models/gencast/layers/modules.py:256-343) and
DGL's sparse bsddmm/softmax/bspmm pipeline (reference
models/gencast/layers/experimental/sparse_transformer.py): logits live on
edges, normalization groups are receiver segments. Destination-sorted edges
make every reduction a sorted segment op, which XLA lowers without atomics.

All functions accept leading batch dims ([..., E, ...]) with shared edge
indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _seg_reduce(op, edge_vals: jnp.ndarray, receivers: jnp.ndarray, n: int):
    """Reduce over the edge axis (always axis -2 of [..., E, H])."""
    moved = jnp.moveaxis(edge_vals, -2, 0)
    out = op(moved, receivers, num_segments=n, indices_are_sorted=True)
    return jnp.moveaxis(out, 0, -2)


def segment_softmax(
    logits: jnp.ndarray, receivers: jnp.ndarray, n_receivers: int
) -> jnp.ndarray:
    """Numerically stable softmax over receiver segments.

    Args:
        logits: [..., E, H] per-edge, per-head attention logits.
        receivers: [E] sorted destination ids.
        n_receivers: number of destination nodes.

    Returns:
        [..., E, H] normalized attention weights (each receiver's incoming
        edges sum to 1 per head; receivers with no edges contribute nothing).
    """
    seg_max = _seg_reduce(jax.ops.segment_max, logits, receivers, n_receivers)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - jnp.take(seg_max, receivers, axis=-2)
    exp = jnp.exp(shifted)
    seg_sum = _seg_reduce(jax.ops.segment_sum, exp, receivers, n_receivers)
    denom = jnp.take(seg_sum, receivers, axis=-2)
    return exp / jnp.maximum(denom, 1e-16)
