"""Edge->node aggregation primitives (TPU-native scatter replacement).

TPUs have no fast atomics, so torch_scatter-style scatter_sum (reference
models/layers/graph_net_block.py:188) is replaced by two static-shape
strategies chosen at graph-build time:

  * `segment_sum_agg`: destination-sorted `jax.ops.segment_sum` with
    `indices_are_sorted=True` — a one-pass reduction XLA pipelines well.
    Works for any degree distribution (e.g. grid->mesh graphs where polar
    cells receive hundreds of grid points).
  * `padded_csr_agg`: for bounded-degree graphs (latent mesh: <=7, mesh->
    grid: <=7) a dense [N, K] gather + masked sum, which avoids scatter
    entirely and vectorizes perfectly onto the VPU; its VJP is a plain
    gather because every edge id appears exactly once.

Both are pure functions of static-shape arrays and differentiate cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def segment_sum_agg(
    edge_feats: jnp.ndarray, receivers: jnp.ndarray, n_receivers: int
) -> jnp.ndarray:
    """Sum [..., E, F] edge features into [..., N, F] by sorted receiver id.

    Leading batch dims are supported by transposing the edge axis to the
    front (segment_sum reduces over axis 0).
    """
    if edge_feats.ndim == 2:
        return jax.ops.segment_sum(
            edge_feats, receivers, num_segments=n_receivers, indices_are_sorted=True
        )
    moved = jnp.moveaxis(edge_feats, -2, 0)  # [E, ..., F]
    summed = jax.ops.segment_sum(
        moved, receivers, num_segments=n_receivers, indices_are_sorted=True
    )
    return jnp.moveaxis(summed, 0, -2)


def padded_csr_agg(
    edge_feats: jnp.ndarray, edge_ids: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Sum edge features via a padded CSR table.

    Args:
        edge_feats: [..., E, F].
        edge_ids: [N, K] int32 ids into the edge axis; padded entries may
            point anywhere (masked out).
        mask: [N, K] boolean validity.

    Returns:
        [..., N, F] aggregated features.
    """
    gathered = jnp.take(edge_feats, edge_ids, axis=-2)  # [..., N, K, F]
    return jnp.sum(gathered * mask[..., None].astype(edge_feats.dtype), axis=-2)


def build_padded_csr(receivers: np.ndarray, n_receivers: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-side: padded CSR (edge_ids [N, K], mask [N, K]) from sorted receivers.

    K = max in-degree. Padded ids are 0 (always masked).
    """
    receivers = np.asarray(receivers)
    counts = np.bincount(receivers, minlength=n_receivers)
    k = int(counts.max()) if counts.size else 0
    edge_ids = np.zeros((n_receivers, k), dtype=np.int32)
    # receivers is sorted, so filling valid row-major slots in order assigns
    # each node its contiguous run of edge ids.
    within = np.arange(k)[None, :] < counts[:, None]
    edge_ids[within] = np.arange(receivers.shape[0], dtype=np.int32)
    return edge_ids, within
