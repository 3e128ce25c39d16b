"""MeshGraphNet-style message-passing blocks (encode-process-decode family).

One implementation serves every GNN in the framework: blocks operate on
[..., N, F] node / [..., E, F] edge features over a static `DeviceGraph`
shared across all leading batch dims, so the reference's per-batch
edge-index tiling (reference models/layers/encoder.py:210-218) and its
`efficient_batching` Python loop (encoder.py:168-196) both disappear — the
shared static graph gives the memory behavior of the latter with full batch
parallelism.

Semantics match reference models/layers/graph_net_block.py:
  EdgeBlock:  e' = MLP([x_src, x_dst, e]) + e          (:115-137)
  NodeBlock:  x' = MLP([x, sum_{e into x} e']) + x     (:168-193)
Bipartite graphs update destination nodes only — provably equivalent to the
reference's trick of packing [grid; mesh] into one homogeneous node array and
discarding the sources afterwards.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import flax.struct
import jax.numpy as jnp
import numpy as np

from graph_weather_tpu.meshes.graphs import GraphBundle
from graph_weather_tpu.nn.mlp import MLP
from graph_weather_tpu.ops.scatter import (
    build_padded_csr,
    padded_csr_agg,
    segment_sum_agg,
)

# Degree threshold below which the padded-CSR (scatter-free) aggregation is
# used. Latent mesh (<=7) and mesh->grid (<=7) qualify; grid->mesh graphs on
# lat/lon grids have very skewed polar in-degrees and use segment_sum.
_CSR_MAX_DEGREE = 16


@flax.struct.dataclass
class DeviceGraph:
    """A static graph resident on device. Node counts are trace-time static."""

    senders: jnp.ndarray  # [E] int32
    receivers: jnp.ndarray  # [E] int32, non-decreasing
    edge_attr: jnp.ndarray  # [E, D] float32 precomputed features
    csr_edge_ids: Optional[jnp.ndarray]  # [N_dst, K] or None
    csr_mask: Optional[jnp.ndarray]  # [N_dst, K] or None
    n_senders: int = flax.struct.field(pytree_node=False, default=0)
    n_receivers: int = flax.struct.field(pytree_node=False, default=0)

    @classmethod
    def from_bundle(cls, bundle: GraphBundle, use_csr: Optional[bool] = None) -> "DeviceGraph":
        if use_csr is None:
            counts = np.bincount(bundle.receivers, minlength=bundle.n_receivers)
            use_csr = counts.size > 0 and counts.max() <= _CSR_MAX_DEGREE
        csr_ids = csr_mask = None
        if use_csr:
            ids, mask = build_padded_csr(bundle.receivers, bundle.n_receivers)
            csr_ids = jnp.asarray(ids)
            csr_mask = jnp.asarray(mask)
        senders, receivers, edge_attr = bundle.device_arrays()
        return cls(
            senders=senders,
            receivers=receivers,
            edge_attr=edge_attr,
            csr_edge_ids=csr_ids,
            csr_mask=csr_mask,
            n_senders=bundle.n_senders,
            n_receivers=bundle.n_receivers,
        )

    def aggregate(self, edge_feats: jnp.ndarray) -> jnp.ndarray:
        """Sum [E, F] edge features into [N_receivers, F]."""
        if self.csr_edge_ids is not None:
            return padded_csr_agg(edge_feats, self.csr_edge_ids, self.csr_mask)
        return segment_sum_agg(edge_feats, self.receivers, self.n_receivers)


class EdgeBlock(nn.Module):
    """e' = MLP([x_src[s], x_dst[r], e]) + e."""

    edge_dim: int
    hidden_dim: int = 128
    hidden_layers: int = 2
    norm_type: Optional[str] = "LayerNorm"

    @nn.compact
    def __call__(
        self,
        x_src: jnp.ndarray,
        x_dst: jnp.ndarray,
        edge_feats: jnp.ndarray,
        graph: DeviceGraph,
    ) -> jnp.ndarray:
        inputs = jnp.concatenate(
            [
                jnp.take(x_src, graph.senders, axis=-2),
                jnp.take(x_dst, graph.receivers, axis=-2),
                edge_feats,
            ],
            axis=-1,
        )
        out = MLP(
            self.edge_dim, self.hidden_dim, self.hidden_layers, self.norm_type
        )(inputs)
        return out + edge_feats


class NodeBlock(nn.Module):
    """x' = MLP([x, aggregate(e')]) + x."""

    node_dim: int
    hidden_dim: int = 128
    hidden_layers: int = 2
    norm_type: Optional[str] = "LayerNorm"

    @nn.compact
    def __call__(
        self, x_dst: jnp.ndarray, edge_feats: jnp.ndarray, graph: DeviceGraph
    ) -> jnp.ndarray:
        agg = graph.aggregate(edge_feats)
        out = MLP(
            self.node_dim, self.hidden_dim, self.hidden_layers, self.norm_type
        )(jnp.concatenate([x_dst, agg], axis=-1))
        return out + x_dst


class GraphProcessorBlock(nn.Module):
    """One MetaLayer-equivalent round: edge update then node update."""

    node_dim: int
    edge_dim: int
    hidden_dim_node: int = 128
    hidden_dim_edge: int = 128
    hidden_layers_node: int = 2
    hidden_layers_edge: int = 2
    norm_type: Optional[str] = "LayerNorm"

    @nn.compact
    def __call__(
        self,
        x_src: jnp.ndarray,
        x_dst: jnp.ndarray,
        edge_feats: jnp.ndarray,
        graph: DeviceGraph,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        edge_feats = EdgeBlock(
            self.edge_dim, self.hidden_dim_edge, self.hidden_layers_edge, self.norm_type
        )(x_src, x_dst, edge_feats, graph)
        x_dst = NodeBlock(
            self.node_dim, self.hidden_dim_node, self.hidden_layers_node, self.norm_type
        )(x_dst, edge_feats, graph)
        return x_dst, edge_feats


class GraphProcessor(nn.Module):
    """Stack of message-passing rounds on a homogeneous graph.

    `remat` applies per-block rematerialization — the JAX equivalent of the
    reference's per-block torch checkpointing (graph_net_block.py:293-299),
    but as a compiler policy instead of a runtime mechanism.
    """

    num_blocks: int
    node_dim: int
    edge_dim: int
    hidden_dim_node: int = 128
    hidden_dim_edge: int = 128
    hidden_layers_node: int = 2
    hidden_layers_edge: int = 2
    norm_type: Optional[str] = "LayerNorm"
    remat: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, edge_feats: jnp.ndarray, graph: DeviceGraph
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        block_cls = GraphProcessorBlock
        if self.remat:
            block_cls = nn.remat(GraphProcessorBlock, static_argnums=())
        for i in range(self.num_blocks):
            # Explicit name keeps the param tree identical with/without remat
            # (nn.remat would otherwise prefix the auto-name with Checkpoint).
            x, edge_feats = block_cls(
                self.node_dim,
                self.edge_dim,
                self.hidden_dim_node,
                self.hidden_dim_edge,
                self.hidden_layers_node,
                self.hidden_layers_edge,
                self.norm_type,
                name=f"GraphProcessorBlock_{i}",
            )(x, x, edge_feats, graph)
        return x, edge_feats
