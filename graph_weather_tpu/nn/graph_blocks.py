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
    """A static graph resident on device. Node counts are trace-time static.

    band_* fields (optional) carry the banded-attention layout for
    spatially-sorted homogeneous graphs (see ops/banded_attention.py).
    """

    senders: jnp.ndarray  # [E] int32
    receivers: jnp.ndarray  # [E] int32, non-decreasing
    edge_attr: jnp.ndarray  # [E, D] float32 precomputed features
    csr_edge_ids: Optional[jnp.ndarray]  # [N_dst, K] or None
    csr_mask: Optional[jnp.ndarray]  # [N_dst, K] or None
    band_masks: Optional[jnp.ndarray] = None  # [nb, block, block+2w] or None
    cluster_ids: Optional[jnp.ndarray] = None  # [nb, U_pad] or None
    cluster_masks: Optional[jnp.ndarray] = None  # [nb, block, U_pad] or None
    n_senders: int = flax.struct.field(pytree_node=False, default=0)
    n_receivers: int = flax.struct.field(pytree_node=False, default=0)
    band_block: int = flax.struct.field(pytree_node=False, default=0)
    band_w: int = flax.struct.field(pytree_node=False, default=0)
    band_flash: bool = flax.struct.field(pytree_node=False, default=False)
    cluster_block: int = flax.struct.field(pytree_node=False, default=0)
    cluster_symmetric: bool = flax.struct.field(pytree_node=False, default=False)

    @classmethod
    def from_bundle(
        cls,
        bundle: GraphBundle,
        use_csr: Optional[bool] = None,
        banded: bool = False,
        band_block: int = 512,
        band_flash: bool = False,
        clustered: bool = False,
        # 256-receiver blocks measured ~20% faster than 512 at GenCast
        # splits-6 scale: the k-hop dilation halo is fixed (~6 rings), so
        # smaller patches waste fewer (receiver, key) pairs on the union
        # padding — 42M vs 64M pairs — at a modest gather-row increase.
        cluster_block: int = 256,
    ) -> "DeviceGraph":
        if use_csr is None:
            counts = np.bincount(bundle.receivers, minlength=bundle.n_receivers)
            use_csr = counts.size > 0 and counts.max() <= _CSR_MAX_DEGREE
        csr_ids = csr_mask = None
        if use_csr:
            ids, mask = build_padded_csr(bundle.receivers, bundle.n_receivers)
            csr_ids = jnp.asarray(ids)
            csr_mask = jnp.asarray(mask)
        band_masks = None
        band_w = 0
        if banded:
            from graph_weather_tpu.ops.banded_attention import build_band_masks

            span = int(
                np.abs(
                    bundle.senders.astype(np.int64)
                    - bundle.receivers.astype(np.int64)
                ).max()
            )
            # Round up so the flash kernel's key tiling divides the window
            # (2w % 512 == 0); also a lane multiple for the XLA path. The
            # flash BACKWARD kernel's dk/dv index maps additionally need
            # w itself to be a whole number of 512-row key tiles.
            round_to = 512 if band_flash else 256
            band_w = -(-span // round_to) * round_to
            band_masks = jnp.asarray(
                build_band_masks(
                    bundle.senders, bundle.receivers, bundle.n_receivers,
                    block=band_block, w=band_w,
                )
            )
        cluster_ids = cluster_masks = None
        cluster_symmetric = False
        if clustered:
            from graph_weather_tpu.meshes.clustering import (
                build_cluster_layout,
                is_symmetric_edges,
            )

            layout = build_cluster_layout(
                bundle.senders, bundle.receivers,
                bundle.n_receivers, bundle.n_senders, block=cluster_block,
            )
            cluster_ids = jnp.asarray(layout.gather_ids)
            # int8 at build time: the flash kernels consume int8 tiles, and
            # casting the [nb, block, U_pad] mask (64 MB at splits 6) per
            # attention call costs ~0.16 ms x num_blocks per forward.
            cluster_masks = jnp.asarray(layout.masks.astype(np.int8))
            # Symmetric edge lists (k-hop mesh graphs) qualify for the
            # scatter-free transpose backward (clustered_flash.py).
            cluster_symmetric = bundle.n_senders == bundle.n_receivers and (
                is_symmetric_edges(bundle.senders, bundle.receivers)
            )
        senders, receivers, edge_attr = bundle.device_arrays()
        return cls(
            senders=senders,
            receivers=receivers,
            edge_attr=edge_attr,
            csr_edge_ids=csr_ids,
            csr_mask=csr_mask,
            band_masks=band_masks,
            cluster_ids=cluster_ids,
            cluster_masks=cluster_masks,
            n_senders=bundle.n_senders,
            n_receivers=bundle.n_receivers,
            band_block=band_block if banded else 0,
            band_w=band_w,
            band_flash=banded and band_flash,
            cluster_block=cluster_block if clustered else 0,
            cluster_symmetric=cluster_symmetric,
        )

    def aggregate(self, edge_feats: jnp.ndarray) -> jnp.ndarray:
        """Sum [E, F] edge features into [N_receivers, F]."""
        if self.csr_edge_ids is not None:
            return padded_csr_agg(edge_feats, self.csr_edge_ids, self.csr_mask)
        return segment_sum_agg(edge_feats, self.receivers, self.n_receivers)


class EdgeBlock(nn.Module):
    """e' = MLP([x_src[s], x_dst[r], e]) + e.

    The first MLP layer is computed FACTORIZED:
        [s, d, e] @ W == s @ W_s + d @ W_d + e @ W_e
    with the node partial products done per NODE before gathering, so the
    [E, 3F] concatenation never materializes in HBM and the per-edge part of
    the layer-1 matmul shrinks from E(3F)H to E F H flops. Mathematically
    identical (same parameters, same result up to f32 summation order); this
    is the main HBM-traffic optimization of the message-passing hot loop.
    """

    edge_dim: int
    hidden_dim: int = 128
    hidden_layers: int = 2
    norm_type: Optional[str] = "LayerNorm"
    dst_is_zero: bool = False

    @nn.compact
    def __call__(
        self,
        x_src: jnp.ndarray,
        x_dst: jnp.ndarray,
        edge_feats: jnp.ndarray,
        graph: DeviceGraph,
    ) -> jnp.ndarray:
        out = _FactorizedPartsMLP(
            self.edge_dim, self.hidden_dim, self.hidden_layers, self.norm_type,
            name="MLP_0",
        )(
            [
                (x_src, graph.senders, x_src.shape[-1]),
                (
                    None if self.dst_is_zero else x_dst,
                    graph.receivers,
                    x_dst.shape[-1],
                ),
                (edge_feats, None, edge_feats.shape[-1]),
            ]
        )
        return out + edge_feats


class _GatherSumLinear(nn.Module):
    """One Linear over virtually-concatenated inputs, computed factorized.

    y = concat(parts) @ W + b  ==  sum_i (parts_i @ W_i)[gather_i] + b
    where node-indexed parts are matmul'd per NODE before gathering to
    edges. Stores ONE fused kernel with torch-Linear init (identical param
    to TorchLinear over the concatenation).
    """

    features: int

    @nn.compact
    def __call__(self, parts) -> jnp.ndarray:
        """parts: sequence of (tensor_or_None, gather_index_or_None, width).

        A None tensor skips its slice of the kernel entirely — exact when
        that input is known to be all-zeros (e.g. the decoder's grid seed
        nodes) — while the parameter layout stays that of the full
        concatenation.
        """
        import jax

        from graph_weather_tpu.nn.mlp import torch_linear_kernel_init

        fan_in = sum(width for _, _, width in parts)
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (fan_in, self.features), jnp.float32
        )
        bound = 1.0 / (fan_in**0.5)

        def bias_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        bias = self.param("bias", bias_init, (self.features,), jnp.float32)

        y = None
        offset = 0
        for tensor, idx, width in parts:
            if tensor is None:
                offset += width
                continue
            w = jax.lax.slice_in_dim(kernel, offset, offset + width, axis=0)
            offset += width
            t = tensor @ w.astype(tensor.dtype)
            if idx is not None:
                t = jnp.take(t, idx, axis=-2)
            y = t if y is None else y + t
        return y + bias.astype(y.dtype)


def _norm_module(norm_type):
    if norm_type == "LayerNorm":
        return nn.LayerNorm(epsilon=1e-5, name="LayerNorm_0")
    if norm_type == "RMSNorm":
        return nn.RMSNorm(epsilon=1e-5, name="RMSNorm_0")
    if norm_type == "GraphNorm":
        from graph_weather_tpu.nn.mlp import _GraphNorm

        return _GraphNorm(name="_GraphNorm_0")
    if norm_type in (None, "none"):
        return None
    raise ValueError(f"Unsupported norm_type: {norm_type}")


class _FactorizedPartsMLP(nn.Module):
    """MLP over virtually-concatenated parts via _GatherSumLinear.

    Parameter tree is identical to `MLP` (TorchLinear_0..k + norm), so
    checkpoints are interchangeable with the naive concatenation form.
    """

    out_dim: int
    hidden_dim: int
    hidden_layers: int
    norm_type: Optional[str]

    @nn.compact
    def __call__(self, parts) -> jnp.ndarray:
        from graph_weather_tpu.nn.mlp import TorchLinear

        h = _GatherSumLinear(self.hidden_dim, name="TorchLinear_0")(parts)
        h = nn.relu(h)
        for i in range(1, self.hidden_layers):
            h = nn.relu(TorchLinear(self.hidden_dim, name=f"TorchLinear_{i}")(h))
        h = TorchLinear(self.out_dim, name=f"TorchLinear_{self.hidden_layers}")(h)
        norm = _norm_module(self.norm_type)
        if norm is not None:
            h = norm(h).astype(h.dtype)
        return h


class NodeBlock(nn.Module):
    """x' = MLP([x, aggregate(e')]) + x.

    Factorized first layer (concat never materializes); with dst_is_zero
    the x contribution and the residual drop out exactly.

    A precomputed `agg` may be passed instead of aggregating in-block —
    used by the spatially-sharded forward, whose edge shards must psum
    their partial aggregates across devices before the node update
    (parallel/forecaster.py).
    """

    node_dim: int
    hidden_dim: int = 128
    hidden_layers: int = 2
    norm_type: Optional[str] = "LayerNorm"
    dst_is_zero: bool = False

    @nn.compact
    def __call__(
        self,
        x_dst: jnp.ndarray,
        edge_feats: jnp.ndarray,
        graph: DeviceGraph,
        agg: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if agg is None:
            agg = graph.aggregate(edge_feats)
        h = _FactorizedPartsMLP(
            self.node_dim, self.hidden_dim, self.hidden_layers, self.norm_type,
            name="MLP_0",
        )(
            [
                (None if self.dst_is_zero else x_dst, None, x_dst.shape[-1]),
                (agg, None, agg.shape[-1]),
            ]
        )
        return h if self.dst_is_zero else h + x_dst


class GraphProcessorBlock(nn.Module):
    """One MetaLayer-equivalent round: edge update then node update.

    dst_is_zero marks that x_dst is known to be all-zeros (e.g. the
    decoder's grid seed nodes, reference assimilator_decoder.py:84): the
    zero contributions are then skipped EXACTLY — same parameters, same
    result, less gather/matmul traffic on the largest bipartite graph.
    """

    node_dim: int
    edge_dim: int
    hidden_dim_node: int = 128
    hidden_dim_edge: int = 128
    hidden_layers_node: int = 2
    hidden_layers_edge: int = 2
    norm_type: Optional[str] = "LayerNorm"
    dst_is_zero: bool = False

    @nn.compact
    def __call__(
        self,
        x_src: jnp.ndarray,
        x_dst: jnp.ndarray,
        edge_feats: jnp.ndarray,
        graph: DeviceGraph,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        edge_feats = EdgeBlock(
            self.edge_dim, self.hidden_dim_edge, self.hidden_layers_edge,
            self.norm_type, dst_is_zero=self.dst_is_zero,
        )(x_src, x_dst, edge_feats, graph)
        x_dst = NodeBlock(
            self.node_dim, self.hidden_dim_node, self.hidden_layers_node,
            self.norm_type, dst_is_zero=self.dst_is_zero,
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
