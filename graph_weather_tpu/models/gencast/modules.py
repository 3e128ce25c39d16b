"""GenCast building blocks.

Functional equivalents of reference models/gencast/layers/modules.py:
  * GenCastMLP (:11-67) — hidden_dims-list MLP, activation between layers,
    optional final LayerNorm.
  * InteractionNetwork (:70-157) — directed bipartite MP, add-aggregation,
    message scale factor.
  * FourierEmbedding (:160-197) — sin/cos features of (log-)noise + SiLU MLP.
  * ConditionalLayerNorm (:200-253) — no-affine LayerNorm with scale/bias
    computed as Linears of the conditioning vector.
  * GraphTransformerBlock (:256-343 + PyG TransformerConv) — UniMP-style
    multi-head graph attention with edge features and beta gating, built on
    the framework's segment-softmax kernel instead of PyG gather/scatter.

All modules are batch-aware over [..., N, F] with shared static graphs.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from graph_weather_tpu.nn.graph_blocks import DeviceGraph
from graph_weather_tpu.nn.mlp import TorchLinear
from graph_weather_tpu.ops.segment_softmax import segment_softmax


def cluster_pad_rows(x: jnp.ndarray, graph: DeviceGraph) -> jnp.ndarray:
    """Pad [..., N, F] rows to the clustered layout's nb*block.

    Processors pad ONCE before their transformer stack and slice once after
    (cluster_unpad_rows), so the per-block pad/slice copies inside the
    clustered flash path become free reshapes. Padded receiver rows have
    all-zero mask rows (exact-zero attention output) and padded rows are
    never referenced as senders, so real rows are unaffected.
    """
    if graph.cluster_ids is None:
        return x
    n_pad = graph.cluster_ids.shape[0] * graph.cluster_block
    pad = n_pad - x.shape[-2]
    if pad <= 0:
        return x
    widths = [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)]
    return jnp.pad(x, widths)


def cluster_unpad_rows(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Slice [..., N_pad, F] back to the first n real rows."""
    return x[..., :n, :]


class GenCastMLP(nn.Module):
    """MLP over a hidden_dims list; activation between layers only."""

    hidden_dims: tuple[int, ...]
    activation: Callable = nn.silu
    use_layer_norm: bool = False
    bias: bool = True
    activate_final: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for dim in self.hidden_dims[:-1]:
            x = self.activation(TorchLinear(dim, use_bias=self.bias)(x))
        x = TorchLinear(self.hidden_dims[-1], use_bias=self.bias)(x)
        if self.activate_final:
            x = self.activation(x)
        if self.use_layer_norm:
            x = nn.LayerNorm(epsilon=1e-5)(x).astype(x.dtype)
        return x


class InteractionNetwork(nn.Module):
    """e'_ij = scale * MLP([v_i, v_j, e_ij]); v'_j = MLP([v_j, sum_i e'_ij]).

    Directed source->target flow on a bipartite static graph; edges are not
    updated (GenCast does not need them back).
    """

    hidden_dims: tuple[int, ...]
    activation: Callable = nn.silu
    use_layer_norm: bool = False
    scale_factor: float = 1.0

    @nn.compact
    def __call__(
        self,
        x_src: jnp.ndarray,
        x_dst: jnp.ndarray,
        edge_attr: jnp.ndarray,
        graph: DeviceGraph,
    ) -> jnp.ndarray:
        # Factorized first layer: the [E, 3F] concat never materializes and
        # the node partial products are computed per node (see
        # nn/graph_blocks._GatherSumLinear). Param tree identical to the
        # naive GenCastMLP formulation.
        msg = _FactorizedGenCastMLP(
            self.hidden_dims, self.activation, self.use_layer_norm,
            name="GenCastMLP_0",
        )(
            [
                (x_src, graph.senders, x_src.shape[-1]),
                (x_dst, graph.receivers, x_dst.shape[-1]),
                (edge_attr, None, edge_attr.shape[-1]),
            ]
        )
        msg = msg * self.scale_factor
        agg = graph.aggregate(msg)
        return GenCastMLP(
            self.hidden_dims, self.activation, self.use_layer_norm,
            name="GenCastMLP_1",
        )(jnp.concatenate([x_dst, agg], axis=-1))


class _FactorizedGenCastMLP(nn.Module):
    """GenCastMLP whose first layer is a _GatherSumLinear over parts."""

    hidden_dims: tuple[int, ...]
    activation: Callable = nn.silu
    use_layer_norm: bool = False

    @nn.compact
    def __call__(self, parts) -> jnp.ndarray:
        from graph_weather_tpu.nn.graph_blocks import _GatherSumLinear

        x = _GatherSumLinear(self.hidden_dims[0], name="TorchLinear_0")(parts)
        if len(self.hidden_dims) > 1:
            x = self.activation(x)
        for i, dim in enumerate(self.hidden_dims[1:], start=1):
            x = TorchLinear(dim, name=f"TorchLinear_{i}")(x)
            if i < len(self.hidden_dims) - 1:
                x = self.activation(x)
        if self.use_layer_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="LayerNorm_0")(x).astype(x.dtype)
        return x


class FourierEmbedding(nn.Module):
    """Sinusoidal embedding of a scalar conditioning value + 2-layer SiLU MLP."""

    output_dim: int
    num_frequencies: int = 32
    base_period: int = 16

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        # t: [..., 1]
        freqs = jnp.exp(
            -jnp.log(float(self.base_period))
            * jnp.arange(self.num_frequencies, dtype=jnp.float32)
            / self.num_frequencies
        )
        args = t * freqs
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        emb = nn.silu(TorchLinear(self.output_dim)(emb))
        return TorchLinear(self.output_dim)(emb)


class ConditionalLayerNorm(nn.Module):
    """LayerNorm (no affine) then x * Linear_s(cond) + Linear_b(cond)."""

    features_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        scale = TorchLinear(self.features_dim)(cond)
        bias = TorchLinear(self.features_dim)(cond)
        x_norm = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False)(x)
        return (scale * x_norm + bias).astype(x.dtype)


class GraphTransformerConv(nn.Module):
    """UniMP-style multi-head graph attention (PyG TransformerConv semantics).

    q_i = W_q x_i; k_j = W_k x_j + W_e e_ij; v_j = W_v x_j + W_e e_ij;
    alpha_ij = segment_softmax(q_i . k_j / sqrt(C)); out_i = sum alpha v.
    With beta gating: out = b * W_skip x_i + (1 - b) * out, where
    b = sigmoid(W_beta [skip, out, skip - out]).
    """

    out_channels: int
    num_heads: int
    concat: bool = True
    beta: bool = True
    use_edge_features: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [..., N, F]
        graph: DeviceGraph,
        edge_attr: Optional[jnp.ndarray] = None,  # [..., E, Fe] or [E, Fe]
        kv_source: Optional[jnp.ndarray] = None,  # [..., N_kv, F]
    ) -> jnp.ndarray:
        """kv_source (default x) is the node set keys/values are computed
        from; graph sender ids index into it. Block-sharded processors
        pass the shard-local x for queries/skip and the all-gathered
        global rows as kv_source (parallel/gencast_spatial.py)."""
        h, c = self.num_heads, self.out_channels
        xs = x if kv_source is None else kv_source
        q = TorchLinear(h * c)(x)
        k = TorchLinear(h * c)(xs)
        v = TorchLinear(h * c)(xs)

        if graph.cluster_ids is not None and (
            not self.use_edge_features or edge_attr is None
        ):
            # Clustered (gathered-neighbor) flash path: per receiver block,
            # dense masked attention against its neighbor union — 4x+ less
            # kernel work than banded at production scale (the band window
            # is mostly masked-out; see ops/pallas/clustered_flash.py).
            from graph_weather_tpu.ops.pallas.clustered_flash import (
                clustered_flash_attention,
            )

            def heads4c(t):
                return t.reshape(t.shape[:-1] + (h, c))

            fl = functools.partial(
                clustered_flash_attention,
                gather_ids=graph.cluster_ids,
                masks=graph.cluster_masks,
                block=graph.cluster_block,
                interpret=jax.default_backend() == "cpu",
                # Scatter-free transpose backward: valid only when q and
                # k/v index the same (symmetric-graph) node set — not in
                # the block-sharded kv_source path.
                symmetric=graph.cluster_symmetric and kv_source is None,
            )
            q4, k4, v4 = heads4c(q), heads4c(k), heads4c(v)
            # Batch handled NATIVELY by the kernel (B folded into the
            # block-grid axis); vmap here would trigger the pallas
            # batching rule, which broadcasts the shared mask operand
            # (measured ~2x slower per sample at batch 4).
            lead = q4.shape[:-3]
            if lead:
                q4, k4, v4 = (
                    t.reshape((-1,) + t.shape[-3:]) for t in (q4, k4, v4)
                )
            out = fl(q4, k4, v4)
            if lead:
                out = out.reshape(lead + out.shape[-3:])
            out = out.reshape(out.shape[:-2] + (h * c,))
            return self._combine(x, out, h, c)

        if graph.band_masks is not None and (
            not self.use_edge_features or edge_attr is None
        ):
            # Banded dense path: no gathers, MXU matmuls with adjacency
            # masks (numerically identical to segment softmax; see
            # ops/banded_attention.py).
            from graph_weather_tpu.ops.banded_attention import (
                banded_graph_attention,
            )

            def heads4(t):
                return t.reshape(t.shape[:-1] + (h, c))

            if graph.band_flash:
                from graph_weather_tpu.ops.pallas.banded_flash import (
                    banded_flash_attention,
                )

                fl = functools.partial(
                    banded_flash_attention,
                    band_masks=graph.band_masks,
                    block=graph.band_block,
                    w=graph.band_w,
                    # Tests run on the CPU backend where Mosaic can't
                    # lower; fall back to the Pallas interpreter there.
                    interpret=jax.default_backend() == "cpu",
                )
                q4, k4, v4 = heads4(q), heads4(k), heads4(v)
                for _ in range(q4.ndim - 3):
                    fl = jax.vmap(fl)
                out = fl(q4, k4, v4)
            else:
                out = banded_graph_attention(
                    heads4(q), heads4(k), heads4(v),
                    graph.band_masks, graph.band_block, graph.band_w,
                )
            out = out.reshape(out.shape[:-2] + (h * c,))
            return self._combine(x, out, h, c)

        q_e = jnp.take(q, graph.receivers, axis=-2)
        k_e = jnp.take(k, graph.senders, axis=-2)
        v_e = jnp.take(v, graph.senders, axis=-2)
        if self.use_edge_features and edge_attr is not None:
            e = TorchLinear(h * c, use_bias=False)(edge_attr)
            k_e = k_e + e
            v_e = v_e + e

        def heads(t):
            return t.reshape(t.shape[:-1] + (h, c))

        logits = (heads(q_e) * heads(k_e)).sum(-1) / jnp.sqrt(float(c))  # [..., E, H]
        alpha = segment_softmax(logits, graph.receivers, graph.n_receivers)
        msg = heads(v_e) * alpha[..., None]  # [..., E, H, C]
        msg = msg.reshape(msg.shape[:-2] + (h * c,))
        out = graph.aggregate(msg)  # [..., N, H*C]
        return self._combine(x, out, h, c)

    def _combine(self, x, out, h, c):
        # Helper invoked from the compact __call__; module creation order
        # here is identical on both attention paths, so parameter trees
        # (and thus checkpoints) are interchangeable between them.
        if not self.concat:
            out = out.reshape(out.shape[:-1] + (h, c)).mean(-2)
        final_dim = h * c if self.concat else c
        skip = TorchLinear(final_dim)(x)
        if self.beta:
            gate_in = jnp.concatenate([skip, out, skip - out], axis=-1)
            b = nn.sigmoid(TorchLinear(1, use_bias=False)(gate_in))
            out = b * skip + (1.0 - b) * out
        else:
            out = out + skip
        return out


class CondTransformerBlock(nn.Module):
    """TransformerConv + conditional layer norm + activation.

    Matches reference modules.py:256-343: the norm conditions on the noise
    embedding; the final processor block averages heads and skips the
    activation.
    """

    out_channels: int
    num_heads: int
    concat: bool = True
    beta: bool = True
    use_edge_features: bool = True
    activation: Optional[Callable] = nn.relu

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph: DeviceGraph,
        edge_attr: Optional[jnp.ndarray] = None,
        cond: Optional[jnp.ndarray] = None,
        kv_source: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        x = GraphTransformerConv(
            self.out_channels,
            self.num_heads,
            concat=self.concat,
            beta=self.beta,
            use_edge_features=self.use_edge_features,
        )(x, graph, edge_attr, kv_source=kv_source)
        if cond is not None:
            final_dim = (
                self.num_heads * self.out_channels if self.concat else self.out_channels
            )
            x = ConditionalLayerNorm(final_dim)(x, cond)
        if self.activation is not None:
            x = self.activation(x)
        return x
