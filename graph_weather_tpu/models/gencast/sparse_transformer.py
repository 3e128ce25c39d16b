"""Sparse-masked transformer block (the DGL-sparse path, TPU-native).

Equivalent of reference models/gencast/layers/experimental/
sparse_transformer.py:10-153: a pre-norm transformer block whose attention
is masked by the graph adjacency — the reference's dgl.sparse
bsddmm -> sparse softmax -> bspmm pipeline becomes edge-logit einsums +
the framework's segment softmax (identical math: QK^T restricted to
edges, softmax per destination, weighted value sum). No edge features.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from graph_weather_tpu.models.gencast.modules import ConditionalLayerNorm
from graph_weather_tpu.nn.graph_blocks import DeviceGraph
from graph_weather_tpu.nn.mlp import TorchLinear
from graph_weather_tpu.ops.segment_softmax import segment_softmax


class SparseAttention(nn.Module):
    """Multi-head attention restricted to graph edges."""

    output_dim: int = 512
    num_heads: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, graph: DeviceGraph) -> jnp.ndarray:
        if self.output_dim % self.num_heads:
            raise ValueError(
                "Output dimension should be divisible by the number of heads."
            )
        h = self.num_heads
        c = self.output_dim // h
        q = TorchLinear(self.output_dim)(x) * c**-0.5
        k = TorchLinear(self.output_dim)(x)
        v = TorchLinear(self.output_dim)(x)

        def heads(t):
            return t.reshape(t.shape[:-1] + (h, c))

        q_e = heads(jnp.take(q, graph.receivers, axis=-2))
        k_e = heads(jnp.take(k, graph.senders, axis=-2))
        v_e = heads(jnp.take(v, graph.senders, axis=-2))
        logits = (q_e * k_e).sum(-1)  # [..., E, H]
        alpha = segment_softmax(logits, graph.receivers, graph.n_receivers)
        msg = (v_e * alpha[..., None]).reshape(v_e.shape[:-2] + (h * c,))
        out = graph.aggregate(msg)
        return TorchLinear(self.output_dim)(out)


class SparseTransformer(nn.Module):
    """Pre/post-norm conditional transformer block over a sparse mask."""

    output_dim: int
    num_heads: int
    activation: Callable = nn.relu
    norm_first: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph: DeviceGraph,
        cond: jnp.ndarray,
    ) -> jnp.ndarray:
        attn = SparseAttention(self.output_dim, self.num_heads)
        norm1 = ConditionalLayerNorm(self.output_dim)
        norm2 = ConditionalLayerNorm(self.output_dim)

        if self.norm_first:
            x = x + attn(norm1(x, cond), graph)
        else:
            x = norm1(x + attn(x, graph), cond)

        def mlp(t):
            t = self.activation(TorchLinear(self.output_dim)(t))
            return TorchLinear(self.output_dim)(t)

        if self.norm_first:
            x = x + mlp(norm2(x, cond))
        else:
            x = norm2(x + mlp(x), cond)
        return x
