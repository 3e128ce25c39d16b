"""Encode / Process / Decode layers for the GraphWeather (hex-mesh) family.

Functional equivalents of the reference's H3-path layers:
  * Encoder   — reference models/layers/encoder.py:36-268
  * Processor — reference models/layers/processor.py:17-128
  * Decoder / AssimilatorDecoder — reference models/layers/decoder.py:22-94,
    models/layers/assimilator_decoder.py:26-200

Every layer is a flax module over batched [B, N, F] features and static
`DeviceGraph`s built once on the host (see meshes/graphs.py). All bipartite
updates touch destination nodes only; the reference's packed homogeneous
node array with discarded sources is mathematically identical for the nodes
that are kept.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from graph_weather_tpu.nn.graph_blocks import (
    DeviceGraph,
    GraphProcessor,
    GraphProcessorBlock,
)
from graph_weather_tpu.nn.mlp import MLP


class Encoder(nn.Module):
    """Grid -> hex-mesh encoder: node/edge embed + one bipartite MP round.

    The learnable per-cell seed features (`mesh_nodes`, the reference's
    `h3_nodes` parameter, encoder.py:112-114) are encoded by the same node
    MLP as the grid features, then one message-passing round pulls local
    grid information into each cell.

    Returns (mesh_latent [B, N_mesh, node_dim], latent_edge_feats
    [E_latent, edge_dim]) — latent edge features are input-independent, so
    they are computed once, unbatched, and broadcast downstream.
    """

    input_dim: int
    node_dim: int = 256
    edge_dim: int = 256
    hidden_dim_processor_node: int = 256
    hidden_dim_processor_edge: int = 256
    hidden_layers_processor_node: int = 2
    hidden_layers_processor_edge: int = 2
    norm_type: Optional[str] = "LayerNorm"
    n_mesh: int = 5882

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,  # [B, N_grid, input_dim]
        g2m: DeviceGraph,
        latent: DeviceGraph,
        cached: dict | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        batch = features.shape[0]
        cached = cached or {}
        mesh_seed = self.param(
            "mesh_nodes", nn.initializers.zeros, (self.n_mesh, self.input_dim), jnp.float32
        )

        node_encoder = MLP(
            self.node_dim,
            self.hidden_dim_processor_node,
            self.hidden_layers_processor_node,
            self.norm_type,
            name="MLP_0",
        )
        x_grid = node_encoder(features)  # [B, N_grid, node_dim]
        x_mesh = jnp.broadcast_to(
            node_encoder(mesh_seed), (batch, self.n_mesh, self.node_dim)
        )

        # Edge features are input-independent: in inference mode they come
        # precomputed per checkpoint (see GraphWeatherForecaster
        # .precompute_static), skipping three [E, *] MLPs per step.
        edge_feats = cached.get("g2m_edge_feats")
        if edge_feats is None:
            edge_feats = MLP(
                self.edge_dim,
                self.hidden_dim_processor_edge,
                self.hidden_layers_processor_edge,
                self.norm_type,
                name="MLP_1",
            )(g2m.edge_attr)
        edge_feats = jnp.broadcast_to(edge_feats, (batch,) + edge_feats.shape)

        x_mesh, _ = GraphProcessorBlock(
            self.node_dim,
            self.edge_dim,
            self.hidden_dim_processor_node,
            self.hidden_dim_processor_edge,
            self.hidden_layers_processor_node,
            self.hidden_layers_processor_edge,
            self.norm_type,
        )(x_grid, x_mesh, edge_feats, g2m)

        latent_edge_feats = cached.get("latent_edge_feats")
        if latent_edge_feats is None:
            latent_edge_feats = MLP(
                self.edge_dim,
                self.hidden_dim_processor_edge,
                self.hidden_layers_processor_edge,
                self.norm_type,
                name="MLP_2",
            )(latent.edge_attr)
        return x_mesh, latent_edge_feats


class Processor(nn.Module):
    """num_blocks message-passing rounds on the latent hex-mesh graph.

    `use_thermalizer` appends the inference-time diffusion denoise of the
    latent node features after the message-passing rounds (reference
    models/layers/processor.py:30,53; noise from the 'noise' RNG
    collection), with `t` the diffusion timestep.
    """

    node_dim: int = 256
    edge_dim: int = 256
    num_blocks: int = 9
    hidden_dim_processor_node: int = 256
    hidden_dim_processor_edge: int = 256
    hidden_layers_processor_node: int = 2
    hidden_layers_processor_edge: int = 2
    norm_type: Optional[str] = "LayerNorm"
    remat: bool = False
    use_thermalizer: bool = False

    @nn.compact
    def __call__(
        self,
        x_mesh: jnp.ndarray,  # [B, N_mesh, node_dim]
        latent_edge_feats: jnp.ndarray,  # [E, edge_dim] or [B, E, edge_dim]
        latent: DeviceGraph,
        t: int = 0,
    ) -> jnp.ndarray:
        if latent_edge_feats.ndim == 2:
            latent_edge_feats = jnp.broadcast_to(
                latent_edge_feats, (x_mesh.shape[0],) + latent_edge_feats.shape
            )
        x_mesh, _ = GraphProcessor(
            self.num_blocks,
            self.node_dim,
            self.edge_dim,
            self.hidden_dim_processor_node,
            self.hidden_dim_processor_edge,
            self.hidden_layers_processor_node,
            self.hidden_layers_processor_edge,
            self.norm_type,
            remat=self.remat,
        )(x_mesh, latent_edge_feats, latent)
        if self.use_thermalizer:
            from graph_weather_tpu.nn.thermalizer import ThermalizerLayer

            x_mesh = ThermalizerLayer(input_dim=self.node_dim)(x_mesh, t)
        return x_mesh


class Decoder(nn.Module):
    """Hex-mesh -> grid decoder: one bipartite MP round + output MLP.

    Grid destination nodes start as zeros (the reference's non-learnable
    `latlon_nodes`, assimilator_decoder.py:84). The output MLP uses no norm
    (assimilator_decoder.py:122-129). The forecast-style residual
    (`+ start_features`, decoder.py:92-94) is applied by the caller so this
    class also serves the assimilator head.
    """

    output_dim: int
    node_dim: int = 256
    edge_dim: int = 256
    hidden_dim_processor_node: int = 256
    hidden_dim_processor_edge: int = 256
    hidden_layers_processor_node: int = 2
    hidden_layers_processor_edge: int = 2
    norm_type: Optional[str] = "LayerNorm"
    hidden_dim_decoder: int = 128
    hidden_layers_decoder: int = 2

    @nn.compact
    def __call__(
        self,
        x_mesh: jnp.ndarray,  # [B, N_mesh, node_dim]
        m2g: DeviceGraph,
        cached: dict | None = None,
    ) -> jnp.ndarray:
        batch = x_mesh.shape[0]
        n_grid = m2g.n_receivers
        cached = cached or {}

        edge_feats = cached.get("m2g_edge_feats")
        if edge_feats is None:
            edge_feats = MLP(
                self.edge_dim,
                self.hidden_dim_processor_edge,
                2,
                self.norm_type,
                name="MLP_0",
            )(m2g.edge_attr)
        edge_feats = jnp.broadcast_to(edge_feats, (batch,) + edge_feats.shape)

        # Grid seeds are zeros -> dst_is_zero skips their contributions
        # exactly (no [E, H] receiver gather on the largest graph).
        x_grid = jnp.zeros((batch, n_grid, self.node_dim), dtype=x_mesh.dtype)
        x_grid, _ = GraphProcessorBlock(
            self.node_dim,
            self.edge_dim,
            self.hidden_dim_processor_node,
            self.hidden_dim_processor_edge,
            self.hidden_layers_processor_node,
            self.hidden_layers_processor_edge,
            self.norm_type,
            dst_is_zero=True,
        )(x_mesh, x_grid, edge_feats, m2g)

        out = MLP(
            self.output_dim,
            self.hidden_dim_decoder,
            self.hidden_layers_decoder,
            None,  # no norm on the physical-space output
            name="MLP_1",
        )(x_grid)
        return out
