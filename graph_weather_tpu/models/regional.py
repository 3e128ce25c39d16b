"""Regional forecaster with movable high-resolution domain.

Equivalent of reference models/regional_forecast.py:16-298: per-region
graphs from DynamicGraphBuilder, a global learnable per-cell embedding
table indexed by the region's cells, encode/process/decode GNN (decoder =
flipped encoder edges), input residual, and an optional boundary-nudging
layer (haversine distance-from-centroid relaxation prior + learned MLP
correction).

Graphs are rebuilt host-side per lat_lons (identity-cached) and the jitted
forward recompiles per distinct topology — batches run fully vectorized
(the reference loops per sample, regional_forecast.py:271-287).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from graph_weather_tpu.meshes.dynamic import DynamicGraphBuilder
from graph_weather_tpu.models.layers import Processor
from graph_weather_tpu.nn.graph_blocks import DeviceGraph, GraphProcessorBlock
from graph_weather_tpu.nn.mlp import MLP


@dataclass
class RegionalForecasterConfig:
    """Mirrors reference models/regional_forecast.py:16-40."""

    resolution: int = 2
    feature_dim: int = 78
    aux_dim: int = 24
    output_dim: Optional[int] = None
    node_dim: int = 256
    edge_dim: int = 256
    num_blocks: int = 9
    hidden_dim_processor_node: int = 256
    hidden_dim_processor_edge: int = 256
    hidden_layers_processor_node: int = 2
    hidden_layers_processor_edge: int = 2
    hidden_dim_decoder: int = 128
    hidden_layers_decoder: int = 2
    norm_type: str = "LayerNorm"
    use_checkpointing: bool = False
    enable_nudging: bool = False
    nudging_hidden_dim: int = 64

    def build(self) -> "RegionalForecaster":
        return RegionalForecaster(self)


class BoundaryNudgingLayer(nn.Module):
    """Blend regional and global predictions by a learned, distance-prior
    weighted alpha (0 at region center, 1 at edges)."""

    feature_dim: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(
        self,
        regional: jnp.ndarray,  # [B, N, F]
        global_context: jnp.ndarray,  # [B, N, F]
        alpha_prior: jnp.ndarray,  # [N, 1] precomputed relaxation weights
    ) -> jnp.ndarray:
        prior = jnp.broadcast_to(
            alpha_prior, (regional.shape[0],) + alpha_prior.shape
        )
        mlp_in = jnp.concatenate([regional, global_context, prior], axis=-1)
        correction = MLP(1, self.hidden_dim, 1, None)(mlp_in)
        alpha = jnp.clip(prior + correction, 0.0, 1.0)
        return (1.0 - alpha) * regional + alpha * global_context


def compute_relaxation_weights(lat_lons) -> np.ndarray:
    """[N, 1] haversine distance from the region centroid, normalized to
    [0, 1] (reference regional_forecast.py:92-130)."""
    ll = np.asarray(lat_lons, dtype=np.float64)
    lats = np.deg2rad(ll[:, 0])
    lons = np.deg2rad(ll[:, 1])
    clat, clon = lats.mean(), lons.mean()
    dlat = lats - clat
    dlon = lons - clon
    a = np.sin(dlat / 2) ** 2 + np.cos(lats) * np.cos(clat) * np.sin(dlon / 2) ** 2
    dist = 2 * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))
    m = dist.max()
    w = dist / m if m > 0 else np.zeros_like(dist)
    return w[:, None].astype(np.float32)


class RegionalModule(nn.Module):
    """Pure flax regional encode-process-decode over dynamic graphs."""

    input_dim: int
    output_dim: int
    node_dim: int
    edge_dim: int
    num_blocks: int
    hidden_dim_processor_node: int
    hidden_dim_processor_edge: int
    hidden_layers_processor_node: int
    hidden_layers_processor_edge: int
    hidden_dim_decoder: int
    hidden_layers_decoder: int
    norm_type: str
    n_global_cells: int
    remat: bool = False
    enable_nudging: bool = False
    nudging_hidden_dim: int = 64

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,  # [B, N_obs, input_dim]
        h3_indices: jnp.ndarray,  # [K] global cell ids of the region
        enc: DeviceGraph,  # obs -> local cells
        dec: DeviceGraph,  # local cells -> obs (flipped encoder edges)
        latent: DeviceGraph,  # local cells
        alpha_prior: Optional[jnp.ndarray] = None,  # [N_obs, 1]
        global_context: Optional[jnp.ndarray] = None,  # [B, N_obs, out]
    ) -> jnp.ndarray:
        batch = features.shape[0]
        n_obs = features.shape[1]

        # Global learnable per-cell embedding table; index the region.
        table = self.param(
            "h3_embeddings",
            nn.initializers.zeros,
            (self.n_global_cells, self.input_dim),
            jnp.float32,
        )
        regional_emb = table[h3_indices]  # [K, input_dim]

        node_encoder = MLP(
            self.node_dim,
            self.hidden_dim_processor_node,
            self.hidden_layers_processor_node,
            self.norm_type,
        )
        x_obs = node_encoder(features)
        x_cells = jnp.broadcast_to(
            node_encoder(regional_emb),
            (batch,) + (regional_emb.shape[0], self.node_dim),
        )

        enc_edge = MLP(
            self.edge_dim,
            self.hidden_dim_processor_edge,
            self.hidden_layers_processor_edge,
            self.norm_type,
        )(enc.edge_attr)
        enc_edge = jnp.broadcast_to(enc_edge, (batch,) + enc_edge.shape)

        x_cells, _ = GraphProcessorBlock(
            self.node_dim,
            self.edge_dim,
            self.hidden_dim_processor_node,
            self.hidden_dim_processor_edge,
            self.hidden_layers_processor_node,
            self.hidden_layers_processor_edge,
            self.norm_type,
        )(x_obs, x_cells, enc_edge, enc)

        latent_edge = MLP(
            self.edge_dim,
            self.hidden_dim_processor_edge,
            self.hidden_layers_processor_edge,
            self.norm_type,
        )(latent.edge_attr)
        x_cells = Processor(
            node_dim=self.node_dim,
            edge_dim=self.edge_dim,
            num_blocks=self.num_blocks,
            hidden_dim_processor_node=self.hidden_dim_processor_node,
            hidden_dim_processor_edge=self.hidden_dim_processor_edge,
            hidden_layers_processor_node=self.hidden_layers_processor_node,
            hidden_layers_processor_edge=self.hidden_layers_processor_edge,
            norm_type=self.norm_type,
            remat=self.remat,
        )(x_cells, latent_edge, latent)

        dec_edge = MLP(
            self.edge_dim,
            self.hidden_dim_processor_edge,
            self.hidden_layers_processor_edge,
            self.norm_type,
        )(dec.edge_attr)
        dec_edge = jnp.broadcast_to(dec_edge, (batch,) + dec_edge.shape)
        x_out = jnp.zeros((batch, n_obs, self.node_dim), dtype=features.dtype)
        x_out, _ = GraphProcessorBlock(
            self.node_dim,
            self.edge_dim,
            self.hidden_dim_processor_node,
            self.hidden_dim_processor_edge,
            self.hidden_layers_processor_node,
            self.hidden_layers_processor_edge,
            self.norm_type,
            dst_is_zero=True,
        )(x_cells, x_out, dec_edge, dec)

        out = MLP(
            self.output_dim,
            self.hidden_dim_decoder,
            self.hidden_layers_decoder,
            self.norm_type,
        )(x_out)
        out = out + features[..., : self.output_dim]

        if self.enable_nudging and global_context is not None:
            out = BoundaryNudgingLayer(self.output_dim, self.nudging_hidden_dim)(
                out, global_context, alpha_prior
            )
        return out


class RegionalForecaster:
    """Handle: builds per-region graphs and runs the jitted module."""

    def __init__(self, config: RegionalForecasterConfig):
        self.config = config
        self.output_dim = (
            config.output_dim if config.output_dim is not None else config.feature_dim
        )
        self.graph_builder = DynamicGraphBuilder(resolution=config.resolution)
        self.module = RegionalModule(
            input_dim=config.feature_dim + config.aux_dim,
            output_dim=self.output_dim,
            node_dim=config.node_dim,
            edge_dim=config.edge_dim,
            num_blocks=config.num_blocks,
            hidden_dim_processor_node=config.hidden_dim_processor_node,
            hidden_dim_processor_edge=config.hidden_dim_processor_edge,
            hidden_layers_processor_node=config.hidden_layers_processor_node,
            hidden_layers_processor_edge=config.hidden_layers_processor_edge,
            hidden_dim_decoder=config.hidden_dim_decoder,
            hidden_layers_decoder=config.hidden_layers_decoder,
            norm_type=config.norm_type,
            n_global_cells=self.graph_builder.mesh.num_cells,
            remat=config.use_checkpointing,
            enable_nudging=config.enable_nudging,
            nudging_hidden_dim=config.nudging_hidden_dim,
        )
        self._jit_apply = None

    def _device_graphs(self, lat_lons):
        enc_b, _, lat_b, h3_indices = self.graph_builder(lat_lons)
        from dataclasses import replace

        # Decoder = flipped encoder edges (reference regional_forecast.py:268).
        dec_b = replace(
            enc_b,
            senders=enc_b.receivers,
            receivers=enc_b.senders,
            n_senders=enc_b.n_receivers,
            n_receivers=enc_b.n_senders,
        ).sorted_by_receiver()
        enc = DeviceGraph.from_bundle(enc_b)
        dec = DeviceGraph.from_bundle(dec_b)
        latent = DeviceGraph.from_bundle(lat_b)
        return enc, dec, latent, jnp.asarray(h3_indices)

    def init(self, rng: jax.Array, lat_lons, batch_size: int = 1):
        enc, dec, latent, h3_idx = self._device_graphs(lat_lons)
        feats = jnp.zeros(
            (batch_size, len(lat_lons), self.config.feature_dim + self.config.aux_dim)
        )
        gctx = (
            jnp.zeros((batch_size, len(lat_lons), self.output_dim))
            if self.config.enable_nudging
            else None
        )
        alpha = (
            jnp.asarray(compute_relaxation_weights(lat_lons))
            if self.config.enable_nudging
            else None
        )
        return jax.jit(
            lambda r, f: self.module.init(
                r, f, h3_idx, enc, dec, latent, alpha, gctx
            )
        )(rng, feats)

    def apply(self, params, features, lat_lons, global_context=None):
        enc, dec, latent, h3_idx = self._device_graphs(lat_lons)
        alpha = (
            jnp.asarray(compute_relaxation_weights(lat_lons))
            if self.config.enable_nudging
            else None
        )
        if self._jit_apply is None:
            self._jit_apply = jax.jit(
                lambda p, f, h, e, d, la, a, g: self.module.apply(
                    p, f, h, e, d, la, a, g
                )
            )
        return self._jit_apply(
            params, features, h3_idx, enc, dec, latent, alpha, global_context
        )

    def __call__(self, params, features, lat_lons, global_context=None):
        return self.apply(params, features, lat_lons, global_context)
