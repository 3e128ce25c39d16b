"""GenCast encoder / processor / decoder.

Equivalents of reference models/gencast/layers/{encoder,processor,decoder}.py
on the framework's static graphs and segment-softmax attention. Data layout
is [B, N, F] with shared graphs (no disconnected-copy batching, cf.
reference models/gencast/utils/batching.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from graph_weather_tpu.models.gencast.modules import (
    CondTransformerBlock,
    FourierEmbedding,
    GenCastMLP,
    InteractionNetwork,
    cluster_pad_rows,
    cluster_unpad_rows,
)
from graph_weather_tpu.nn.graph_blocks import DeviceGraph


class GenCastEncoder(nn.Module):
    """Embed grid/mesh/edge features, one g2m interaction step + residuals.

    Reference models/gencast/layers/encoder.py:14-133.
    """

    hidden_dims: tuple[int, ...]
    activation: Callable = nn.silu
    use_layer_norm: bool = True
    scale_factor: float = 1.0

    @nn.compact
    def __call__(
        self,
        grid_nodes: jnp.ndarray,  # [B, N_grid, grid_dim]
        mesh_nodes: jnp.ndarray,  # [N_mesh, mesh_dim] or [B, N_mesh, mesh_dim]
        g2m: DeviceGraph,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        batch = grid_nodes.shape[0]
        grid_emb = GenCastMLP(self.hidden_dims, self.activation, self.use_layer_norm)(
            grid_nodes
        )
        mesh_emb = GenCastMLP(self.hidden_dims, self.activation, self.use_layer_norm)(
            mesh_nodes
        )
        if mesh_emb.ndim == 2:
            mesh_emb = jnp.broadcast_to(mesh_emb, (batch,) + mesh_emb.shape)
        edges_emb = GenCastMLP(self.hidden_dims, self.activation, self.use_layer_norm)(
            g2m.edge_attr
        )
        edges_emb = jnp.broadcast_to(edges_emb, (batch,) + edges_emb.shape)

        latent_mesh = mesh_emb + InteractionNetwork(
            self.hidden_dims,
            self.activation,
            self.use_layer_norm,
            scale_factor=self.scale_factor,
        )(grid_emb, mesh_emb, edges_emb, g2m)

        latent_grid = grid_emb + GenCastMLP(
            self.hidden_dims, self.activation, self.use_layer_norm
        )(grid_emb)
        return latent_grid, latent_mesh


class GenCastProcessor(nn.Module):
    """num_blocks noise-conditioned transformer blocks on the k-hop mesh.

    Reference models/gencast/layers/processor.py:20-190: all blocks
    concatenate heads except the last, which averages them and drops the
    activation.
    """

    latent_dim: int
    hidden_dims: tuple[int, ...]
    num_blocks: int = 16
    num_heads: int = 4
    num_frequencies: int = 32
    base_period: int = 16
    noise_emb_dim: int = 16
    use_edge_features: bool = True
    activation: Callable = nn.silu
    use_layer_norm: bool = True
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latent_mesh: jnp.ndarray,  # [B, N_mesh, latent]
        noise_levels: jnp.ndarray,  # [B, 1] (log-scaled)
        khop: DeviceGraph,
    ) -> jnp.ndarray:
        if self.latent_dim % self.num_heads != 0:
            raise ValueError("latent_dim must be divisible by num_heads")
        cond = FourierEmbedding(
            self.noise_emb_dim, self.num_frequencies, self.base_period
        )(noise_levels)  # [B, emb]
        cond = cond[:, None, :]  # broadcast over nodes

        edge_attr = None
        if self.use_edge_features and khop.edge_attr.shape[-1] > 0:
            edge_attr = GenCastMLP(
                self.hidden_dims, self.activation, self.use_layer_norm
            )(khop.edge_attr)

        # Keep rows padded to the clustered layout across ALL blocks: one
        # pad here + one slice at the end instead of a pad/slice pair per
        # attention call (the pair costs ~2x42 MB of HBM copies per block
        # at splits 6). No-op for non-clustered layouts.
        n_real = latent_mesh.shape[-2]
        latent_mesh = cluster_pad_rows(latent_mesh, khop)

        block_cls = CondTransformerBlock
        if self.remat:
            block_cls = nn.remat(CondTransformerBlock, static_argnums=())
        for i in range(self.num_blocks - 1):
            latent_mesh = block_cls(
                out_channels=self.latent_dim // self.num_heads,
                num_heads=self.num_heads,
                concat=True,
                beta=True,
                use_edge_features=edge_attr is not None,
                activation=self.activation,
                name=f"CondTransformerBlock_{i}",
            )(latent_mesh, khop, edge_attr, cond)
        latent_mesh = block_cls(
            out_channels=self.latent_dim,
            num_heads=self.num_heads,
            concat=False,
            beta=True,
            use_edge_features=edge_attr is not None,
            activation=None,
            name=f"CondTransformerBlock_{self.num_blocks - 1}",
        )(latent_mesh, khop, edge_attr, cond)
        return cluster_unpad_rows(latent_mesh, n_real)


class GenCastDecoder(nn.Module):
    """One m2g interaction step + residual, then the output MLP.

    Reference models/gencast/layers/decoder.py:13-113.
    """

    output_dim: int
    hidden_dims: tuple[int, ...]
    activation: Callable = nn.silu
    use_layer_norm: bool = True

    @nn.compact
    def __call__(
        self,
        latent_mesh: jnp.ndarray,  # [B, N_mesh, latent]
        latent_grid: jnp.ndarray,  # [B, N_grid, latent]
        m2g: DeviceGraph,
    ) -> jnp.ndarray:
        batch = latent_mesh.shape[0]
        edges_emb = GenCastMLP(self.hidden_dims, self.activation, self.use_layer_norm)(
            m2g.edge_attr
        )
        edges_emb = jnp.broadcast_to(edges_emb, (batch,) + edges_emb.shape)
        latent_grid = latent_grid + InteractionNetwork(
            self.hidden_dims, self.activation, self.use_layer_norm
        )(latent_mesh, latent_grid, edges_emb, m2g)
        out_dims = tuple(self.hidden_dims[:-1]) + (self.output_dim,)
        return GenCastMLP(out_dims, self.activation, self.use_layer_norm)(latent_grid)
