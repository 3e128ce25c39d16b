"""GraphCast variant with hierarchical rematerialization presets.

Equivalent of reference models/graphcast/model.py:21-345 (the
NVIDIA-PhysicsNeMo-style hierarchical checkpointing controls): the same
encode-process-decode stack with a uniform hidden dim, where the
checkpoint flags become `jax.checkpoint`/`nn.remat` policies applied at
model / encoder / processor / per-block / decoder scope. The presets map:

  none            -> no remat (max speed, max memory)
  full            -> jax.checkpoint around the whole forward
  balanced        -> remat encoder + whole processor + decoder
  processor_only  -> remat the whole processor
  fine_grained    -> per-block remat inside the processor
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from graph_weather_tpu.meshes.graphs import (
    build_grid_to_mesh_graph,
    build_latent_graph,
    build_mesh_to_grid_graph,
)
from graph_weather_tpu.meshes.hexmesh import get_hexmesh
from graph_weather_tpu.models.layers import Decoder, Encoder, Processor
from graph_weather_tpu.nn.graph_blocks import DeviceGraph
from graph_weather_tpu.utils import validate_lat_lons

CHECKPOINT_STRATEGIES = ("none", "full", "balanced", "processor_only", "fine_grained")


class GraphCastModule(nn.Module):
    """Encode-process-decode with per-scope remat selection."""

    input_dim: int
    output_dim: int
    hidden_dim: int = 256
    num_processor_blocks: int = 9
    hidden_layers: int = 2
    norm_type: str = "LayerNorm"
    n_mesh: int = 5882
    checkpoint_strategy: str = "none"
    # The reference GraphCast never forwards hidden_dim to its Decoder's
    # output_edge_dim, which therefore stays at the Decoder default (256)
    # even for small hidden dims (reference models/graphcast/model.py:97-111
    # vs models/layers/decoder.py:31). None = hidden_dim (our default);
    # set 256 to reproduce reference weights exactly.
    decoder_edge_dim: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        g2m: DeviceGraph,
        latent: DeviceGraph,
        m2g: DeviceGraph,
    ) -> jnp.ndarray:
        strategy = self.checkpoint_strategy
        remat_enc = strategy == "balanced"
        remat_proc_whole = strategy in ("balanced", "processor_only")
        remat_proc_blocks = strategy == "fine_grained"
        remat_dec = strategy == "balanced"

        enc_cls = nn.remat(Encoder) if remat_enc else Encoder
        proc_cls = nn.remat(Processor) if remat_proc_whole else Processor
        dec_cls = nn.remat(Decoder) if remat_dec else Decoder

        x_mesh, latent_edge_feats = enc_cls(
            input_dim=self.input_dim,
            node_dim=self.hidden_dim,
            edge_dim=self.hidden_dim,
            hidden_dim_processor_node=self.hidden_dim,
            hidden_dim_processor_edge=self.hidden_dim,
            hidden_layers_processor_node=self.hidden_layers,
            hidden_layers_processor_edge=self.hidden_layers,
            norm_type=self.norm_type,
            n_mesh=self.n_mesh,
            name="Encoder_0",
        )(features, g2m, latent)
        x_mesh = proc_cls(
            node_dim=self.hidden_dim,
            edge_dim=self.hidden_dim,
            num_blocks=self.num_processor_blocks,
            hidden_dim_processor_node=self.hidden_dim,
            hidden_dim_processor_edge=self.hidden_dim,
            hidden_layers_processor_node=self.hidden_layers,
            hidden_layers_processor_edge=self.hidden_layers,
            norm_type=self.norm_type,
            remat=remat_proc_blocks,
            name="Processor_0",
        )(x_mesh, latent_edge_feats, latent)
        out = dec_cls(
            output_dim=self.output_dim,
            node_dim=self.hidden_dim,
            edge_dim=self.decoder_edge_dim or self.hidden_dim,
            hidden_dim_processor_node=self.hidden_dim,
            hidden_dim_processor_edge=self.hidden_dim,
            hidden_layers_processor_node=self.hidden_layers,
            hidden_layers_processor_edge=self.hidden_layers,
            norm_type=self.norm_type,
            hidden_dim_decoder=self.hidden_dim,
            hidden_layers_decoder=self.hidden_layers,
            name="Decoder_0",
        )(x_mesh, m2g)
        return out + features[..., : self.output_dim]


class GraphCast:
    """GraphCast handle with settable checkpoint strategy.

    `set_checkpoint_strategy` replaces the reference's four set_checkpoint_*
    methods; `GraphCastConfig` provides the same named presets.
    """

    def __init__(
        self,
        lat_lons: list,
        resolution: int = 2,
        input_dim: int = 78,
        output_dim: int = 78,
        hidden_dim: int = 256,
        num_processor_blocks: int = 9,
        hidden_layers: int = 2,
        mlp_norm_type: str = "LayerNorm",
        checkpoint_strategy: str = "none",
        latent_graph_order: str = "native",
        decoder_edge_dim: Optional[int] = None,
    ):
        validate_lat_lons(lat_lons)
        if checkpoint_strategy not in CHECKPOINT_STRATEGIES:
            raise ValueError(
                f"checkpoint_strategy must be one of {CHECKPOINT_STRATEGIES}"
            )
        if latent_graph_order not in ("native", "reference"):
            raise ValueError(
                f"latent_graph_order must be 'native' or 'reference', got "
                f"{latent_graph_order!r}"
            )
        self.lat_lons = list(lat_lons)
        self.input_dim = input_dim
        self.output_dim = output_dim
        self._module_kwargs = dict(
            input_dim=input_dim,
            output_dim=output_dim,
            hidden_dim=hidden_dim,
            num_processor_blocks=num_processor_blocks,
            hidden_layers=hidden_layers,
            norm_type=mlp_norm_type,
            decoder_edge_dim=decoder_edge_dim,
        )
        mesh = get_hexmesh(resolution)
        self._module_kwargs["n_mesh"] = mesh.num_cells
        ll = np.asarray(self.lat_lons, dtype=np.float64)
        self.g2m = DeviceGraph.from_bundle(build_grid_to_mesh_graph(ll, mesh))
        latent_bundle = build_latent_graph(mesh)
        if latent_graph_order == "reference":
            # Reproduce the reference's latent-row-reversal quirk so
            # converted reference weights give the same net function (see
            # forecast.reversal_conjugated_latent).
            from graph_weather_tpu.models.forecast import (
                reversal_conjugated_latent,
            )

            latent_bundle = reversal_conjugated_latent(latent_bundle)
        self.latent = DeviceGraph.from_bundle(latent_bundle)
        self.m2g = DeviceGraph.from_bundle(build_mesh_to_grid_graph(ll, mesh))
        self.set_checkpoint_strategy(checkpoint_strategy)

    def set_checkpoint_strategy(self, strategy: str):
        if strategy not in CHECKPOINT_STRATEGIES:
            raise ValueError(f"strategy must be one of {CHECKPOINT_STRATEGIES}")
        self.checkpoint_strategy = strategy
        self.module = GraphCastModule(
            checkpoint_strategy="none" if strategy == "full" else strategy,
            **self._module_kwargs,
        )
        self._jit_apply = None
        self._jit_init = None

    def init(self, rng: jax.Array, batch_size: int = 1):
        if self._jit_init is None:
            self._jit_init = jax.jit(
                lambda rng, x: self.module.init(
                    rng, x, self.g2m, self.latent, self.m2g
                )
            )
        dummy = jnp.zeros((batch_size, len(self.lat_lons), self.input_dim))
        return self._jit_init(rng, dummy)

    def forward_fn(self):
        module = self.module
        g2m, latent, m2g = self.g2m, self.latent, self.m2g

        def fn(params, features):
            return module.apply(params, features, g2m, latent, m2g)

        if self.checkpoint_strategy == "full":
            fn = jax.checkpoint(fn)
        return fn

    def apply(self, params, features):
        if self._jit_apply is None:
            self._jit_apply = jax.jit(self.forward_fn())
        return self._jit_apply(params, features)

    def __call__(self, params, features):
        return self.apply(params, features)


class GraphCastConfig:
    """Named checkpointing presets (reference graphcast/model.py:288-345)."""

    @staticmethod
    def no_checkpointing(model: GraphCast):
        model.set_checkpoint_strategy("none")

    @staticmethod
    def full_checkpointing(model: GraphCast):
        model.set_checkpoint_strategy("full")

    @staticmethod
    def balanced_checkpointing(model: GraphCast):
        model.set_checkpoint_strategy("balanced")

    @staticmethod
    def processor_only_checkpointing(model: GraphCast):
        model.set_checkpoint_strategy("processor_only")

    @staticmethod
    def fine_grained_checkpointing(model: GraphCast):
        model.set_checkpoint_strategy("fine_grained")
