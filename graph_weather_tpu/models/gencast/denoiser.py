"""GenCast Denoiser: Karras-preconditioned encode-process-decode diffusion.

Equivalent of reference models/gencast/denoiser.py:25-390:
    D(Z, X, sigma) = c_skip(sigma) Z + c_out(sigma) f_theta(c_in(sigma) Z,
                                                            X, c_noise(sigma))
with f_theta = Encoder(g2m) -> noise-conditioned transformer Processor on
the k-hop mesh -> Decoder(m2g). Inputs follow the reference layout
[B, lon, lat, F]; internally data is reordered to the graph's lat-major
node order. (The reference flattens data lon-major against lat-major graph
features — a silent permutation bug we deliberately do not replicate.)

The public Denoiser handle is jit-cached; `forward_fn()` exposes the pure
function for grad/scan composition.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from graph_weather_tpu.models.gencast.graphs import build_graphcast_graphs
from graph_weather_tpu.models.gencast.layers import (
    GenCastDecoder,
    GenCastEncoder,
    GenCastProcessor,
)
from graph_weather_tpu.nn.graph_blocks import DeviceGraph


class Preconditioner:
    """Karras (2022) Table-1 preconditioning (sigma_data = 1 for GenCast).

    Reference models/gencast/utils/noise.py:76-105.
    """

    def __init__(self, sigma_data: float = 1.0):
        self.sigma_data = sigma_data

    def c_skip(self, sigma):
        return self.sigma_data**2 / (sigma**2 + self.sigma_data**2)

    def c_out(self, sigma):
        return sigma * self.sigma_data / jnp.sqrt(sigma**2 + self.sigma_data**2)

    def c_in(self, sigma):
        return 1.0 / jnp.sqrt(sigma**2 + self.sigma_data**2)

    def c_noise(self, sigma):
        return 0.25 * jnp.log(sigma)


class DenoiserModule(nn.Module):
    """Pure flax f_theta + preconditioning over [B, N, F] node data."""

    output_features_dim: int
    hidden_dims: tuple[int, ...] = (512, 512)
    num_blocks: int = 16
    num_heads: int = 4
    use_edge_features: bool = True
    scale_factor: float = 1.0
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        corrupted_targets: jnp.ndarray,  # [B, N_grid, F_out]
        prev_inputs: jnp.ndarray,  # [B, N_grid, 2 F_in]
        noise_levels: jnp.ndarray,  # [B, 1]
        grid_node_feats: jnp.ndarray,  # [N_grid, 3]
        mesh_node_feats: jnp.ndarray,  # [N_mesh, 3]
        g2m: DeviceGraph,
        khop: DeviceGraph,
        m2g: DeviceGraph,
        conditioning: Optional[jnp.ndarray] = None,  # [B, N_grid, C] (GenDA)
    ) -> jnp.ndarray:
        precs = Preconditioner(sigma_data=1.0)
        batch = corrupted_targets.shape[0]
        dtype = corrupted_targets.dtype

        # Preconditioning factors are f32; cast them DOWN so a bf16 compute
        # policy survives (f32 * bf16 would promote everything back to f32).
        scaled_targets = (
            precs.c_in(noise_levels)[:, :, None].astype(dtype) * corrupted_targets
        )
        scaled_noise = precs.c_noise(noise_levels)

        parts = [scaled_targets, prev_inputs.astype(dtype)]
        if conditioning is not None:
            parts.append(conditioning.astype(dtype))
        parts.append(
            jnp.broadcast_to(
                grid_node_feats.astype(dtype), (batch,) + grid_node_feats.shape
            )
        )
        grid_feats = jnp.concatenate(parts, axis=-1)

        latent_grid, latent_mesh = GenCastEncoder(
            hidden_dims=self.hidden_dims,
            scale_factor=self.scale_factor,
        )(grid_feats, mesh_node_feats, g2m)

        latent_mesh = GenCastProcessor(
            latent_dim=self.hidden_dims[-1],
            hidden_dims=self.hidden_dims,
            num_blocks=self.num_blocks,
            num_heads=self.num_heads,
            use_edge_features=self.use_edge_features,
            remat=self.remat,
        )(latent_mesh, scaled_noise, khop)

        preds = GenCastDecoder(
            output_dim=self.output_features_dim,
            hidden_dims=self.hidden_dims,
        )(latent_mesh, latent_grid, m2g)

        return (
            precs.c_skip(noise_levels)[:, :, None] * corrupted_targets
            + precs.c_out(noise_levels)[:, :, None] * preds
        )


@dataclass
class DenoiserConfig:
    """Mirrors reference models/gencast/denoiser.py:25-63."""

    grid_lon: np.ndarray
    grid_lat: np.ndarray
    input_features_dim: int
    output_features_dim: int
    hidden_dims: tuple = (512, 512)
    num_blocks: int = 16
    num_heads: int = 4
    splits: int = 6
    num_hops: int = 6
    use_edges_features: bool = True
    scale_factor: float = 1.0
    remat: bool = False
    attention_impl: str = "segment"

    def build(self) -> "Denoiser":
        return Denoiser(
            grid_lon=self.grid_lon,
            grid_lat=self.grid_lat,
            input_features_dim=self.input_features_dim,
            output_features_dim=self.output_features_dim,
            hidden_dims=tuple(self.hidden_dims),
            num_blocks=self.num_blocks,
            num_heads=self.num_heads,
            splits=self.splits,
            num_hops=self.num_hops,
            use_edges_features=self.use_edges_features,
            scale_factor=self.scale_factor,
            remat=self.remat,
            attention_impl=self.attention_impl,
        )


class Denoiser:
    """GenCast denoiser handle: builds graphs, owns the flax module.

    Public tensors use the reference layout [B, lon, lat, F].
    """

    def __init__(
        self,
        grid_lon: np.ndarray,
        grid_lat: np.ndarray,
        input_features_dim: int,
        output_features_dim: int,
        hidden_dims: tuple[int, ...] = (512, 512),
        num_blocks: int = 16,
        num_heads: int = 4,
        splits: int = 6,
        num_hops: int = 6,
        use_edges_features: bool = True,
        scale_factor: float = 1.0,
        remat: bool = False,
        attention_impl: str = "segment",
        mesh_orientation: str = "pole",
        node_layout: str = "consistent",
    ):
        if attention_impl not in (
            "segment", "banded", "banded_flash", "clustered_flash"
        ):
            raise ValueError(f"unknown attention_impl {attention_impl!r}")
        if attention_impl != "segment" and use_edges_features:
            raise ValueError(
                f"attention_impl={attention_impl!r} requires use_edges_features="
                "False "
                "(matching the reference's sparse attention mode, which also "
                "drops edge features; sparse_transformer.py)"
            )
        if node_layout not in ("consistent", "reference"):
            raise ValueError(f"unknown node_layout {node_layout!r}")
        self.node_layout = node_layout
        self.num_lon = len(grid_lon)
        self.num_lat = len(grid_lat)
        self.input_features_dim = input_features_dim
        self.output_features_dim = output_features_dim

        graphs = build_graphcast_graphs(
            grid_lon,
            grid_lat,
            splits=splits,
            num_hops=num_hops,
            add_edge_features_to_khop=use_edges_features,
            # Clustered flash wants compact geodesic receiver blocks;
            # the banded paths want small index spans (lat-lon sort).
            spatial_sort="rcb" if attention_impl == "clustered_flash" else True,
            mesh_orientation=mesh_orientation,
        )
        self.graphs = graphs
        self.g2m = DeviceGraph.from_bundle(graphs.g2m)
        self.khop = DeviceGraph.from_bundle(
            graphs.khop,
            banded=attention_impl.startswith("banded"),
            band_flash=(attention_impl == "banded_flash"),
            clustered=(attention_impl == "clustered_flash"),
        )
        self.m2g = DeviceGraph.from_bundle(graphs.m2g)
        self.grid_node_feats = jnp.asarray(graphs.grid_node_feats)
        self.mesh_node_feats = jnp.asarray(graphs.mesh_node_feats)

        self.module = DenoiserModule(
            output_features_dim=output_features_dim,
            hidden_dims=tuple(hidden_dims),
            num_blocks=num_blocks,
            num_heads=num_heads,
            use_edge_features=use_edges_features,
            scale_factor=scale_factor,
            remat=remat,
        )
        self._jit_apply = None
        self._jit_init = None

    # -- layout helpers: [B, lon, lat, F] <-> lat-major node order ---------
    # The graphs index grid nodes lat-major (node = lat_i * n_lon + lon_i,
    # matching the reference's np.meshgrid build, graph_builder.py:164-166),
    # so data is transposed into that order here. NOTE the reference model
    # itself flattens its DATA lon-major ("b lon lat f -> b (lon lat) f",
    # reference denoiser.py:318-319) against its lat-major graphs — i.e. it
    # places grid data at transposed node positions relative to its own
    # edges and spatial features. We fix that inconsistency; to reproduce
    # the reference net function bit-for-bit (e.g. when loading weights
    # TRAINED with the quirk, like gencast-128x64), pass
    # node_layout="reference" to the constructor.
    def _to_nodes(self, x: jnp.ndarray) -> jnp.ndarray:
        b, lon, lat, f = x.shape
        if self.node_layout == "reference":
            return x.reshape(b, lon * lat, f)
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, lat * lon, f)

    def _from_nodes(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, f = x.shape
        if self.node_layout == "reference":
            return x.reshape(b, self.num_lon, self.num_lat, f)
        return jnp.transpose(
            x.reshape(b, self.num_lat, self.num_lon, f), (0, 2, 1, 3)
        )

    def init(self, rng: jax.Array, batch_size: int = 1):
        if self._jit_init is None:
            self._jit_init = jax.jit(
                lambda rng, t, p, s: self.module.init(
                    rng,
                    t,
                    p,
                    s,
                    self.grid_node_feats,
                    self.mesh_node_feats,
                    self.g2m,
                    self.khop,
                    self.m2g,
                )
            )
        n = self.num_lon * self.num_lat
        targets = jnp.zeros((batch_size, n, self.output_features_dim))
        prev = jnp.zeros((batch_size, n, 2 * self.input_features_dim))
        noise = jnp.ones((batch_size, 1))
        return self._jit_init(rng, targets, prev, noise)

    def forward_fn(self, compute_dtype=None):
        """Pure forward; compute_dtype=bf16 runs the network in bf16
        (params/inputs/static features cast; preconditioning and output in
        f32)."""
        module = self.module
        consts = [
            self.grid_node_feats,
            self.mesh_node_feats,
            self.g2m,
            self.khop,
            self.m2g,
        ]
        if compute_dtype is not None:
            consts[0] = consts[0].astype(compute_dtype)
            consts[1] = consts[1].astype(compute_dtype)
            for i in (2, 3, 4):
                consts[i] = consts[i].replace(
                    edge_attr=consts[i].edge_attr.astype(compute_dtype)
                )
        consts = tuple(consts)
        to_nodes, from_nodes = self._to_nodes, self._from_nodes
        check = self._check_shapes

        def fn(params, corrupted_targets, prev_inputs, noise_levels):
            check(corrupted_targets, prev_inputs, noise_levels)
            if compute_dtype is not None:
                params = jax.tree_util.tree_map(
                    lambda t: t.astype(compute_dtype)
                    if jnp.issubdtype(t.dtype, jnp.floating)
                    else t,
                    params,
                )
                corrupted_targets = corrupted_targets.astype(compute_dtype)
                prev_inputs = prev_inputs.astype(compute_dtype)
            out = module.apply(
                params,
                to_nodes(corrupted_targets),
                to_nodes(prev_inputs),
                noise_levels.astype(jnp.float32),
                *consts,
            )
            return from_nodes(out).astype(jnp.float32)

        return fn

    def _check_shapes(self, corrupted_targets, prev_inputs, noise_levels):
        """Static shape validation (reference denoiser.py:170-187) and, when
        the noise levels are concrete (outside jit), the positivity check
        (reference denoiser.py:314-315) — sigma <= 0 makes c_noise = log(sigma)
        NaN silently otherwise."""
        batch = prev_inputs.shape[0]
        exp_inputs = (batch, self.num_lon, self.num_lat, 2 * self.input_features_dim)
        exp_targets = (batch, self.num_lon, self.num_lat, self.output_features_dim)
        exp_noise = (batch, 1)
        if (
            tuple(corrupted_targets.shape) != exp_targets
            or tuple(prev_inputs.shape) != exp_inputs
            or tuple(noise_levels.shape) != exp_noise
        ):
            raise ValueError(
                "Input shapes don't match the initialization parameters: expected "
                f"{exp_inputs} for prev_inputs, {exp_targets} for targets and "
                f"{exp_noise} for noise_levels; got {tuple(prev_inputs.shape)}, "
                f"{tuple(corrupted_targets.shape)}, {tuple(noise_levels.shape)}."
            )
        if not isinstance(noise_levels, jax.core.Tracer):
            if not bool(np.all(np.asarray(noise_levels) > 0)):
                raise ValueError("All the noise levels must be strictly positive.")

    def apply(self, params, corrupted_targets, prev_inputs, noise_levels):
        """[B, lon, lat, F_out], [B, lon, lat, 2 F_in], [B, 1] -> denoised."""
        # Concrete-value check must happen before entering jit (inside the
        # trace noise_levels is a tracer and sigma <= 0 would silently NaN).
        if not isinstance(noise_levels, jax.core.Tracer):
            if not bool(np.all(np.asarray(noise_levels) > 0)):
                raise ValueError("All the noise levels must be strictly positive.")
        if self._jit_apply is None:
            self._jit_apply = jax.jit(self.forward_fn())
        return self._jit_apply(params, corrupted_targets, prev_inputs, noise_levels)

    def __call__(self, params, corrupted_targets, prev_inputs, noise_levels):
        return self.apply(params, corrupted_targets, prev_inputs, noise_levels)

    @classmethod
    def from_pretrained(cls, repo_id_or_path: str, **overrides):
        """Load a reference-format pretrained Denoiser -> (denoiser, params).

        Equivalent of the reference's HF-hub mixin
        (`Denoiser.from_pretrained("openclimatefix/gencast-128x64")`,
        reference tests/test_gencast.py:165-182 via PyTorchModelHubMixin):
        accepts a local directory or a HuggingFace Hub repo id containing
        config.json + model.safetensors (or pytorch_model.bin), converts
        the torch state_dict with scripts/convert_torch.convert_denoiser,
        and builds the Denoiser in REFERENCE-compatible mode
        (mesh_orientation="graphcast", node_layout="reference") so the
        loaded weights compute the same function they were trained as.
        Keyword overrides are passed to the constructor (e.g.
        attention_impl="clustered_flash" — requires a checkpoint trained
        with use_edges_features=False).
        """
        import json
        import os

        if os.path.isdir(repo_id_or_path):
            cfg_path = os.path.join(repo_id_or_path, "config.json")
            weights = None
            for name in ("model.safetensors", "pytorch_model.bin"):
                p = os.path.join(repo_id_or_path, name)
                if os.path.exists(p):
                    weights = p
                    break
        else:
            from huggingface_hub import hf_hub_download

            cfg_path = hf_hub_download(repo_id_or_path, "config.json")
            try:
                weights = hf_hub_download(repo_id_or_path, "model.safetensors")
            except Exception:
                weights = hf_hub_download(repo_id_or_path, "pytorch_model.bin")
        if weights is None:
            raise FileNotFoundError(
                f"no model.safetensors / pytorch_model.bin in {repo_id_or_path}"
            )

        with open(cfg_path) as f:
            cfg = json.load(f)
        if weights.endswith(".safetensors"):
            from safetensors.numpy import load_file

            sd = load_file(weights)
        else:
            import torch

            raw = torch.load(weights, map_location="cpu", weights_only=True)
            sd = {k: v.numpy() for k, v in raw.items()}

        kwargs = dict(
            grid_lon=np.asarray(cfg["grid_lon"], dtype=np.float64),
            grid_lat=np.asarray(cfg["grid_lat"], dtype=np.float64),
            input_features_dim=cfg["input_features_dim"],
            output_features_dim=cfg["output_features_dim"],
            hidden_dims=tuple(cfg.get("hidden_dims", (512, 512))),
            num_blocks=cfg.get("num_blocks", 16),
            num_heads=cfg.get("num_heads", 4),
            splits=cfg.get("splits", 6),
            num_hops=cfg.get("num_hops", 6),
            use_edges_features=cfg.get("use_edges_features", True),
            scale_factor=cfg.get("scale_factor", 1.0),
            mesh_orientation="graphcast",
            node_layout="reference",
        )
        kwargs.update(overrides)
        denoiser = cls(**kwargs)

        from graph_weather_tpu.convert import convert_denoiser

        params = jax.tree_util.tree_map(
            jnp.asarray,
            convert_denoiser(
                sd,
                num_blocks=kwargs["num_blocks"],
                mlp_hidden_dims=len(kwargs["hidden_dims"]),
            ),
        )
        return denoiser, params
