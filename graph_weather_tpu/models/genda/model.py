"""GenDA: GenCast denoiser with sensor conditioning + classifier-free guidance.

Equivalent of reference models/genda/model.py:25-517: the denoiser's grid
features gain [sensor_mask, sensor_values] channels; training drops the
conditioning with probability 0.1 (classifier-free training,
genda/model.py:394-401); `guided_forward` combines conditional and
unconditional passes as uncond + gamma (cond - uncond)
(genda/model.py:489-517).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from graph_weather_tpu.models.gencast.denoiser import Denoiser, DenoiserModule
from graph_weather_tpu.models.gencast.graphs import build_graphcast_graphs
from graph_weather_tpu.nn.graph_blocks import DeviceGraph


@dataclass
class GenDAConfig:
    """Mirrors reference models/genda/model.py:25-63."""

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
    conditioning_dim: int = 2
    remat: bool = False
    attention_impl: str = "segment"

    def build(self) -> "GenDA":
        return GenDA(
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
            conditioning_dim=self.conditioning_dim,
            remat=self.remat,
            attention_impl=self.attention_impl,
        )


class GenDA(Denoiser):
    """Sensor-conditioned diffusion assimilator (subclasses the Denoiser).

    Tensors use the reference layout [B, lon, lat, F]; sensor mask/values
    are [B, lon, lat, 1] each.
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
        conditioning_dim: int = 2,
        remat: bool = False,
        attention_impl: str = "segment",
        mesh_orientation: str = "pole",
        node_layout: str = "consistent",
    ):
        super().__init__(
            grid_lon=grid_lon,
            grid_lat=grid_lat,
            input_features_dim=input_features_dim,
            output_features_dim=output_features_dim,
            hidden_dims=hidden_dims,
            num_blocks=num_blocks,
            num_heads=num_heads,
            splits=splits,
            num_hops=num_hops,
            use_edges_features=use_edges_features,
            scale_factor=scale_factor,
            remat=remat,
            attention_impl=attention_impl,
            mesh_orientation=mesh_orientation,
            node_layout=node_layout,
        )
        self.conditioning_dim = conditioning_dim

    # conditioning-aware init / forward -----------------------------------
    def init(self, rng: jax.Array, batch_size: int = 1):
        if self._jit_init is None:
            self._jit_init = jax.jit(
                lambda rng, t, p, s, c: self.module.init(
                    rng,
                    t,
                    p,
                    s,
                    self.grid_node_feats,
                    self.mesh_node_feats,
                    self.g2m,
                    self.khop,
                    self.m2g,
                    c,
                )
            )
        n = self.num_lon * self.num_lat
        targets = jnp.zeros((batch_size, n, self.output_features_dim))
        prev = jnp.zeros((batch_size, n, 2 * self.input_features_dim))
        noise = jnp.ones((batch_size, 1))
        cond = jnp.zeros((batch_size, n, self.conditioning_dim))
        return self._jit_init(rng, targets, prev, noise, cond)

    def _check_sensor_shapes(self, sensor_mask, sensor_values, batch):
        expected = (batch, self.num_lon, self.num_lat, 1)
        for name, t in (("sensor_mask", sensor_mask), ("sensor_values", sensor_values)):
            if t is not None and tuple(t.shape) != expected:
                raise ValueError(f"Expected {name} shape {expected}, got {tuple(t.shape)}")

    def forward_fn(self, compute_dtype=None):
        """Pure forward with sensor conditioning; same compute_dtype policy
        as Denoiser.forward_fn (params/inputs/static features cast to bf16,
        preconditioning and output in f32)."""
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
        cdim = self.conditioning_dim

        def fn(
            params,
            corrupted_targets,
            prev_inputs,
            noise_levels,
            sensor_mask=None,
            sensor_values=None,
        ):
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
            batch, n = corrupted_targets.shape[0], self.num_lon * self.num_lat
            parts = []
            if sensor_mask is not None:
                parts.append(to_nodes(sensor_mask))
            if sensor_values is not None:
                parts.append(to_nodes(sensor_values))
            if parts:
                cond = jnp.concatenate(parts, axis=-1)
            else:
                cond = jnp.zeros((batch, n, cdim), corrupted_targets.dtype)
            cond = cond.astype(corrupted_targets.dtype)
            out = module.apply(
                params,
                to_nodes(corrupted_targets),
                to_nodes(prev_inputs),
                noise_levels.astype(jnp.float32),
                *consts,
                conditioning=cond,
            )
            return from_nodes(out).astype(jnp.float32)

        return fn

    def guided_forward_fn(self, compute_dtype=None):
        """One-program classifier-free guidance: the conditional and
        unconditional passes are folded into a single batch-2B forward
        (conditioning zeroed on the second half) instead of two dispatches
        — one network pass at 2B rides the batch-native attention kernels
        (reference guided_forward runs two full forwards,
        genda/model.py:489-517).

        Returns fn(params, corrupted, prev, noise, sensor_mask,
        sensor_values, gamma) -> guided denoised output [B, lon, lat, F].
        """
        base = self.forward_fn(compute_dtype=compute_dtype)

        def fn(
            params,
            corrupted_targets,
            prev_inputs,
            noise_levels,
            sensor_mask,
            sensor_values,
            gamma=2.0,
        ):
            both = jnp.concatenate([corrupted_targets, corrupted_targets], 0)
            prev2 = jnp.concatenate([prev_inputs, prev_inputs], 0)
            noise2 = jnp.concatenate([noise_levels, noise_levels], 0)
            mask2 = jnp.concatenate(
                [sensor_mask, jnp.zeros_like(sensor_mask)], 0
            )
            vals2 = jnp.concatenate(
                [sensor_values, jnp.zeros_like(sensor_values)], 0
            )
            out = base(params, both, prev2, noise2, mask2, vals2)
            b = corrupted_targets.shape[0]
            cond, uncond = out[:b], out[b:]
            return uncond + gamma * (cond - uncond)

        return fn

    def apply(
        self,
        params,
        corrupted_targets,
        prev_inputs,
        noise_levels,
        sensor_mask=None,
        sensor_values=None,
        train: bool = False,
        dropout_rng=None,
    ):
        """Denoise with optional sensor conditioning.

        In training, conditioning is zeroed with probability 0.1 when
        `dropout_rng` is provided (classifier-free training, reference
        genda/model.py:394-401).
        """
        if not isinstance(noise_levels, jax.core.Tracer):
            if not bool(np.all(np.asarray(noise_levels) > 0)):
                raise ValueError("All the noise levels must be strictly positive.")
        self._check_sensor_shapes(
            sensor_mask, sensor_values, prev_inputs.shape[0]
        )
        if (
            train
            and dropout_rng is not None
            and sensor_mask is not None
            and sensor_values is not None
        ):
            drop = jax.random.uniform(dropout_rng, ()) < 0.1
            sensor_mask = jnp.where(drop, jnp.zeros_like(sensor_mask), sensor_mask)
            sensor_values = jnp.where(
                drop, jnp.zeros_like(sensor_values), sensor_values
            )
        if self._jit_apply is None:
            self._jit_apply = jax.jit(self.forward_fn())
        return self._jit_apply(
            params,
            corrupted_targets,
            prev_inputs,
            noise_levels,
            sensor_mask,
            sensor_values,
        )

    def __call__(self, params, corrupted_targets, prev_inputs, noise_levels, **kw):
        return self.apply(params, corrupted_targets, prev_inputs, noise_levels, **kw)

    def guided_forward(
        self,
        params,
        corrupted_targets,
        prev_inputs,
        noise_levels,
        sensor_mask,
        sensor_values,
        gamma: float = 2.0,
    ):
        """Classifier-free guidance: uncond + gamma (cond - uncond)."""
        cond = self.apply(
            params,
            corrupted_targets,
            prev_inputs,
            noise_levels,
            sensor_mask=sensor_mask,
            sensor_values=sensor_values,
        )
        uncond = self.apply(
            params,
            corrupted_targets,
            prev_inputs,
            noise_levels,
            sensor_mask=jnp.zeros_like(sensor_mask),
            sensor_values=jnp.zeros_like(sensor_values),
        )
        return uncond + gamma * (cond - uncond)
