"""Stochastic Decomposition Layer: x + alpha * Style(z) * epsilon.

Equivalent of reference models/layers/stochastic_decomposition.py:26-68;
the gaussian epsilon comes from flax's 'noise' RNG collection so outputs
are reproducible under a fixed seed (the reference relies on torch's
global RNG state).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from graph_weather_tpu.nn.mlp import TorchLinear


class StochasticDecompositionLayer(nn.Module):
    """Inject controllable channel-modulated noise into [B, C, *spatial]."""

    input_dim: int
    latent_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        if x.shape[1] != self.input_dim:
            raise ValueError(f"Expected {self.input_dim} channels, got {x.shape[1]}")
        alpha = self.param(
            "alpha", nn.initializers.zeros, (1, self.input_dim, 1), jnp.float32
        )
        style = TorchLinear(self.input_dim)(z)  # [B, C]

        import jax

        eps = jax.random.normal(self.make_rng("noise"), x.shape, x.dtype)

        spatial_dims = x.ndim - 2
        for _ in range(spatial_dims):
            style = style[..., None]
        alpha_b = alpha
        while alpha_b.ndim < x.ndim:
            alpha_b = alpha_b[..., None]
        # alpha starts at (1, C, 1); drop the trailing singleton if x is 2D+
        alpha_b = alpha_b.reshape((1, self.input_dim) + (1,) * spatial_dims)
        return x + alpha_b * style * eps
