"""FiLM conditioning: lead-time one-hot -> (gamma, beta) modulation.

Equivalent of reference models/layers/film.py:5-75.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from graph_weather_tpu.nn.mlp import TorchLinear


class FiLMGenerator(nn.Module):
    """One-hot lead time -> MLP -> (gamma [B, F], beta [B, F])."""

    num_lead_times: int
    hidden_dim: int
    feature_dim: int

    @nn.compact
    def __call__(self, batch_size: int, lead_time) -> tuple[jnp.ndarray, jnp.ndarray]:
        one_hot = jnp.zeros((batch_size, self.num_lead_times))
        one_hot = one_hot.at[:, lead_time].set(1.0)
        h = nn.relu(TorchLinear(self.hidden_dim)(one_hot))
        gamma_beta = TorchLinear(2 * self.feature_dim)(h)
        return gamma_beta[:, : self.feature_dim], gamma_beta[:, self.feature_dim :]


def film_apply(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """x * gamma + beta with gamma/beta [B, C] broadcast over trailing dims
    of x [B, C, ...] (reference FiLMApplier, film.py:53-75)."""
    while gamma.ndim < x.ndim:
        gamma = gamma[..., None]
        beta = beta[..., None]
    return x * gamma + beta


class FiLMApplier(nn.Module):
    """Module wrapper kept for API parity with the reference."""

    def __call__(self, x, gamma, beta):
        return film_apply(x, gamma, beta)
