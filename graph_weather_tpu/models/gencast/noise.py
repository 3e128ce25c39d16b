"""Noise utilities for GenCast training (reference gencast/utils/noise.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graph_weather_tpu.ops.sht import generate_isotropic_noise  # noqa: F401 (re-export)
from graph_weather_tpu.models.gencast.denoiser import Preconditioner  # noqa: F401


def sample_noise_level(
    key, shape=(), sigma_min: float = 0.02, sigma_max: float = 88.0, rho: float = 7.0
) -> jnp.ndarray:
    """Training noise-level distribution (reference noise.py:54-73)."""
    u = jax.random.uniform(key, shape)
    return (
        sigma_max ** (1 / rho) + u * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
    ) ** rho
