"""Weather loss functions.

TPU-native equivalents of the reference losses (reference
models/losses.py:9-195). Losses are plain callables over jnp arrays —
stateless, jittable, differentiable — holding only precomputed constant
weights. The reference's leftover debug prints (losses.py:62-64) are,
deliberately, not replicated.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class NormalizedMSELoss:
    """Cos(lat)-weighted (optionally variance-normalized) MSE.

    Matches reference models/losses.py:9-94: squared error, optional
    division by per-feature variance, mean over features, multiplied by a
    per-unique-latitude cos(lat) weight tiled across longitudes (assumes
    node ordering groups rows of constant latitude), then mean.
    """

    def __init__(self, feature_variance, lat_lons, normalize: bool = False):
        fv = np.asarray(feature_variance, dtype=np.float32)
        assert np.all(np.isfinite(fv)), "feature_variance contains non-finite values"
        self.feature_variance = jnp.asarray(fv)
        unique_lats = sorted(set(lat for lat, _ in lat_lons))
        weights = np.cos(np.deg2rad(np.asarray(unique_lats, dtype=np.float32)))
        assert np.all(np.isfinite(weights))
        self.weights = jnp.asarray(weights)
        self.normalize = normalize

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        out = (pred - target) ** 2
        if self.normalize:
            out = out / self.feature_variance
        out = out.mean(axis=-1)  # mean over physical variables -> [B, ...nodes]

        batch = out.shape[0]
        out = out.reshape(batch, -1)  # [B, num_nodes]
        num_nodes = out.shape[1]
        num_unique = self.weights.shape[0]
        num_lon = num_nodes // num_unique
        weight_grid = jnp.repeat(self.weights, num_lon).reshape(1, num_nodes)
        return (out * weight_grid).mean()
