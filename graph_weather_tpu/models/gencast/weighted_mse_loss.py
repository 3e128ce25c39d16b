"""GenCast's per-sample noise-weighted, area-weighted, feature-weighted MSE.

Equivalent of reference models/gencast/weighted_mse_loss.py:9-135. Stateless
callable over jnp arrays in the reference layout [batch, lon, lat, var].
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


class WeightedMSELoss:
    def __init__(
        self,
        grid_lat: Optional[np.ndarray] = None,
        pressure_levels: Optional[np.ndarray] = None,
        num_atmospheric_features: Optional[int] = None,
        single_features_weights: Optional[np.ndarray] = None,
    ):
        area_weights = None
        features_weights = None
        if grid_lat is not None:
            grid_lat = np.asarray(grid_lat, dtype=np.float32)
            area_weights = np.abs(np.cos(np.deg2rad(grid_lat)))
            area_weights = area_weights / area_weights.mean()
        provided = (pressure_levels, num_atmospheric_features, single_features_weights)
        if all(p is not None for p in provided):
            pressure_levels = np.asarray(pressure_levels, dtype=np.float32)
            single = np.asarray(single_features_weights, dtype=np.float32)
            pressure_weights = pressure_levels / pressure_levels.sum()
            features_weights = np.concatenate(
                [np.tile(pressure_weights, num_atmospheric_features), single]
            )
        elif any(p is not None for p in provided):
            raise ValueError(
                "Provide all three of pressure_levels, num_atmospheric_features "
                "and single_features_weights, or none."
            )
        self.sigma_data = 1.0
        self.area_weights = None if area_weights is None else jnp.asarray(area_weights)
        self.features_weights = (
            None if features_weights is None else jnp.asarray(features_weights)
        )

    def _lambda_sigma(self, noise_level):
        return (noise_level**2 + self.sigma_data**2) / (
            noise_level * self.sigma_data
        ) ** 2

    def __call__(
        self, pred: jnp.ndarray, noise_level: jnp.ndarray, target: jnp.ndarray
    ) -> jnp.ndarray:
        """pred/target: [batch, lon, lat, var]; noise_level: [batch, 1]."""
        if pred.shape != target.shape:
            raise ValueError(
                f"Predictions and targets must have same shape: {pred.shape} vs "
                f"{target.shape}."
            )
        if pred.ndim != 4:
            raise ValueError(f"Expected [batch, lon, lat, var], got {pred.shape}.")
        if noise_level.shape != (pred.shape[0], 1):
            raise ValueError(
                f"Expected noise levels of shape [batch, 1], got {noise_level.shape}."
            )
        loss = (pred - target) ** 2
        if self.area_weights is not None:
            if self.area_weights.shape[0] != pred.shape[2]:
                raise ValueError(
                    f"grid_lat size ({self.area_weights.shape[0]}) != prediction "
                    f"latitudes ({pred.shape[2]})."
                )
            loss = loss * self.area_weights[None, None, :, None]
        if self.features_weights is not None:
            if self.features_weights.shape[0] != pred.shape[-1]:
                raise ValueError(
                    f"features weights size ({self.features_weights.shape[0]}) != "
                    f"prediction features ({pred.shape[-1]})."
                )
            loss = loss * self.features_weights[None, None, None, :]
        loss = loss.reshape(loss.shape[0], -1).mean(-1)
        loss = loss * self._lambda_sigma(noise_level).reshape(-1)
        return loss.mean()
