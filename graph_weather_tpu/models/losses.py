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


class AMSENormalizedLoss:
    """Spectrally Adjusted MSE: amplitude + decorrelation error in SH space.

    Equivalent of reference models/losses.py:98-195 ("Fixing the Double
    Penalty ...", ICML 2025) on the framework's Legendre-matmul SHT: per-
    degree power spectra of prediction and target, amplitude error
    (sqrt-PSD difference squared) plus decorrelation error
    (2 sqrt(PSD_p PSD_t) (1 - coherence)), variance-normalized per feature.

    Inputs are [B, C, H, W] equiangular grids.
    """

    def __init__(self, feature_variance, epsilon: float = 1e-9, lmax: int | None = None):
        fv = np.asarray(feature_variance, dtype=np.float32)
        self.feature_variance = jnp.asarray(fv)
        self.epsilon = epsilon
        self.lmax = lmax

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        from graph_weather_tpu.ops.sht import sht

        if pred.shape != target.shape:
            raise ValueError("Prediction and target tensors must have the same shape.")
        if pred.ndim != 4:
            raise ValueError("Input tensors must be 4D: (batch, channels, lat, lon)")
        b, c, nlat, nlon = pred.shape
        lmax = self.lmax or nlat
        mmax = min(lmax, nlon // 2)

        pc, ps = sht(pred.reshape(b * c, nlat, nlon), lmax, mmax)
        tc, ts = sht(target.reshape(b * c, nlat, nlon), lmax, mmax)

        pred_psd = (pc**2).sum(-1) + (ps**2).sum(-1)  # [B*C, L]
        target_psd = (tc**2).sum(-1) + (ts**2).sum(-1)
        cross = (pc * tc).sum(-1) + (ps * ts).sum(-1)

        denom = jnp.sqrt(pred_psd * target_psd)
        coherence = cross / (denom + self.epsilon)

        amp_error = (
            jnp.sqrt(pred_psd + self.epsilon) - jnp.sqrt(target_psd + self.epsilon)
        ) ** 2
        decor_error = 2.0 * denom * (1.0 - coherence)

        spectral = (amp_error + decor_error).sum(-1).reshape(b, c)
        return (spectral / (self.feature_variance + self.epsilon)).mean()
