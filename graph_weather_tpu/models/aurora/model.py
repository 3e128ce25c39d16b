"""Aurora point-cloud model (reference models/aurora/model.py).

Order-invariant by construction: coordinate and feature embeddings are
added (no positional embeddings), all mixing is permutation-equivariant
self-attention. Points are (lon, lat) pairs in degrees.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from graph_weather_tpu.nn.mlp import TorchLinear

xavier_linear = nn.initializers.xavier_uniform()


class _XavierLinear(nn.Module):
    """Linear with xavier-uniform kernel / zero bias (aurora _init_weights)."""

    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", xavier_linear, (x.shape[-1], self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return x @ kernel + bias


class PointEncoder(nn.Module):
    """Coordinate MLP + feature MLP combined by addition, then LayerNorm."""

    input_features: int
    embed_dim: int
    max_seq_len: int = 1024

    @nn.compact
    def __call__(self, points: jnp.ndarray, features: jnp.ndarray) -> jnp.ndarray:
        if points.shape[1] > self.max_seq_len:
            points = points[:, : self.max_seq_len]
            features = features[:, : self.max_seq_len]
        normalized = jnp.stack(
            [points[..., 0] / 180.0, points[..., 1] / 90.0], axis=-1
        )
        c = _XavierLinear(self.embed_dim // 2)(normalized)
        c = nn.relu(nn.LayerNorm(epsilon=1e-5)(c))
        c = _XavierLinear(self.embed_dim)(c)

        f = _XavierLinear(self.embed_dim)(features)
        f = nn.relu(nn.LayerNorm(epsilon=1e-5)(f))
        f = _XavierLinear(self.embed_dim)(f)

        return nn.LayerNorm(epsilon=1e-5)(c + f)


class SelfAttentionLayer(nn.Module):
    """Post-norm MHA + post-norm FFN with residuals (torch-style)."""

    embed_dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        attended = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dim
        )(x, x)
        x = nn.LayerNorm(epsilon=1e-5)(x + attended)
        h = nn.relu(_XavierLinear(4 * self.embed_dim)(x))
        h = _XavierLinear(self.embed_dim)(h)
        return nn.LayerNorm(epsilon=1e-5)(x + h)


class PointCloudProcessor(nn.Module):
    embed_dim: int
    num_layers: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for _ in range(self.num_layers):
            x = SelfAttentionLayer(self.embed_dim)(x)
        return x


class PointDecoder(nn.Module):
    output_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(_XavierLinear(x.shape[-1])(x))
        return _XavierLinear(self.output_features)(x)


class AuroraModel(nn.Module):
    """Point cloud -> point predictions, with optional validity mask."""

    input_features: int
    output_features: int
    latent_dim: int = 256
    num_layers: int = 4
    max_points: int = 10000
    max_seq_len: int = 1024

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,  # [B, N, 2] (lon, lat) degrees
        features: jnp.ndarray,  # [B, N, input_features]
        mask: Optional[jnp.ndarray] = None,  # [B, N] validity
    ) -> jnp.ndarray:
        if points.shape[1] > self.max_points:
            raise ValueError(
                f"Number of points ({points.shape[1]}) exceeds maximum "
                f"({self.max_points})"
            )
        if mask is not None:
            m = mask.astype(points.dtype)[..., None]
            points = points * m
            features = features * m
        x = PointEncoder(self.input_features, self.latent_dim, self.max_seq_len)(
            points, features
        )
        x = PointCloudProcessor(self.latent_dim, self.num_layers)(x)
        out = PointDecoder(self.output_features)(x)
        if mask is not None:
            out = out * mask.astype(out.dtype)[..., None]
        return out


class EarthSystemLoss:
    """alpha MSE + beta spatial-correlation + gamma physical-bounds loss.

    Reference models/aurora/model.py:123-184. Returns the same dict of
    components. Stateless and jittable.
    """

    def __init__(self, alpha: float = 0.5, beta: float = 0.3, gamma: float = 0.2):
        self.alpha = alpha
        self.beta = beta
        self.gamma = gamma

    def spatial_correlation_loss(self, pred, target, points):
        dists = jnp.linalg.norm(
            points[:, :, None, :] - points[:, None, :, :], axis=-1
        )  # [B, N, N]
        nearby = (dists < 5.0).astype(pred.dtype)[..., None]
        pred_diff = pred[:, :, None, :] - pred[:, None, :, :]
        target_diff = target[:, :, None, :] - target[:, None, :, :]
        return jnp.mean(nearby * (pred_diff - target_diff) ** 2)

    def physical_loss(self, pred, points):
        min_value_loss = nn.relu(-pred).mean()
        max_value_loss = nn.relu(pred - 500.0).mean()
        abs_latitude = jnp.abs(points[..., 1])
        latitude_consistency = jnp.mean(
            nn.relu(pred[..., 0] - (1.0 - abs_latitude / 90.0) * pred.mean())
        )
        return min_value_loss + max_value_loss + 0.1 * latitude_consistency

    def __call__(self, pred, target, points) -> dict:
        mse_loss = jnp.mean((pred - target) ** 2)
        spatial = self.spatial_correlation_loss(pred, target, points)
        physical = self.physical_loss(pred, points)
        total = self.alpha * mse_loss + self.beta * spatial + self.gamma * physical
        return {
            "total_loss": total,
            "mse_loss": mse_loss,
            "spatial_correlation_loss": spatial,
            "physical_loss": physical,
        }
