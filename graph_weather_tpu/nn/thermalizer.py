"""Thermalizer: inference-time diffusion denoising of latent node features.

Equivalent of reference models/layers/thermalizer.py:20-265: reshape nodes
to a 2D grid (heuristic inference of (H, W) when not given), corrupt with
the cosine-schedule noise at timestep t, predict the noise with an adaptive
UNet score model (+2 positional channels), and take one denoising step.
Channels-last convs internally; GroupNorm as in the reference.
"""

from __future__ import annotations

import math
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (reference thermalizer.py:216-231)."""
    x = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def infer_grid_dimensions(total_nodes: int) -> tuple[int, int]:
    """Most-square factorization heuristic (reference thermalizer.py:234-258)."""
    if total_nodes <= 16:
        s = int(math.sqrt(total_nodes))
        if s * s == total_nodes:
            return s, s
        for h in range(1, total_nodes + 1):
            if total_nodes % h == 0 and abs(h - total_nodes // h) <= 2:
                return h, total_nodes // h
        return 1, total_nodes
    s = int(math.sqrt(total_nodes))
    best = (1, total_nodes)
    best_diff = float("inf")
    for h in range(max(1, s - 5), s + 6):
        if total_nodes % h == 0:
            w = total_nodes // h
            if abs(h - w) < best_diff:
                best_diff = abs(h - w)
                best = (h, w)
    return best


class _ContractBlock(nn.Module):
    out_channels: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        k = (self.kernel, self.kernel)
        x = nn.Conv(self.out_channels, kernel_size=k)(x)
        x = nn.relu(nn.GroupNorm(num_groups=min(8, self.out_channels), epsilon=1e-5)(x))
        x = nn.Conv(self.out_channels, kernel_size=k)(x)
        x = nn.relu(nn.GroupNorm(num_groups=min(8, self.out_channels), epsilon=1e-5)(x))
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class _ExpandBlock(nn.Module):
    out_channels: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        k = (self.kernel, self.kernel)
        x = nn.Conv(self.out_channels, kernel_size=k)(x)
        x = nn.relu(nn.GroupNorm(num_groups=min(8, self.out_channels), epsilon=1e-5)(x))
        x = nn.Conv(self.out_channels, kernel_size=k)(x)
        x = nn.relu(nn.GroupNorm(num_groups=min(8, self.out_channels), epsilon=1e-5)(x))
        # torch ConvTranspose2d(k=3, s=2, padding=1, output_padding=1)
        # pads the dilated input by (k-1-p, k-1-p+op) = (1, 2); flax's
        # SAME computes the mirrored (2, 1) and shifts the output by one.
        return nn.ConvTranspose(
            self.out_channels, kernel_size=(3, 3), strides=(2, 2),
            padding=((1, 2), (1, 2)),
        )(x)


def _resize_to(x, h, w):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="linear")


class AdaptiveUNet(nn.Module):
    """UNet with a simple-conv fallback for tiny grids (<= 4 on a side).

    Channels-last: [B, H, W, C_in] -> [B, H, W, C_out].
    """

    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = x.shape
        if min(h, w) <= 4:
            y = nn.Conv(64, (3, 3))(x)
            y = nn.relu(nn.GroupNorm(num_groups=8, epsilon=1e-5)(y))
            y = nn.Conv(128, (3, 3))(y)
            y = nn.relu(nn.GroupNorm(num_groups=8, epsilon=1e-5)(y))
            y = nn.Conv(64, (3, 3))(y)
            y = nn.relu(nn.GroupNorm(num_groups=8, epsilon=1e-5)(y))
            return nn.Conv(self.out_channels, (3, 3))(y)

        c1 = _ContractBlock(32, 7)(x)
        c2 = _ContractBlock(64, 3)(c1)
        c3 = _ContractBlock(128, 3)(c2)

        u3 = _ExpandBlock(64, 3)(c3)
        u3 = _resize_to(u3, c2.shape[1], c2.shape[2])
        u2 = _ExpandBlock(32, 3)(jnp.concatenate([u3, c2], -1))
        u2 = _resize_to(u2, c1.shape[1], c1.shape[2])
        u1 = _ExpandBlock(self.out_channels, 3)(jnp.concatenate([u2, c1], -1))
        return _resize_to(u1, h, w)


class ThermalizerLayer(nn.Module):
    """One-step latent denoise at diffusion timestep t.

    __call__(x [B*N, F] or [B, N, F], t) -> same shape. Noise comes from
    the 'noise' RNG collection.
    """

    input_dim: int = 256
    timesteps: int = 1000

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: int,
        height: int | None = None,
        width: int | None = None,
        batch: int | None = None,
        noise: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """`noise` (optional, [batch, H, W, F]) replaces the 'noise'-RNG
        draw — the injected-noise replay used by the torch-reference
        parity golden (record the reference's torch.randn draw, feed it
        here, compare outputs exactly)."""
        orig_shape = x.shape
        if x.ndim == 3:
            batch = x.shape[0]
            x = x.reshape(-1, x.shape[-1])
        total_nodes, features = x.shape
        batch = batch or 1
        nodes = total_nodes // batch
        if height is None or width is None:
            height, width = infer_grid_dimensions(nodes)
        if batch * height * width != total_nodes:
            raise ValueError(
                f"Dimension mismatch: batch({batch}) * height({height}) * "
                f"width({width}) != total_nodes({total_nodes})"
            )

        grid = x.reshape(batch, height, width, features)

        betas = cosine_beta_schedule(self.timesteps)
        alphas_cumprod = np.cumprod(1.0 - betas)
        t_idx = int(np.clip(t, 0, self.timesteps - 1))
        sqrt_alpha = float(np.sqrt(alphas_cumprod[t_idx]))
        sqrt_one_minus = float(np.sqrt(1.0 - alphas_cumprod[t_idx]))

        if noise is None:
            noise = jax.random.normal(
                self.make_rng("noise"), grid.shape, grid.dtype
            )
        noisy = sqrt_alpha * grid + sqrt_one_minus * noise.reshape(grid.shape)

        ys = jnp.linspace(0, 1, height)[None, :, None]
        xs = jnp.linspace(0, 1, width)[None, None, :]
        pos = jnp.stack(
            [
                jnp.broadcast_to(xs, (batch, height, width)),
                jnp.broadcast_to(ys, (batch, height, width)),
            ],
            axis=-1,
        )
        inp = jnp.concatenate([noisy, pos.astype(grid.dtype)], axis=-1)

        predicted_noise = AdaptiveUNet(out_channels=features)(inp)
        pred = (noisy - sqrt_one_minus * predicted_noise) / sqrt_alpha
        return pred.reshape(orig_shape)
