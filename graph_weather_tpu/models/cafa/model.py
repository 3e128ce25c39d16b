"""CaFA model (see package docstring). Public tensors are NCHW like the
reference (model.py:66-93); internals are NHWC."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from graph_weather_tpu.nn.mlp import TorchLinear


class AxialAttention(nn.Module):
    """Multi-head self-attention along one spatial axis of an NHWC map.

    Reference models/cafa/factorize.py:26-81. axis=1 attends along height,
    axis=2 along width; the other axis folds into the batch.
    """

    heads: int
    dim_head: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, axis: int) -> jnp.ndarray:
        if axis not in (1, 2):
            raise ValueError("Axis must be 1 (height) or 2 (width)")
        b, h, w, d = x.shape
        inner = self.heads * self.dim_head

        qkv = TorchLinear(inner * 3, use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            # [B, H, W, inner] -> [B, heads, H, W, dim_head]
            t = t.reshape(b, h, w, self.heads, self.dim_head)
            return jnp.moveaxis(t, 3, 1)

        q, k, v = map(to_heads, (q, k, v))
        scale = self.dim_head**-0.5
        # attention along `axis` (H -> einsum index i/j over H; W analogous)
        if axis == 1:
            sim = jnp.einsum("bnhwd,bngwd->bnwhg", q, k) * scale
            attn = nn.softmax(sim, axis=-1)
            out = jnp.einsum("bnwhg,bngwd->bnhwd", attn, v)
        else:
            sim = jnp.einsum("bnhwd,bnhgd->bnhwg", q, k) * scale
            attn = nn.softmax(sim, axis=-1)
            out = jnp.einsum("bnhwg,bnhgd->bnhwd", attn, v)
        out = jnp.moveaxis(out, 1, 3).reshape(b, h, w, inner)
        return TorchLinear(x.shape[-1])(out)


class FactorizedAttention(nn.Module):
    """Pre-norm height attention then pre-norm width attention, residual."""

    heads: int
    dim_head: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x + AxialAttention(self.heads, self.dim_head)(
            nn.LayerNorm(epsilon=1e-5)(x), axis=1
        )
        x = x + AxialAttention(self.heads, self.dim_head)(
            nn.LayerNorm(epsilon=1e-5)(x), axis=2
        )
        return x


class FeedForward(nn.Module):
    multiplier: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        x = nn.gelu(TorchLinear(int(dim * self.multiplier))(x), approximate=False)
        return TorchLinear(dim)(x)


class FactorizedTransformerBlock(nn.Module):
    heads: int
    dim_head: int = 64
    feedforward_multiplier: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x + FactorizedAttention(self.heads, self.dim_head)(
            nn.LayerNorm(epsilon=1e-5)(x)
        )
        x = x + FeedForward(self.feedforward_multiplier)(
            nn.LayerNorm(epsilon=1e-5)(x)
        )
        return x


class CaFAEncoder(nn.Module):
    """Strided conv downsampling encoder (NHWC)."""

    model_dim: int
    downsampling_factor: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.downsampling_factor
        return nn.Conv(
            self.model_dim, kernel_size=(k, k), strides=(k, k), padding="VALID"
        )(x)


class CaFADecoder(nn.Module):
    """Transposed-conv upsampling decoder (NHWC)."""

    output_channels: int
    upsampling_factor: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.upsampling_factor
        return nn.ConvTranspose(
            self.output_channels, kernel_size=(k, k), strides=(k, k), padding="VALID"
        )(x)


class CaFAProcessor(nn.Module):
    depth: int
    heads: int
    dim_head: int = 64
    feedforward_multiplier: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for _ in range(self.depth):
            x = FactorizedTransformerBlock(
                self.heads, self.dim_head, self.feedforward_multiplier
            )(x)
        return x


class CaFAForecaster(nn.Module):
    """End-to-end CaFA: [B, C_in, H, W] -> [B, C_out, H, W] (NCHW API)."""

    input_channels: int
    output_channels: int
    model_dim: int = 256
    downsampling_factor: int = 2
    processor_depth: int = 6
    num_heads: int = 8
    dim_head: int = 64
    feedforward_multiplier: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        _, _, h, w = x.shape
        f = self.downsampling_factor
        pad_h = (f - h % f) % f
        pad_w = (f - w % f) % f

        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

        x = CaFAEncoder(self.model_dim, f)(x)
        x = CaFAProcessor(
            self.processor_depth,
            self.num_heads,
            self.dim_head,
            self.feedforward_multiplier,
        )(x)
        x = CaFADecoder(self.output_channels, f)(x)

        if pad_h or pad_w:
            x = x[:, :h, :w]
        return jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW
