"""Standalone Aurora modules: Swin3DEncoder, PerceiverProcessor, Decoder3D.

References: models/aurora/encoder.py, processor.py, decoder.py. Layouts are
channels-last internally; public shapes follow the reference contracts
(Swin3DEncoder and Decoder3D speak torch NCDHW at the boundary).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from graph_weather_tpu.nn.mlp import TorchLinear


class _TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer semantics (post-norm)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        attended = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model
        )(x, x, mask=mask)
        x = nn.LayerNorm(epsilon=1e-5)(x + attended)
        act = nn.relu if self.activation == "relu" else (
            lambda x: nn.gelu(x, approximate=False)
        )
        h = act(TorchLinear(self.dim_feedforward)(x))
        h = TorchLinear(self.d_model)(h)
        return nn.LayerNorm(epsilon=1e-5)(x + h)


class Swin3DEncoder(nn.Module):
    """Conv3d feature extraction + LayerNorm + 4-layer transformer encoder.

    Input [B, C, D, H, W] (torch layout); output [B, D*H*W, embed_dim].
    """

    in_channels: int = 1
    embed_dim: int = 96

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.transpose(x, (0, 2, 3, 4, 1))  # -> [B, D, H, W, C]
        x = nn.Conv(self.embed_dim, kernel_size=(3, 3, 3))(x)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        b, d, h, w, c = x.shape
        x = x.reshape(b, d * h * w, c)
        for _ in range(4):
            x = _TransformerEncoderLayer(
                self.embed_dim, nhead=8, dim_feedforward=self.embed_dim * 4
            )(x)
        return x


@dataclass
class ProcessorConfig:
    """Reference models/aurora/processor.py:16-41 (incl. validation)."""

    input_dim: int = 256
    latent_dim: int = 512
    d_model: int = 256
    max_seq_len: int = 4096
    num_self_attention_layers: int = 6
    num_cross_attention_layers: int = 2
    num_attention_heads: int = 8
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    qk_head_dim: Optional[int] = 32
    activation_fn: str = "gelu"
    layer_norm_eps: float = 1e-12

    def __post_init__(self):
        if self.input_dim <= 0:
            raise ValueError("input_dim must be positive")
        if self.max_seq_len <= 0:
            raise ValueError("max_seq_len must be positive")
        if self.num_attention_heads <= 0:
            raise ValueError("num_attention_heads must be positive")
        if not 0 <= self.hidden_dropout <= 1:
            raise ValueError("hidden_dropout must be between 0 and 1")
        if not 0 <= self.attention_dropout <= 1:
            raise ValueError("attention_dropout must be between 0 and 1")


class PerceiverProcessor(nn.Module):
    """Input proj -> transformer encoder -> latent proj -> mean pool.

    [B, S, input_dim] -> [B, latent_dim]. Optional [B, S] attention mask.
    """

    config: ProcessorConfig = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        cfg = self.config or ProcessorConfig()
        x = TorchLinear(cfg.d_model)(x)
        mask = None
        if attention_mask is not None:
            # [B, S] keep-mask -> [B, 1, S_q, S_kv] attention mask
            mask = attention_mask[:, None, None, :]
            mask = jnp.broadcast_to(
                mask, (x.shape[0], 1, x.shape[1], x.shape[1])
            )
        for _ in range(cfg.num_self_attention_layers):
            x = _TransformerEncoderLayer(
                cfg.d_model,
                nhead=cfg.num_attention_heads,
                dim_feedforward=cfg.d_model * 4,
                activation=cfg.activation_fn,
            )(x, mask=mask)
        x = TorchLinear(cfg.latent_dim)(x)
        return x.mean(axis=1)


class Decoder3D(nn.Module):
    """Latent sequence -> 3D volume via transposed conv.

    [B, D*H*W, embed_dim] -> [B, output_channels, D, H, W] (torch layout).
    The reference reinterprets the flat buffer with .view (a silent axis
    scramble, decoder.py:46); here the sequence axis maps to (D, H, W)
    properly.
    """

    output_channels: int = 1
    embed_dim: int = 96
    target_shape: tuple[int, int, int] = (32, 32, 32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        d, h, w = self.target_shape
        if x.shape[1] != d * h * w:
            raise ValueError(
                f"sequence length {x.shape[1]} != target volume {d}*{h}*{w}"
            )
        x = x.reshape(b, d, h, w, self.embed_dim)
        x = nn.ConvTranspose(self.output_channels, kernel_size=(3, 3, 3))(x)
        return jnp.transpose(x, (0, 4, 1, 2, 3))
