"""FengWu-GHR layers: ViT image model + kNN-interpolated meta-model.

Equivalent of reference models/fengwu_ghr/layers.py:1-391. TPU-native
differences: the kNN assignment is precomputed on the host once per
(source, target) position set (the positions are static; the reference
recomputes PyG knn on every forward, layers.py:297-308) and applied on
device as a static gather + inverse-squared-distance weighted scatter;
LoRA is functional parameter merging (see nn/lora.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from graph_weather_tpu.nn.mlp import TorchLinear


def pair(t):
    return t if isinstance(t, tuple) else (t, t)


class KNNInterpolator:
    """Static k-nearest-neighbor interpolation between fixed position sets.

    Host precompute: for every target position, its k nearest sources and
    1/d^2 weights. Device apply: gather + weighted mean over k (pure XLA,
    differentiable in the features).
    """

    def __init__(self, pos_source: np.ndarray, pos_target: np.ndarray, k: int = 4):
        pos_source = np.asarray(pos_source, dtype=np.float64)
        pos_target = np.asarray(pos_target, dtype=np.float64)
        k = min(k, pos_source.shape[0])
        tree = cKDTree(pos_source)
        dist, idx = tree.query(pos_target, k=k)
        if k == 1:
            dist, idx = dist[:, None], idx[:, None]
        weights = 1.0 / np.maximum(dist**2, 1e-16)
        self.idx = jnp.asarray(idx.astype(np.int32))  # [Nt, k]
        self.weights = jnp.asarray(
            (weights / weights.sum(axis=1, keepdims=True)).astype(np.float32)
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[Ns, F] (or [..., Ns, F]) -> [Nt, F] interpolated features."""
        gathered = jnp.take(x, self.idx, axis=-2)  # [..., Nt, k, F]
        return jnp.sum(gathered * self.weights[..., None], axis=-2)


def knn_interpolate(
    x: jnp.ndarray, pos_x: np.ndarray, pos_y: np.ndarray, k: int = 4
) -> jnp.ndarray:
    """One-shot interpolation of features at pos_x onto pos_y (reference
    layers.py:13-31)."""
    return KNNInterpolator(pos_x, pos_y, k)(x)


def posemb_sincos_2d(h: int, w: int, dim: int, temperature: int = 10000) -> np.ndarray:
    """2D sin/cos positional embedding [h*w, dim] (reference layers.py:34-43)."""
    if dim % 4 != 0:
        raise ValueError("feature dimension must be multiple of 4 for sincos emb")
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    omega = np.arange(dim // 4) / (dim // 4 - 1)
    omega = 1.0 / (temperature**omega)
    y = y.reshape(-1)[:, None] * omega[None, :]
    x = x.reshape(-1)[:, None] * omega[None, :]
    return np.concatenate(
        [np.sin(x), np.cos(x), np.sin(y), np.cos(y)], axis=1
    ).astype(np.float32)


class _Attention(nn.Module):
    """Pre-norm multi-head attention (reference layers.py:63-88)."""

    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        xn = nn.LayerNorm(epsilon=1e-5)(x)
        qkv = TorchLinear(inner * 3, use_bias=False)(xn)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return jnp.moveaxis(
                t.reshape(t.shape[:-1] + (self.heads, self.dim_head)), -2, -3
            )

        q, k, v = map(heads, (q, k, v))
        attn = nn.softmax(
            jnp.einsum("...hnd,...hmd->...hnm", q, k) * self.dim_head**-0.5, axis=-1
        )
        out = jnp.einsum("...hnm,...hmd->...hnd", attn, v)
        out = jnp.moveaxis(out, -3, -2).reshape(x.shape[:-1] + (inner,))
        return TorchLinear(dim, use_bias=False)(out)


class _FeedForward(nn.Module):
    hidden_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        x = nn.LayerNorm(epsilon=1e-5)(x)
        x = nn.gelu(TorchLinear(self.hidden_dim)(x), approximate=False)
        return TorchLinear(dim)(x)


class Transformer(nn.Module):
    """ViT transformer; with res=True, adds per-depth cross-window local
    attention over the scale-factor window grid (reference layers.py:91-148).
    """

    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    res: bool = False
    image_size: Optional[tuple[int, int]] = None
    scale_factor: Optional[tuple[int, int]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for _ in range(self.depth):
            x = _Attention(self.heads, self.dim_head)(x) + x
            x = _FeedForward(self.mlp_dim)(x) + x
            if self.res:
                h, w = self.image_size
                s_h, s_w = self.scale_factor
                bw, n, d = x.shape  # bw = b * s_h * s_w, n = h * w
                b = bw // (s_h * s_w)
                # (b s_h s_w) (h w) d -> (b h w) (s_h s_w) d
                t = x.reshape(b, s_h, s_w, h, w, d)
                t = jnp.transpose(t, (0, 3, 4, 1, 2, 5)).reshape(
                    b * h * w, s_h * s_w, d
                )
                t = _Attention(self.heads, self.dim_head)(t) + t
                t = t.reshape(b, h, w, s_h, s_w, d)
                x = jnp.transpose(t, (0, 3, 4, 1, 2, 5)).reshape(bw, n, d)
        return nn.LayerNorm(epsilon=1e-5)(x)


class ImageMetaModel(nn.Module):
    """ViT over [B, C, H, W] images: patch embed + sincos posemb +
    transformer + unpatch (reference layers.py:151-242). Latent dim equals
    the patch dim so the output reshapes back to the input shape.
    """

    image_size: tuple | int
    patch_size: tuple | int
    depth: int
    heads: int
    mlp_dim: int
    channels: int
    dim_head: int = 64
    res: bool = False
    scale_factor: Optional[tuple | int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        if x.shape[1] != self.channels:
            raise ValueError("Wrong number of channels")
        if ih % ph or iw % pw:
            raise ValueError("Image dimensions must be divisible by the patch size.")
        b = x.shape[0]
        gh, gw = ih // ph, iw // pw
        patch_dim = self.channels * ph * pw

        # b c (gh ph) (gw pw) -> b (gh gw) (ph pw c)
        t = x.reshape(b, self.channels, gh, ph, gw, pw)
        t = jnp.transpose(t, (0, 2, 4, 3, 5, 1)).reshape(b, gh * gw, patch_dim)
        t = nn.LayerNorm(epsilon=1e-5)(t)
        t = TorchLinear(patch_dim)(t)
        t = nn.LayerNorm(epsilon=1e-5)(t)

        t = t + jnp.asarray(posemb_sincos_2d(gh, gw, patch_dim))

        t = Transformer(
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            res=self.res,
            image_size=(gh, gw),
            scale_factor=pair(self.scale_factor) if self.res else None,
        )(t)

        # b (gh gw) (ph pw c) -> b c (gh ph) (gw pw)
        t = t.reshape(b, gh, gw, ph, pw, self.channels)
        return jnp.transpose(t, (0, 5, 1, 3, 2, 4)).reshape(b, self.channels, ih, iw)


class WrapperImageModel(nn.Module):
    """Scale a trained ImageMetaModel to (s_h x s_w) higher resolution by
    window-batching (reference layers.py:245-262). Load the base model's
    params into this module's param tree (the res-attention layers are new).
    """

    image_size: tuple | int
    patch_size: tuple | int
    depth: int
    heads: int
    mlp_dim: int
    channels: int
    dim_head: int = 64
    scale_factor: tuple | int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s_h, s_w = pair(self.scale_factor)
        b, c, hh, ww = x.shape
        h, w = hh // s_h, ww // s_w
        # b c (h s_h) (w s_w) -> (b s_h s_w) c h w
        t = x.reshape(b, c, h, s_h, w, s_w)
        t = jnp.transpose(t, (0, 3, 5, 1, 2, 4)).reshape(b * s_h * s_w, c, h, w)
        t = ImageMetaModel(
            image_size=self.image_size,
            patch_size=self.patch_size,
            depth=self.depth,
            heads=self.heads,
            mlp_dim=self.mlp_dim,
            channels=self.channels,
            dim_head=self.dim_head,
            res=True,
            scale_factor=(s_h, s_w),
            name="image_meta_model",
        )(t)
        t = t.reshape(b, s_h, s_w, c, h, w)
        return jnp.transpose(t, (0, 3, 4, 1, 5, 2)).reshape(b, c, hh, ww)


def _meta_grid(i_h: int, i_w: int) -> np.ndarray:
    """The reference MetaModel's integer lat/lon target grid
    (layers.py:282-285)."""
    lats = (np.arange(-i_h / 2, i_h / 2, 1) / i_h * 180).astype(np.int64)
    lons = (np.arange(0, i_w, 1) / i_w * 360).astype(np.int64)
    grid = np.stack(np.meshgrid(lats, lons, indexing="ij"), axis=-1)
    return grid.reshape(-1, 2).astype(np.float64)


class MetaModel:
    """kNN-interpolate lat_lons -> regular grid -> ViT -> interpolate back.

    Handle class (owns static interpolators + the flax ImageMetaModel).
    """

    def __init__(
        self,
        lat_lons: list,
        image_size,
        patch_size,
        depth: int,
        heads: int,
        mlp_dim: int,
        channels: int,
        dim_head: int = 64,
    ):
        self.i_h, self.i_w = pair(image_size)
        self.channels = channels
        pos_x = np.asarray(lat_lons, dtype=np.float64)
        pos_y = _meta_grid(self.i_h, self.i_w)
        self.to_grid = KNNInterpolator(pos_x, pos_y)
        self.from_grid = KNNInterpolator(pos_y, pos_x)
        self.module = ImageMetaModel(
            image_size=image_size,
            patch_size=patch_size,
            depth=depth,
            heads=heads,
            mlp_dim=mlp_dim,
            channels=channels,
            dim_head=dim_head,
        )
        self._jit_apply = None

    def init(self, rng: jax.Array, batch_size: int = 1):
        dummy = jnp.zeros((batch_size, self.channels, self.i_h, self.i_w))
        return jax.jit(self.module.init)(rng, dummy)

    def forward_fn(self):
        module, to_grid, from_grid = self.module, self.to_grid, self.from_grid
        i_h, i_w = self.i_h, self.i_w

        def fn(params, x):  # x: [B, N, C]
            b, n, c = x.shape
            t = jnp.transpose(x, (1, 0, 2)).reshape(n, b * c)
            t = to_grid(t)
            t = t.reshape(i_h, i_w, b, c)
            t = jnp.transpose(t, (2, 3, 0, 1))  # [B, C, H, W]
            t = module.apply(params, t)
            t = jnp.transpose(t, (2, 3, 0, 1)).reshape(i_h * i_w, b * c)
            t = from_grid(t)
            return jnp.transpose(t.reshape(n, b, c), (1, 0, 2))

        return fn

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        if self._jit_apply is None:
            self._jit_apply = jax.jit(self.forward_fn())
        return self._jit_apply(params, x)

    def __call__(self, params, x):
        return self.apply(params, x)


class WrapperMetaModel:
    """Scaled-resolution MetaModel (reference layers.py:311-348)."""

    def __init__(self, lat_lons: list, meta_model: MetaModel, scale_factor):
        s_h, s_w = pair(scale_factor)
        self.i_h, self.i_w = meta_model.i_h * s_h, meta_model.i_w * s_w
        self.channels = meta_model.channels
        pos_x = np.asarray(lat_lons, dtype=np.float64)
        pos_y = _meta_grid(self.i_h, self.i_w)
        self.to_grid = KNNInterpolator(pos_x, pos_y)
        self.from_grid = KNNInterpolator(pos_y, pos_x)
        imm = meta_model.module
        self.module = WrapperImageModel(
            image_size=imm.image_size,
            patch_size=imm.patch_size,
            depth=imm.depth,
            heads=imm.heads,
            mlp_dim=imm.mlp_dim,
            channels=imm.channels,
            dim_head=imm.dim_head,
            scale_factor=(s_h, s_w),
        )
        self._jit_apply = None

    def init(self, rng: jax.Array, batch_size: int = 1):
        dummy = jnp.zeros((batch_size, self.channels, self.i_h, self.i_w))
        return jax.jit(self.module.init)(rng, dummy)

    def load_base_params(self, wrapper_params, base_params):
        """Copy the trained base ImageMetaModel params into the wrapper tree
        (the res-attention layers keep their fresh init) — the JAX analogue
        of load_state_dict(strict=False) (reference layers.py:254)."""
        import flax

        wp = flax.core.unfreeze(wrapper_params)
        bp = flax.core.unfreeze(base_params)

        def merge(dst, src):
            for k, v in src.items():
                if k in dst:
                    if isinstance(v, dict):
                        merge(dst[k], v)
                    elif dst[k].shape == v.shape:
                        dst[k] = v
        merge(wp["params"]["image_meta_model"], bp["params"])
        return wp

    def forward_fn(self):
        module, to_grid, from_grid = self.module, self.to_grid, self.from_grid
        i_h, i_w = self.i_h, self.i_w

        def fn(params, x):  # x: [B, N, C]
            b, n, c = x.shape
            t = jnp.transpose(x, (1, 0, 2)).reshape(n, b * c)
            t = to_grid(t)
            t = t.reshape(i_h, i_w, b, c)
            t = jnp.transpose(t, (2, 3, 0, 1))
            t = module.apply(params, t)
            t = jnp.transpose(t, (2, 3, 0, 1)).reshape(i_h * i_w, b * c)
            t = from_grid(t)
            return jnp.transpose(t.reshape(n, b, c), (1, 0, 2))

        return fn

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        if self._jit_apply is None:
            self._jit_apply = jax.jit(self.forward_fn())
        return self._jit_apply(params, x)

    def __call__(self, params, x):
        return self.apply(params, x)
