"""3D neighborhood attention (TPU-native NATTEN equivalent).

Replaces the CUDA `natten.NeighborhoodAttention3D` used by WeatherMesh
(reference models/weathermesh/{encoder,processor,decoder}.py). Semantics
match NATTEN: every query attends to exactly kernel_size neighbors; near
boundaries the window CLAMPS (slides inward, "bump" behavior), and a
learnable relative-position bias indexed by (key - query) offset is added.

Implementation: windows are materialized with three static axis-gathers
(jnp.take with precomputable index tables), logits/softmax/weighted-sum are
einsums. This is fully fused by XLA at moderate latent sizes; a blocked
Pallas kernel with halo-in-VMEM is the planned upgrade for very large
grids. Optional circular wrapping on the last (longitude) axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _window_indices(size: int, kernel: int, circular: bool) -> tuple[np.ndarray, np.ndarray]:
    """([size, kernel] gather indices, [size, kernel] relative-offset ids).

    Clamped: window start = clip(i - kernel//2, 0, size - kernel).
    Circular: window wraps (indices mod size); requires kernel <= size.
    Relative ids are (index - i) + kernel - 1 in [0, 2 kernel - 2].
    """
    if kernel > size:
        raise ValueError(f"kernel ({kernel}) must be <= axis size ({size})")
    i = np.arange(size)[:, None]
    k = np.arange(kernel)[None, :]
    if circular:
        idx = (i - kernel // 2 + k) % size
        rel = k - kernel // 2 + kernel - 1  # constant per slot
        rel = np.broadcast_to(rel, (size, kernel)).copy()
    else:
        start = np.clip(i - kernel // 2, 0, size - kernel)
        idx = start + k
        rel = idx - i + kernel - 1
    return idx.astype(np.int32), rel.astype(np.int32)


def neighborhood_attention_3d(
    q: jnp.ndarray,  # [B, D, H, W, heads, ch]
    k: jnp.ndarray,
    v: jnp.ndarray,
    kernel: tuple[int, int, int],
    rpb: jnp.ndarray | None = None,  # [heads, 2Kd-1, 2Kh-1, 2Kw-1]
    circular_w: bool = False,
) -> jnp.ndarray:
    """Returns [B, D, H, W, heads, ch]."""
    b, d, h, w, heads, ch = q.shape
    kd, kh, kw = kernel
    idx_d, rel_d = _window_indices(d, kd, False)
    idx_h, rel_h = _window_indices(h, kh, False)
    idx_w, rel_w = _window_indices(w, kw, circular_w)

    # Gather windows one axis at a time.
    def windows(t):
        t = jnp.take(t, jnp.asarray(idx_d), axis=1)  # [B, D, Kd, H, W, n, c]
        t = jnp.take(t, jnp.asarray(idx_h), axis=3)  # [B, D, Kd, H, Kh, W, n, c]
        t = jnp.take(t, jnp.asarray(idx_w), axis=5)  # [B, D, Kd, H, Kh, W, Kw, n, c]
        return t

    k_win = windows(k)
    v_win = windows(v)

    scale = ch**-0.5
    logits = jnp.einsum(
        "bdhwnc,bdxhywznc->bdhwnxyz", q * scale, k_win
    )  # [B, D, H, W, heads, Kd, Kh, Kw]

    if rpb is not None:
        # rpb gathered per axis: [heads, D, Kd, H, Kh, W, Kw]
        bias = rpb[:, jnp.asarray(rel_d)]  # [n, D, Kd, 2Kh-1, 2Kw-1]
        bias = jnp.moveaxis(bias, 3, 3)
        bias = bias[:, :, :, jnp.asarray(rel_h)]  # [n, D, Kd, H, Kh, 2Kw-1]
        bias = bias[..., jnp.asarray(rel_w)]  # [n, D, Kd, H, Kh, W, Kw]
        bias = jnp.transpose(bias, (1, 3, 5, 0, 2, 4, 6))  # [D,H,W,n,Kd,Kh,Kw]
        logits = logits + bias[None]

    flat = logits.reshape(logits.shape[:5] + (kd * kh * kw,))
    attn = jnp.exp(flat - flat.max(axis=-1, keepdims=True))
    attn = attn / attn.sum(axis=-1, keepdims=True)
    attn = attn.reshape(logits.shape)

    out = jnp.einsum("bdhwnxyz,bdxhywznc->bdhwnc", attn, v_win)
    return out
