"""3D neighborhood attention (TPU-native NATTEN equivalent).

Replaces the CUDA `natten.NeighborhoodAttention3D` used by WeatherMesh
(reference models/weathermesh/{encoder,processor,decoder}.py). Semantics
match NATTEN: every query attends to exactly kernel_size neighbors; near
boundaries the window CLAMPS (slides inward, "bump" behavior), and a
learnable relative-position bias indexed by (key - query) offset is added.

Implementation: a `lax.scan` over the Kd*Kh*Kw window SLOTS with online
(flash-style) softmax accumulation — per step one axis-gathered key/value
volume, so peak memory is O(volume), independent of the window size. The
earlier implementation materialized all windows at once
([..., Kd, Kh, Kw, ...] = window x volume memory), which blew past VMEM
planning at production WeatherMesh scales (25 levels x 1 degree,
kernel (3,5,5) = 75x). Optional circular wrapping on the last
(longitude) axis.
"""

from __future__ import annotations

import jax
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
    impl: str = "auto",
) -> jnp.ndarray:
    """Returns [B, D, H, W, heads, ch].

    impl: "auto" uses, in order of preference on TPU, the block-dense
    halo flash kernel (ops/pallas/natten_flash.py), then the slot-serial
    halo-in-VMEM kernel (ops/pallas/natten3d.py) when the shape
    qualifies, falling back to the XLA slot-scan; "flash"/"pallas"/"xla"
    force a path ("pallas" = the slot kernel, kept for comparison). The
    flash path has a hand-written flash backward kernel (saved
    logsumexp, recompute-P, halo scatter-add, translation-invariant
    drpb); the slot kernel's backward differentiates the XLA
    implementation (same function) — gradients are exact either way.
    """
    if impl not in ("auto", "flash", "pallas", "xla"):
        raise ValueError(f"unknown impl {impl!r}")
    on_tpu = jax.default_backend() == "tpu"
    if impl in ("auto", "flash") and (on_tpu or impl == "flash"):
        from graph_weather_tpu.ops.pallas.natten_flash import (
            neighborhood_attention_3d_flash,
        )

        try:
            return neighborhood_attention_3d_flash(
                q, k, v, tuple(kernel), rpb, circular_w,
                interpret=not on_tpu,
            )
        except ValueError:
            if impl == "flash":
                raise
    if impl in ("auto", "pallas"):
        from graph_weather_tpu.ops.pallas.natten3d import (
            neighborhood_attention_3d_pallas,
        )

        try:
            if impl == "pallas" or on_tpu:
                return neighborhood_attention_3d_pallas(
                    q, k, v, tuple(kernel), rpb, circular_w,
                    interpret=not on_tpu,
                )
        except ValueError:
            if impl == "pallas":
                raise
    return neighborhood_attention_3d_xla(q, k, v, kernel, rpb, circular_w)


def neighborhood_attention_3d_xla(
    q: jnp.ndarray,  # [B, D, H, W, heads, ch]
    k: jnp.ndarray,
    v: jnp.ndarray,
    kernel: tuple[int, int, int],
    rpb: jnp.ndarray | None = None,  # [heads, 2Kd-1, 2Kh-1, 2Kw-1]
    circular_w: bool = False,
) -> jnp.ndarray:
    """XLA slot-scan implementation (O(volume) memory, differentiable)."""
    b, d, h, w, heads, ch = q.shape
    kd, kh, kw = kernel
    idx_d, rel_d = _window_indices(d, kd, False)
    idx_h, rel_h = _window_indices(h, kh, False)
    idx_w, rel_w = _window_indices(w, kw, circular_w)

    # Per-slot gather tables, stacked over the flattened window slot axis:
    # slot s = (x, y, z) -> index vectors [D], [H], [W].
    slots = [(x, y, z) for x in range(kd) for y in range(kh) for z in range(kw)]
    tab_d = jnp.asarray(np.stack([idx_d[:, x] for x, _, _ in slots]))  # [K, D]
    tab_h = jnp.asarray(np.stack([idx_h[:, y] for _, y, _ in slots]))  # [K, H]
    tab_w = jnp.asarray(np.stack([idx_w[:, z] for _, _, z in slots]))  # [K, W]
    rtab_d = jnp.asarray(np.stack([rel_d[:, x] for x, _, _ in slots]))
    rtab_h = jnp.asarray(np.stack([rel_h[:, y] for _, y, _ in slots]))
    rtab_w = jnp.asarray(np.stack([rel_w[:, z] for _, _, z in slots]))

    scale = ch**-0.5
    qs = (q * scale).astype(jnp.float32)
    neg = jnp.float32(-1e30)

    def slot_logits(s):
        """One window slot: gathered K volume -> logits + bias [B,D,H,W,n].

        Per-axis takes, NOT one fused flat gather: axis-takes are
        structured block copies XLA handles near bandwidth, while a flat
        [D*H*W]-index gather of tiny rows measured 4.4x slower on v5e."""
        ks = jnp.take(k, tab_d[s], axis=1)
        ks = jnp.take(ks, tab_h[s], axis=2)
        ks = jnp.take(ks, tab_w[s], axis=3)
        logits = jnp.einsum("bdhwnc,bdhwnc->bdhwn", qs, ks.astype(jnp.float32))
        if rpb is not None:
            bias = rpb[:, rtab_d[s]]  # [n, D, 2Kh-1, 2Kw-1]
            bias = bias[:, :, rtab_h[s]]  # [n, D, H, 2Kw-1]
            bias = bias[:, :, :, rtab_w[s]]  # [n, D, H, W]
            logits = logits + jnp.transpose(bias, (1, 2, 3, 0))[None].astype(
                jnp.float32
            )
        vs = jnp.take(v, tab_d[s], axis=1)
        vs = jnp.take(vs, tab_h[s], axis=2)
        vs = jnp.take(vs, tab_w[s], axis=3)
        return logits, vs

    def step(carry, s):
        m, l, acc = carry
        logits, vs = slot_logits(s)
        m_new = jnp.maximum(m, logits)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new)
        l_new = l * alpha + p
        acc_new = acc * alpha[..., None] + p[..., None] * vs.astype(jnp.float32)
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((b, d, h, w, heads), neg, jnp.float32)
    l0 = jnp.zeros((b, d, h, w, heads), jnp.float32)
    acc0 = jnp.zeros((b, d, h, w, heads, ch), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(
        step, (m0, l0, acc0), jnp.arange(len(slots))
    )
    return (acc / l[..., None]).astype(q.dtype)
