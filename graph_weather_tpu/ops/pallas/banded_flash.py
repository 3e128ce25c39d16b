"""Flash-style Pallas kernels for banded graph attention (fwd + bwd).

The XLA banded path (ops/banded_attention.py) materializes the full
[nb, H, block, block+2w] logits tensor in HBM twice (pre- and
post-softmax) — ~1.8 GB bf16 at GenCast production scale (splits 6 /
hops 6), making the op memory-bound. These kernels run the classic
flash-attention online-softmax recurrence over key tiles entirely in
VMEM: logits never touch HBM, and k/v windows are streamed tile by tile
straight from the padded arrays (no [nb, window] window copy either).

Kernel-level design choices (measured on v5e, NOTES.md):
  * Heads are processed in GROUPS inside one grid step (static python
    loop over head slices of the fused [rows, H*C] layout). The adjacency
    mask tile — a large stream shared by all heads — is fetched once per
    (block, key-tile, group) instead of once per head, and the grid
    shrinks by the group size, amortizing Mosaic loop overhead. The group
    size is chosen automatically as the largest head-count divisor whose
    VMEM footprint fits (GenCast's 15 concat blocks at C=128 fold all 4
    heads; the final averaging block at C=512 runs per-head).
  * Masking is a single additive bias (0 / -1e30) shared across the
    group's heads instead of two per-head selects; the online max starts
    at -1e28 so fully-masked rows keep p == 0 exactly (empty receiver
    rows produce exact zeros, matching segment-softmax semantics).

The backward is hand-written (standard flash bwd, Dao 2023): the forward
saves the per-row logsumexp; the bwd recomputes P tile-by-tile from
(q, k, lse) and accumulates
    dv = P^T dO,   ds = P * (dO V^T - delta),   dq = ds K,   dk = ds^T Q
with delta = rowsum(dO * O) computed in XLA. Two kernels: dq iterates key
tiles per receiver block (same layout as fwd); dk/dv iterates receiver
blocks per key tile (block-padded operands so the index maps stay affine).

Numerics match ops/banded_attention.py. Reference behavior analogue:
gencast/layers/experimental/sparse_transformer.py (reference uses
dgl.sparse bsddmm/bspmm on GPU).

Constraints (asserted): block % KT == 0 and 2*w % KT == 0 with KT=512;
the backward additionally requires w % KT == 0 and block == KT —
DeviceGraph.from_bundle rounds w up accordingly when flash is enabled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_KT = 512  # key-tile rows per inner step
_NEG = -1e30  # additive mask bias for excluded pairs
_SAFE = -1e28  # online-max init: exp(_NEG - _SAFE) == 0, no inf-inf NaNs
_VMEM_BUDGET = 11 * 2**20  # conservative: the axon helper dies past ~16 MB


def _pick_group(h: int, est_bytes) -> int:
    """Largest divisor of h whose estimated VMEM footprint fits."""
    for g in range(h, 0, -1):
        if h % g == 0 and est_bytes(g) <= _VMEM_BUDGET:
            return g
    raise ValueError(
        "flash-attention working set exceeds the VMEM budget even at head "
        f"group size 1 (est {est_bytes(1)} > {_VMEM_BUDGET} bytes); reduce "
        "block/window/head dim or use attention_impl='banded'/'segment'"
    )


def _mask_bias(mask_ref):
    # 0 where connected, -1e30 elsewhere; shared across the group's heads.
    return (mask_ref[0, :, :].astype(jnp.float32) - 1.0) * (-_NEG)


def _kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, *rest, n_kt, scale, c, with_lse
):
    if with_lse:
        lse_ref, acc, m_i, l_i = rest
    else:
        acc, m_i, l_i = rest
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m_i[...] = jnp.full_like(m_i, _SAFE)
        l_i[...] = jnp.zeros_like(l_i)

    bias = _mask_bias(mask_ref)  # [block, KT]

    for i in range(q_ref.shape[-1] // c):
        hs = slice(i * c, (i + 1) * c)
        ls = slice(i * 128, (i + 1) * 128)
        q = q_ref[0, :, hs]  # [block, C]
        k = k_ref[:, hs]  # [KT, C]
        v = v_ref[:, hs]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias

        m_prev = m_i[:, i * 128 : i * 128 + 1]  # [block, 1]
        l_prev = l_i[:, i * 128 : i * 128 + 1]
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        # m starts at _SAFE, so fully-masked rows keep exp(_NEG - m) == 0
        # (no select needed to zero masked probabilities).
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)

        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc[:, hs] = acc[:, hs] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        m_i[:, ls] = jnp.broadcast_to(m_new, (m_new.shape[0], 128))
        l_i[:, ls] = jnp.broadcast_to(l_new, (l_new.shape[0], 128))

    @pl.when(t == n_kt - 1)
    def _finish():
        for i in range(q_ref.shape[-1] // c):
            hs = slice(i * c, (i + 1) * c)
            l = l_i[:, i * 128 : i * 128 + 1]
            out = acc[:, hs] / jnp.maximum(l, 1e-30)  # empty rows: l==0 -> 0
            o_ref[0, :, hs] = out.astype(o_ref.dtype)
        if with_lse:
            # Per-row logsumexp of the masked logits, per head (broadcast
            # across its 128-lane slot). Empty rows get a large-negative
            # value; the bwd's exp(logits + bias - lse) still vanishes.
            lse_ref[0, :, :] = m_i[...] + jnp.log(jnp.maximum(l_i[...], 1e-30))


@functools.partial(
    jax.jit, static_argnames=("block", "w", "interpret")
)
def banded_flash_attention(
    q: jnp.ndarray,  # [N, H, C] (batch: vmap this function)
    k: jnp.ndarray,
    v: jnp.ndarray,
    band_masks: jnp.ndarray,  # [nb, block, block + 2w] bool/int8
    block: int,
    w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for banded_graph_attention (unbatched). Returns [N, H, C].

    Differentiable with hand-written flash backward kernels (gradients
    match the XLA banded path; tests/test_pallas_kernels.py). The bwd
    requires w % 512 == 0 and block == 512; other calls fall back to the
    XLA-banded VJP.
    """
    return _flash(q, k, v, band_masks, block, w, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, band_masks, block, w, interpret):
    return _flash_impl(q, k, v, band_masks, block, w, interpret)


def _flash_fwd(q, k, v, band_masks, block, w, interpret):
    if w % _KT != 0 or block != _KT:
        # Legacy band layout (w rounded to 256 only) or non-default block:
        # the dk/dv index maps below are exact only for block == KT, so
        # fall back to the XLA-recompute VJP.
        out = _flash_impl(q, k, v, band_masks, block, w, interpret)
        return out, (q, k, v, band_masks, None, None)
    out, lse = _flash_impl(
        q, k, v, band_masks, block, w, interpret, with_lse=True
    )
    return out, (q, k, v, band_masks, out, lse)


def _flash_bwd(block, w, interpret, res, g):
    q, k, v, band_masks, out, lse = res
    import numpy as np

    if out is None:
        from graph_weather_tpu.ops.banded_attention import banded_graph_attention

        _, pullback = jax.vjp(
            lambda a, b, c: banded_graph_attention(a, b, c, band_masks, block, w),
            q, k, v,
        )
        dq, dk, dv = pullback(g)
    else:
        dq, dk, dv = _flash_bwd_impl(
            q, k, v, band_masks, out, lse, g, block, w, interpret
        )
    return dq, dk, dv, np.zeros(band_masks.shape, jax.dtypes.float0)


_flash.defvjp(_flash_fwd, _flash_bwd)


def _pad_c(c: int, *arrays):
    """Zero-pad the head-channel dim up to the 128-lane multiple.

    Zero channels leave QK^T and the P@V columns we keep unchanged; the
    softmax scale always uses the TRUE c.
    """
    c_pad = -(-c // 128) * 128
    if c_pad == c:
        return c, arrays
    pads = ((0, 0), (0, 0), (0, c_pad - c))
    return c_pad, tuple(jnp.pad(a, pads) for a in arrays)


def _fuse_heads(t, n_rows):
    """[N, H, C] -> [n_rows(padded), H*C]."""
    n, h, c = t.shape
    return jnp.pad(t, ((0, n_rows - n), (0, 0), (0, 0))).reshape(n_rows, h * c)


def _flash_impl(q, k, v, band_masks, block, w, interpret, with_lse=False):
    n, h, c = q.shape
    nb = band_masks.shape[0]
    n_pad = nb * block
    width = block + 2 * w
    if block % _KT or (2 * w) % _KT:
        raise ValueError(f"block={block} and 2w={2*w} must be multiples of {_KT}")
    n_kt = width // _KT

    scale = 1.0 / (c**0.5)
    c_true = c
    c, (q, k, v) = _pad_c(c, q, k, v)
    hc = h * c
    dt = q.dtype.itemsize

    def est(g):
        gc = g * c
        return (
            block * gc * dt * 2  # q
            + 2 * _KT * gc * dt * 2  # k, v
            + block * _KT * 2  # mask
            + block * gc * dt * 2  # out
            + (block * g * 128 * 4 * 2 if with_lse else 0)  # lse
            + block * gc * 4  # acc scratch
            + 2 * block * g * 128 * 4  # m, l scratch
        )

    g_sz = _pick_group(h, est)
    n_g = h // g_sz
    gc = g_sz * c

    # Fused-head layouts: rows x (H*C); the group dim is blocked off the
    # lane axis by the index maps.
    q_p = _fuse_heads(q, n_pad).reshape(nb, block, hc)
    k_p = _fuse_heads(jnp.pad(k, ((w, 0), (0, 0), (0, 0))), n_pad + 2 * w)
    v_p = _fuse_heads(jnp.pad(v, ((w, 0), (0, 0), (0, 0))), n_pad + 2 * w)
    masks8 = band_masks.astype(jnp.int8)

    grid = (nb, n_g, n_kt)
    bpk = block // _KT
    out_specs = [pl.BlockSpec((1, block, gc), lambda b, g, t: (b, 0, g))]
    out_shapes = [jax.ShapeDtypeStruct((nb, block, hc), q.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((1, block, g_sz * 128), lambda b, g, t: (b, 0, g))
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((nb, block, h * 128), jnp.float32)
        )
    res = pl.pallas_call(
        functools.partial(
            _kernel, n_kt=n_kt, scale=scale, c=c, with_lse=with_lse
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block, gc), lambda b, g, t: (b, 0, g)),
            # k/v tile row start = b*block + t*KT; block % KT == 0 makes
            # the index exact in KT units.
            pl.BlockSpec((_KT, gc), lambda b, g, t: (b * bpk + t, g)),
            pl.BlockSpec((_KT, gc), lambda b, g, t: (b * bpk + t, g)),
            pl.BlockSpec((1, block, _KT), lambda b, g, t: (b, 0, t)),
        ],
        out_specs=out_specs if with_lse else out_specs[0],
        out_shape=out_shapes if with_lse else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((block, gc), jnp.float32),
            pltpu.VMEM((block, g_sz * 128), jnp.float32),
            pltpu.VMEM((block, g_sz * 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(q_p, k_p, v_p, masks8)
    if with_lse:
        out, lse = res
    else:
        out = res
    out = out.reshape(n_pad, h, c)[:n, :, :c_true]
    return (out, lse) if with_lse else out


def _dq_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref, dq_ref, acc,
    *, n_kt, scale, c,
):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    bias = _mask_bias(mask_ref)

    for i in range(q_ref.shape[-1] // c):
        hs = slice(i * c, (i + 1) * c)
        q = q_ref[0, :, hs]  # [block, C]
        k = k_ref[:, hs]  # [KT, C]
        v = v_ref[:, hs]
        do = do_ref[0, :, hs]
        lse = lse_ref[0, :, i * 128 : i * 128 + 1]  # [block, 1]
        delta = delta_ref[0, :, i * 128 : i * 128 + 1]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias
        p = jnp.exp(logits - lse)  # masked entries: exp(~-1e30) == 0
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        acc[:, hs] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(t == n_kt - 1)
    def _finish():
        dq_ref[0, :, :] = (acc[...] * scale).astype(dq_ref.dtype)


def _dkv_kernel(
    k_ref, v_ref, q_ref, mask_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_acc, dv_acc, *, n_rb, scale, c,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    bias = _mask_bias(mask_ref)

    for i in range(q_ref.shape[-1] // c):
        hs = slice(i * c, (i + 1) * c)
        k = k_ref[:, hs]  # [KT, C] keys of this global tile
        v = v_ref[:, hs]
        q = q_ref[0, :, hs]  # [block, C] receiver block (t - w/KT + j)
        do = do_ref[0, :, hs]
        lse = lse_ref[0, :, i * 128 : i * 128 + 1]
        delta = delta_ref[0, :, i * 128 : i * 128 + 1]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias
        p = jnp.exp(logits - lse)  # [block(recv), KT(key)]
        # dv[s] += sum_r p_rs dO_r -> contract over the receiver (row) dim.
        dv_acc[:, hs] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk_acc[:, hs] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_rb - 1)
    def _finish():
        dk_ref[...] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, band_masks, out, lse, g, block, w, interpret):
    n, h, c = q.shape
    nb = band_masks.shape[0]
    n_pad = nb * block
    width = block + 2 * w
    n_kt = width // _KT
    wb = w // _KT  # whole key tiles per half-window (w % KT == 0 checked)
    # block == KT makes the dk/dv receiver-block/slot index maps exact
    # (slot = 2*wb - j always lands in [0, n_kt)); _flash_fwd gates on it.
    assert w % _KT == 0 and block == _KT

    scale = 1.0 / (c**0.5)
    c_true = c
    c, (q, k, v, g_p) = _pad_c(c, q, k, v, g)
    hc = h * c
    in_dtype = q.dtype
    dt = q.dtype.itemsize

    # delta = rowsum(dO * O): cheap XLA elementwise+reduce, then laid out
    # like lse ([nb, block, H*128] broadcast across each head's lanes).
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [n, H]
    delta = jnp.pad(delta, ((0, n_pad - n), (0, 0))).reshape(nb, block, h, 1)
    delta = jnp.broadcast_to(delta, (nb, block, h, 128)).reshape(
        nb, block, h * 128
    )

    q_b = _fuse_heads(q, n_pad).reshape(nb, block, hc)
    do_b = _fuse_heads(g_p, n_pad).reshape(nb, block, hc)
    k_win = _fuse_heads(jnp.pad(k, ((w, 0), (0, 0), (0, 0))), n_pad + 2 * w)
    v_win = _fuse_heads(jnp.pad(v, ((w, 0), (0, 0), (0, 0))), n_pad + 2 * w)
    masks8 = band_masks.astype(jnp.int8)

    def est_dq(g_sz):
        gc = g_sz * c
        return (
            2 * block * gc * dt * 2  # q, do
            + 2 * _KT * gc * dt * 2  # k, v
            + block * _KT * 2  # mask
            + 2 * block * g_sz * 128 * 4 * 2  # lse, delta
            + block * gc * dt * 2  # dq out
            + block * gc * 4  # acc scratch
        )

    g_dq = _pick_group(h, est_dq)
    gc_dq = g_dq * c

    # ---- dq: same iteration space as the forward -------------------------
    bpk = block // _KT
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, n_kt=n_kt, scale=scale, c=c),
        grid=(nb, h // g_dq, n_kt),
        in_specs=[
            pl.BlockSpec((1, block, gc_dq), lambda b, g, t: (b, 0, g)),
            pl.BlockSpec((_KT, gc_dq), lambda b, g, t: (b * bpk + t, g)),
            pl.BlockSpec((_KT, gc_dq), lambda b, g, t: (b * bpk + t, g)),
            pl.BlockSpec((1, block, _KT), lambda b, g, t: (b, 0, t)),
            pl.BlockSpec((1, block, gc_dq), lambda b, g, t: (b, 0, g)),
            pl.BlockSpec((1, block, g_dq * 128), lambda b, g, t: (b, 0, g)),
            pl.BlockSpec((1, block, g_dq * 128), lambda b, g, t: (b, 0, g)),
        ],
        out_specs=pl.BlockSpec((1, block, gc_dq), lambda b, g, t: (b, 0, g)),
        out_shape=jax.ShapeDtypeStruct((nb, block, hc), in_dtype),
        scratch_shapes=[pltpu.VMEM((block, gc_dq), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(q_b, k_win, v_win, masks8, do_b, lse, delta)
    dq = dq.reshape(n_pad, h, c)[:n, :, :c_true]

    # ---- dk/dv: iterate receiver blocks per key tile ----------------------
    # Key tile t (global rows [t*KT, (t+1)*KT)) is visible to receiver
    # blocks b = t - wb + j, j in [0, 2*wb + 1); its window slot is
    # 2*wb - j. Operands are padded by `wb` blocks on each side so
    # boundary tiles read zero blocks (mask == 0 there, so their
    # contribution vanishes).
    pb = wb
    n_rb = 2 * wb + 1
    zeros_q = jnp.zeros((pb, block, hc), in_dtype)
    q_pp = jnp.concatenate([zeros_q, q_b, zeros_q], axis=0)
    do_pp = jnp.concatenate([zeros_q, do_b, zeros_q], axis=0)
    zeros_s = jnp.zeros((pb, block, h * 128), jnp.float32)
    lse_pp = jnp.concatenate([zeros_s, lse, zeros_s], axis=0)
    delta_pp = jnp.concatenate([zeros_s, delta, zeros_s], axis=0)
    zeros_m = jnp.zeros((pb, block, block + 2 * w), jnp.int8)
    masks_pp = jnp.concatenate([zeros_m, masks8, zeros_m], axis=0)

    k_g = _fuse_heads(k, n_pad)
    v_g = _fuse_heads(v, n_pad)

    n_tiles = n_pad // _KT

    def est_dkv(g_sz):
        gc = g_sz * c
        return (
            2 * _KT * gc * dt * 2  # k, v
            + 2 * block * gc * dt * 2  # q, do
            + block * _KT * 2  # mask
            + 2 * block * g_sz * 128 * 4 * 2  # lse, delta
            + 2 * _KT * gc * dt * 2  # dk, dv outs
            + 2 * _KT * gc * 4  # acc scratches
        )

    g_kv = _pick_group(h, est_dkv)
    gc_kv = g_kv * c

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, n_rb=n_rb, scale=scale, c=c),
        grid=(n_tiles, h // g_kv, n_rb),
        in_specs=[
            pl.BlockSpec((_KT, gc_kv), lambda t, g, j: (t, g)),
            pl.BlockSpec((_KT, gc_kv), lambda t, g, j: (t, g)),
            pl.BlockSpec((1, block, gc_kv), lambda t, g, j: (t + j, 0, g)),
            # mask slot in KT units: 2*wb - j (see comment above).
            pl.BlockSpec(
                (1, block, _KT), lambda t, g, j: (t + j, 0, 2 * wb - j)
            ),
            pl.BlockSpec((1, block, gc_kv), lambda t, g, j: (t + j, 0, g)),
            pl.BlockSpec(
                (1, block, g_kv * 128), lambda t, g, j: (t + j, 0, g)
            ),
            pl.BlockSpec(
                (1, block, g_kv * 128), lambda t, g, j: (t + j, 0, g)
            ),
        ],
        out_specs=[
            pl.BlockSpec((_KT, gc_kv), lambda t, g, j: (t, g)),
            pl.BlockSpec((_KT, gc_kv), lambda t, g, j: (t, g)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, hc), in_dtype),
            jax.ShapeDtypeStruct((n_pad, hc), in_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((_KT, gc_kv), jnp.float32),
            pltpu.VMEM((_KT, gc_kv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(k_g, v_g, q_pp, masks_pp, do_pp, lse_pp, delta_pp)
    dk = dk.reshape(n_pad, h, c)[:n, :, :c_true]
    dv = dv.reshape(n_pad, h, c)[:n, :, :c_true]
    return dq, dk, dv
