"""Clustered (gathered-neighbor) flash attention for static graphs.

Companion to ops/pallas/banded_flash.py, replacing the global band window
with per-receiver-block neighbor unions (meshes/clustering.py): nodes are
RCB-ordered so each `block` of receivers is a compact geodesic patch, K/V
rows for its neighbor union are gathered once per call in XLA (a tiny,
block-deduplicated gather — ~3N rows at GenCast splits-6 scale, NOT the
~126N of the segment path), and the kernel runs dense masked online-
softmax attention of the block against its own union. At splits 6 the
window shrinks from 5,632 banded keys to <=1,536 gathered keys (4.4x
less VPU/MXU work; the banded kernel is VPU-bound on masked-out softmax
lanes — NOTES.md).

Backward, general graphs: ONE kernel produces dq (accumulated over key
tiles) and the block-local dk/dv tiles (each key tile is consumed only by
its own block, so no cross-block accumulation); block-local dk/dv are
scatter-added back to global rows with an XLA segment_sum over the gather
ids.

Backward, SYMMETRIC graphs (`symmetric=True`, e.g. the k-hop mesh graph):
the scatter is eliminated entirely. For a symmetric edge list the set of
receivers attending block b's keys IS block b's neighbor union, and the
existing [block, U_pad] mask read as [keys, receivers] is exactly the
transposed adjacency — so a second "dkv" kernel iterates KEY blocks,
gathers the union's q/do/lse/delta rows (the same cheap gather shape as
the forward's k/v gather), and writes dk/dv DIRECTLY at their global
block positions. Measured on v5e at GenCast splits-6 scale the dk/dv
segment_sum was ~6.6 ms/layer — the largest single term of the training
backward (NOTES.md).

Numerics match segment softmax exactly (same per-receiver support; empty
receivers produce exact zeros). Works for ARBITRARY static graphs —
bandedness is not required.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graph_weather_tpu.ops.pallas.banded_flash import (
    _KT,
    _NEG,
    _SAFE,
    _VMEM_BUDGET,
    _mask_bias,
    _pick_group,
)


def _fwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, *rest, n_ut, scale, c, with_lse
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
        q = q_ref[0, :, hs]
        k = k_ref[0, :, hs]  # [KT, C] gathered keys of this block
        v = v_ref[0, :, hs]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias
        m_prev = m_i[:, i * 128 : i * 128 + 1]
        l_prev = l_i[:, i * 128 : i * 128 + 1]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc[:, hs] = acc[:, hs] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        m_i[:, ls] = jnp.broadcast_to(m_new, (m_new.shape[0], 128))
        l_i[:, ls] = jnp.broadcast_to(l_new, (l_new.shape[0], 128))

    @pl.when(t == n_ut - 1)
    def _finish():
        for i in range(q_ref.shape[-1] // c):
            hs = slice(i * c, (i + 1) * c)
            l = l_i[:, i * 128 : i * 128 + 1]
            o_ref[0, :, hs] = (acc[:, hs] / jnp.maximum(l, 1e-30)).astype(
                o_ref.dtype
            )
        if with_lse:
            lse_ref[0, :, :] = m_i[...] + jnp.log(jnp.maximum(l_i[...], 1e-30))


def _fwd_kernel_onepass(
    q_ref, k_ref, v_ref, mask_ref, o_ref, *rest, n_ut, kt, scale, c, with_lse
):
    """Single-pass (non-online) masked softmax: one head per grid step.

    Phase 1 (steps t=0..n_ut-1) streams K tiles and fills the logits
    scratch; the final step masks, does ONE max/exp/sum pass, and runs the
    whole P@V as a single MXU dot from scratch. Removes the online-softmax
    state traffic (acc rescales + 128-lane m/l broadcast writes per tile)
    that dominates the multi-tile kernel's VPU time. Numerics identical:
    masked lanes get the _NEG bias before the max, so empty rows still
    produce exact zeros.
    """
    if with_lse:
        lse_ref, s = rest
    else:
        (s,) = rest
    t = pl.program_id(2)

    s[:, pl.dslice(t * kt, kt)] = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(t == n_ut - 1)
    def _finish():
        s[...] = jnp.where(mask_ref[0] != 0, s[...], _NEG)
        m = jnp.maximum(jnp.max(s[...], axis=-1, keepdims=True), _SAFE)
        s[...] = jnp.exp(s[...] - m)
        l = jnp.sum(s[...], axis=-1, keepdims=True)
        o = jax.lax.dot(
            s[...].astype(v_ref.dtype), v_ref[0],
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        if with_lse:
            lse = m + jnp.log(jnp.maximum(l, 1e-30))
            lse_ref[0] = jnp.broadcast_to(lse, (lse.shape[0], 128))


def _bwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref, dq_acc, *, n_ut, scale, c,
):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    bias = _mask_bias(mask_ref)

    for i in range(q_ref.shape[-1] // c):
        hs = slice(i * c, (i + 1) * c)
        q = q_ref[0, :, hs]
        k = k_ref[0, :, hs]
        v = v_ref[0, :, hs]
        do = do_ref[0, :, hs]
        lse = lse_ref[0, :, i * 128 : i * 128 + 1]
        delta = delta_ref[0, :, i * 128 : i * 128 + 1]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias
        p = jnp.exp(logits - lse)  # [block(recv), KT(key)]
        # Block-local dv/dk: this key tile belongs to this block alone.
        dv_ref[0, :, hs] = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk_ref[0, :, hs] = (
            jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        ).astype(dk_ref.dtype)
        dq_acc[:, hs] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(t == n_ut - 1)
    def _finish():
        dq_ref[0, :, :] = (dq_acc[...] * scale).astype(dq_ref.dtype)


def _bwd_kernel_onepass(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref, *, scale,
):
    """Single-pass backward: one head per grid step, whole union resident.

    P is formed once (exp against the stored lse) and all four gradient
    contractions run as whole-union MXU dots — no per-tile exp/state
    overhead, 5 large dots per head instead of 5 small ones per tile.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, :, :1]
    delta = delta_ref[0, :, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(mask_ref[0] != 0, s, _NEG)
    p = jnp.exp(s - lse)  # [block, U_pad]
    dv_ref[0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta)).astype(q.dtype)
    dk_ref[0] = (
        jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(dk_ref.dtype)
    dq_ref[0] = (
        jax.lax.dot(ds, k, preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)


def _dq_kernel_onepass(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
    dq_ref, *, scale,
):
    """dq-only single-pass backward (symmetric path: dk/dv come from the
    separate transpose kernel, so the 2 extra contractions and their
    [U_pad, hc] output streams are dropped)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, :, :1]
    delta = delta_ref[0, :, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(mask_ref[0] != 0, s, _NEG)
    p = jnp.exp(s - lse)  # [block, U_pad]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta)).astype(k.dtype)
    dq_ref[0] = (
        jax.lax.dot(ds, k, preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)


def _dkv_kernel_onepass(
    k_ref, v_ref, qg_ref, dog_ref, mask_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, *, scale,
):
    """Transpose single-pass backward over KEY blocks (symmetric graphs).

    Rows = the block's own key rows, columns = the gathered receiver
    union; by edge-list symmetry the forward's [block, U_pad] mask is
    exactly this kernel's adjacency, so
        s[i, j]  = k_i . q_j * scale          (the forward logits, transposed)
        p        = exp(s + bias - lse[j])     (P^T)
        dv_block = p  @ dO_union              (P^T dO)
        ds       = p * (dO_union V^T)^T-ish   (dp[i,j] = v_i . do_j)
        dk_block = ds @ q_union * scale
    and dk/dv land DIRECTLY at their global block rows — no scatter."""
    g = pl.program_id(1)
    k = k_ref[0]  # [block, C] this block's keys
    v = v_ref[0]
    qg = qg_ref[0]  # [U_pad, C] gathered receiver queries
    dog = dog_ref[0]
    # [1, h, U_pad] blocks (Mosaic needs the trailing two block dims to
    # match the array); slice this head's row dynamically.
    lse = lse_ref[0, pl.dslice(g, 1), :]  # [1, U_pad]
    delta = delta_ref[0, pl.dslice(g, 1), :]

    s = jax.lax.dot_general(
        k, qg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [block(keys), U_pad(receivers)]
    s = jnp.where(mask_ref[0] != 0, s, _NEG)
    p = jnp.exp(s - lse)
    dv_ref[0] = jax.lax.dot(
        p.astype(dog.dtype), dog, preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        v, dog, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta)).astype(qg.dtype)
    dk_ref[0] = (
        jax.lax.dot(ds, qg, preferred_element_type=jnp.float32) * scale
    ).astype(dk_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block", "interpret", "symmetric")
)
def clustered_flash_attention(
    q: jnp.ndarray,  # [N, H, C] or [B, N, H, C] (batch-native)
    k: jnp.ndarray,
    v: jnp.ndarray,
    gather_ids: jnp.ndarray,  # [nb, U_pad] int32 (padding -> row 0, masked)
    masks: jnp.ndarray,  # [nb, block, U_pad] bool/int8
    block: int,
    interpret: bool = False,
    symmetric: bool = False,
) -> jnp.ndarray:
    """Graph attention over per-block gathered neighbor unions.

    Returns the input shape; receivers with no neighbors get exact zeros.
    Differentiable (hand-written flash backward + XLA scatter-add, or the
    scatter-free transpose-kernel backward when `symmetric=True` — the
    caller asserts the edge list is symmetric AND q/k/v index the same
    node set, e.g. the k-hop mesh graph; meshes/clustering.py checks this
    at build time).
    Batched inputs are HEAD-FOLDED: [B, N, h, c] -> [N, B*h, c], so the
    batch rides the kernel's head grid axis — masks are fetched once per
    block for all B*h head steps and the k/v unions gather as B*h*c-wide
    rows (near-bandwidth block copies). Measured on the splits-5 k-hop
    layout (v5e): 0.739 ms/sample at B=4 vs 0.916 for the block-grid fold
    vs 0.482 at B=1 (scripts/probe_batch_scaling.py). Do NOT vmap this
    function (the pallas batching rule broadcasts the shared mask/ids
    operands); pass the batch axis instead.
    """
    if q.ndim == 4 and q.shape[0] > 1:
        b, n, h, c = q.shape
        n_kv = k.shape[1]
        qf = q.transpose(1, 0, 2, 3).reshape(n, b * h, c)
        kf = k.transpose(1, 0, 2, 3).reshape(n_kv, b * h, c)
        vf = v.transpose(1, 0, 2, 3).reshape(n_kv, b * h, c)
        out = _clustered(
            qf, kf, vf, gather_ids, masks, block, interpret, symmetric
        )
        return out.reshape(n, b, h, c).transpose(1, 0, 2, 3)
    return _clustered(q, k, v, gather_ids, masks, block, interpret, symmetric)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _clustered(q, k, v, gather_ids, masks, block, interpret, symmetric):
    out, _ = _clustered_impl(q, k, v, gather_ids, masks, block, interpret, False)
    return out


def _clustered_fwd(q, k, v, gather_ids, masks, block, interpret, symmetric):
    out, lse = _clustered_impl(
        q, k, v, gather_ids, masks, block, interpret, True
    )
    return out, (q, k, v, gather_ids, masks, out, lse)


def _clustered_bwd(block, interpret, symmetric, res, g):
    import numpy as np

    q, k, v, gather_ids, masks, out, lse = res
    dq, dk, dv = _clustered_bwd_impl(
        q, k, v, gather_ids, masks, out, lse, g, block, interpret, symmetric
    )
    zero_i = np.zeros(gather_ids.shape, jax.dtypes.float0)
    zero_m = np.zeros(masks.shape, jax.dtypes.float0)
    return dq, dk, dv, zero_i, zero_m


_clustered.defvjp(_clustered_fwd, _clustered_bwd)


def _gather_kv(t, gather_ids):
    """[B, N, hc] -> [B*nb, U_pad, hc] block-local rows.

    Padding slots in gather_ids point at row 0 (a real row — no copy to
    append a dummy); their mask columns are all-False so they contribute
    exactly zero in forward and backward (see meshes/clustering.py)."""
    b = t.shape[0]
    loc = jnp.take(t, gather_ids, axis=1)  # [B, nb, U_pad, hc]
    return loc.reshape((b * gather_ids.shape[0],) + loc.shape[2:])


def _pad_kt(gather_ids, masks, u_pad):
    """Pad a tight (128-multiple) layout up to the next _KT multiple so
    the streaming fallback kernels can tile it; padding ids point at row 0
    with all-zero masks."""
    target = -(-u_pad // _KT) * _KT
    pad = target - u_pad
    if pad:
        gather_ids = jnp.pad(gather_ids, ((0, 0), (0, pad)))
        masks = jnp.pad(masks, ((0, 0), (0, 0), (0, pad)))
    return gather_ids, masks, target


def _layout(q, k, v, block, nb):
    """Batch-folded layout: [B, n, h, c] inputs -> [B*nb, block, hc] query
    blocks + [B, n_kv, hc] flat key/value rows. The kernels' leading grid
    axis then ranges over B*nb, with the (batch-shared) masks indexed
    modulo nb — no mask tiling, no vmap batching rule. n_kv may differ
    from n (block-sharded processors pass local query rows against
    all-gathered global key/value rows)."""
    bsz, n, h, c = q.shape
    n_kv = k.shape[1]
    n_pad = nb * block
    scale = 1.0 / (c**0.5)
    c_true = c
    c_pad = -(-c // 128) * 128
    if c_pad != c:
        pads = ((0, 0), (0, 0), (0, 0), (0, c_pad - c))
        q, k, v = (jnp.pad(a, pads) for a in (q, k, v))
        c = c_pad
    hc = h * c
    row_pad = ((0, 0), (0, n_pad - n), (0, 0), (0, 0))
    q_p = jnp.pad(q, row_pad).reshape(bsz * nb, block, hc)
    k_f = k.reshape(bsz, n_kv, hc)  # no row padding needed (gathered by id)
    v_f = v.reshape(bsz, n_kv, hc)
    return n, h, c, c_true, hc, n_pad, scale, q_p, k_f, v_f


def _clustered_impl(q, k, v, gather_ids, masks, block, interpret, with_lse):
    nb, u_pad = gather_ids.shape
    if u_pad % 128 or block % 8:
        raise ValueError(
            f"U_pad={u_pad} must be a multiple of 128 and "
            f"block={block} a multiple of 8"
        )
    squeeze = q.ndim == 3
    if squeeze:
        q, k, v = q[None], k[None], v[None]
    bsz = q.shape[0]
    n, h, c, c_true, hc, n_pad, scale, q_p, k_f, v_f = _layout(
        q, k, v, block, nb
    )
    bnb = bsz * nb
    k_loc = _gather_kv(k_f, gather_ids)  # [B*nb, U_pad, hc]
    v_loc = _gather_kv(v_f, gather_ids)
    masks8 = masks.astype(jnp.int8)
    # Stream K in _KT tiles when U_pad allows; otherwise 128-lane tiles
    # (tight non-512-multiple U_pad saves gather + softmax lanes).
    kt_stream = _KT if u_pad % _KT == 0 else 128
    n_ut = u_pad // kt_stream
    dt = q_p.dtype.itemsize

    # Single-pass kernel (one head per step, full logits row in scratch)
    # whenever the scratch + working set fits; the online multi-tile
    # kernel remains as the large-config fallback.
    onepass_bytes = (
        block * u_pad * 4 * 3  # logits scratch + masked/exp temps
        + u_pad * c * dt * 4  # k tile + v (double-buffered)
        + block * u_pad * 2  # int8 mask (double-buffered)
        + block * c * (dt * 4 + 4)  # q, o, acc temp
        + block * 128 * 4 * 2
    )
    if onepass_bytes <= _VMEM_BUDGET:
        out_specs = [pl.BlockSpec((1, block, c), lambda b, g, t: (b, 0, g))]
        out_shapes = [jax.ShapeDtypeStruct((bnb, block, hc), q_p.dtype)]
        if with_lse:
            out_specs.append(
                pl.BlockSpec((1, block, 128), lambda b, g, t: (b, 0, g))
            )
            out_shapes.append(
                jax.ShapeDtypeStruct((bnb, block, h * 128), jnp.float32)
            )
        res = pl.pallas_call(
            functools.partial(
                _fwd_kernel_onepass,
                n_ut=n_ut, kt=kt_stream, scale=scale, c=c, with_lse=with_lse,
            ),
            grid=(bnb, h, n_ut),
            in_specs=[
                pl.BlockSpec((1, block, c), lambda b, g, t: (b, 0, g)),
                pl.BlockSpec((1, kt_stream, c), lambda b, g, t: (b, t, g)),
                pl.BlockSpec((1, u_pad, c), lambda b, g, t: (b, 0, g)),
                pl.BlockSpec((1, block, u_pad), lambda b, g, t: (b % nb, 0, 0)),
            ],
            out_specs=out_specs if with_lse else out_specs[0],
            out_shape=out_shapes if with_lse else out_shapes[0],
            scratch_shapes=[pltpu.VMEM((block, u_pad), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")
            ),
            interpret=interpret,
        )(q_p, k_loc, v_loc, masks8)
        if with_lse:
            out, lse = res
        else:
            out, lse = res, None
        out = out.reshape(bsz, n_pad, h, c)[:, :n, :, :c_true]
        return (out[0] if squeeze else out), lse

    if u_pad % _KT:
        # Too big for single-pass and tightly padded: widen to a _KT
        # multiple for the streaming kernel (re-gather at padded width).
        gather_ids, masks8, u_pad = _pad_kt(gather_ids, masks8, u_pad)
        k_loc = _gather_kv(k_f, gather_ids)
        v_loc = _gather_kv(v_f, gather_ids)
        n_ut = u_pad // _KT

    def est(g):
        gc = g * c
        return (
            block * gc * dt * 2
            + 2 * _KT * gc * dt * 2
            + block * _KT * 2
            + block * gc * dt * 2
            + (block * g * 128 * 4 * 2 if with_lse else 0)
            + block * gc * 4
            + 2 * block * g * 128 * 4
        )

    g_sz = _pick_group(h, est)
    gc = g_sz * c
    out_specs = [pl.BlockSpec((1, block, gc), lambda b, g, t: (b, 0, g))]
    out_shapes = [jax.ShapeDtypeStruct((bnb, block, hc), q_p.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((1, block, g_sz * 128), lambda b, g, t: (b, 0, g))
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((bnb, block, h * 128), jnp.float32)
        )
    res = pl.pallas_call(
        functools.partial(
            _fwd_kernel, n_ut=n_ut, scale=scale, c=c, with_lse=with_lse
        ),
        grid=(bnb, h // g_sz, n_ut),
        in_specs=[
            pl.BlockSpec((1, block, gc), lambda b, g, t: (b, 0, g)),
            pl.BlockSpec((1, _KT, gc), lambda b, g, t: (b, t, g)),
            pl.BlockSpec((1, _KT, gc), lambda b, g, t: (b, t, g)),
            pl.BlockSpec((1, block, _KT), lambda b, g, t: (b % nb, 0, t)),
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
    )(q_p, k_loc, v_loc, masks8)
    if with_lse:
        out, lse = res
    else:
        out, lse = res, None
    out = out.reshape(bsz, n_pad, h, c)[:, :n, :, :c_true]
    return (out[0] if squeeze else out), lse


def _clustered_bwd_impl(
    q, k, v, gather_ids, masks, out, lse, g, block, interpret,
    symmetric=False,
):
    nb, u_pad = gather_ids.shape
    squeeze = q.ndim == 3
    if squeeze:
        q, k, v, out, g = q[None], k[None], v[None], out[None], g[None]
    bsz = q.shape[0]
    n_kv = k.shape[1]
    n, h, c, c_true, hc, n_pad, scale, q_p, k_f, v_f = _layout(
        q, k, v, block, nb
    )
    bnb = bsz * nb
    in_dtype = q_p.dtype
    dt = in_dtype.itemsize
    if c != c_true:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, c - c_true)))
    g_f = jnp.pad(g, ((0, 0), (0, n_pad - n), (0, 0), (0, 0))).reshape(
        bnb, block, hc
    )

    delta_n = jnp.sum(
        g.astype(jnp.float32)[..., :c_true] * out.astype(jnp.float32), axis=-1
    )  # [bsz, n, h]
    delta_n = jnp.pad(delta_n, ((0, 0), (0, n_pad - n), (0, 0)))
    delta = jnp.broadcast_to(
        delta_n.reshape(bnb, block, h, 1), (bnb, block, h, 128)
    ).reshape(bnb, block, h * 128)

    if symmetric and n != n_kv:
        raise ValueError(
            "symmetric=True requires q and k/v to index the same node set "
            f"(got {n} queries vs {n_kv} keys)"
        )
    if symmetric and _symmetric_fits(block, u_pad, c, dt):
        return _bwd_symmetric(
            q_p, k_f, v_f, gather_ids, masks, g_f, lse, delta, delta_n,
            bsz, n, nb, n_pad, u_pad, h, c, c_true, hc, block, scale,
            in_dtype, interpret, squeeze,
        )

    k_loc = _gather_kv(k_f, gather_ids)
    v_loc = _gather_kv(v_f, gather_ids)
    masks8 = masks.astype(jnp.int8)
    n_ut = u_pad // _KT if u_pad % _KT == 0 else None

    onepass_bytes = (
        3 * block * c * dt * 2  # q, do, dq
        + 4 * u_pad * c * dt * 2  # k, v, dk, dv
        + block * u_pad * 2  # int8 mask
        + 2 * block * 128 * 4 * 2  # lse, delta
        + 3 * block * u_pad * 4  # s/p/dp temps
    )
    if onepass_bytes <= _VMEM_BUDGET:
        dq, dk_loc, dv_loc = pl.pallas_call(
            functools.partial(_bwd_kernel_onepass, scale=scale),
            grid=(bnb, h),
            in_specs=[
                pl.BlockSpec((1, block, c), lambda b, g: (b, 0, g)),
                pl.BlockSpec((1, u_pad, c), lambda b, g: (b, 0, g)),
                pl.BlockSpec((1, u_pad, c), lambda b, g: (b, 0, g)),
                pl.BlockSpec((1, block, u_pad), lambda b, g: (b % nb, 0, 0)),
                pl.BlockSpec((1, block, c), lambda b, g: (b, 0, g)),
                pl.BlockSpec((1, block, 128), lambda b, g: (b, 0, g)),
                pl.BlockSpec((1, block, 128), lambda b, g: (b, 0, g)),
            ],
            out_specs=[
                pl.BlockSpec((1, block, c), lambda b, g: (b, 0, g)),
                pl.BlockSpec((1, u_pad, c), lambda b, g: (b, 0, g)),
                pl.BlockSpec((1, u_pad, c), lambda b, g: (b, 0, g)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bnb, block, hc), in_dtype),
                jax.ShapeDtypeStruct((bnb, u_pad, hc), in_dtype),
                jax.ShapeDtypeStruct((bnb, u_pad, hc), in_dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            ),
            interpret=interpret,
        )(q_p, k_loc, v_loc, masks8, g_f, lse, delta)
        return _bwd_scatter(
            dq, dk_loc, dv_loc, gather_ids, bsz, n, n_kv, n_pad, nb, u_pad,
            h, c, c_true, hc, in_dtype, squeeze,
        )

    if n_ut is None:
        gather_ids, masks8, u_pad = _pad_kt(gather_ids, masks8, u_pad)
        k_loc = _gather_kv(k_f, gather_ids)
        v_loc = _gather_kv(v_f, gather_ids)
        n_ut = u_pad // _KT

    def est(gs):
        gc = gs * c
        return (
            2 * block * gc * dt * 2  # q, do
            + 2 * _KT * gc * dt * 2  # k, v
            + block * _KT * 2  # mask
            + 2 * block * gs * 128 * 4 * 2  # lse, delta
            + block * gc * dt * 2  # dq out
            + 2 * _KT * gc * dt * 2  # dk, dv outs
            + block * gc * 4  # dq scratch
        )

    g_sz = _pick_group(h, est)
    gc = g_sz * c

    dq, dk_loc, dv_loc = pl.pallas_call(
        functools.partial(_bwd_kernel, n_ut=n_ut, scale=scale, c=c),
        grid=(bnb, h // g_sz, n_ut),
        in_specs=[
            pl.BlockSpec((1, block, gc), lambda b, g, t: (b, 0, g)),
            pl.BlockSpec((1, _KT, gc), lambda b, g, t: (b, t, g)),
            pl.BlockSpec((1, _KT, gc), lambda b, g, t: (b, t, g)),
            pl.BlockSpec((1, block, _KT), lambda b, g, t: (b % nb, 0, t)),
            pl.BlockSpec((1, block, gc), lambda b, g, t: (b, 0, g)),
            pl.BlockSpec((1, block, g_sz * 128), lambda b, g, t: (b, 0, g)),
            pl.BlockSpec((1, block, g_sz * 128), lambda b, g, t: (b, 0, g)),
        ],
        out_specs=[
            pl.BlockSpec((1, block, gc), lambda b, g, t: (b, 0, g)),
            pl.BlockSpec((1, _KT, gc), lambda b, g, t: (b, t, g)),
            pl.BlockSpec((1, _KT, gc), lambda b, g, t: (b, t, g)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bnb, block, hc), in_dtype),
            jax.ShapeDtypeStruct((bnb, u_pad, hc), in_dtype),
            jax.ShapeDtypeStruct((bnb, u_pad, hc), in_dtype),
        ],
        scratch_shapes=[pltpu.VMEM((block, gc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(q_p, k_loc, v_loc, masks8, g_f, lse, delta)

    return _bwd_scatter(
        dq, dk_loc, dv_loc, gather_ids, bsz, n, n_kv, n_pad, nb, u_pad, h,
        c, c_true, hc, in_dtype, squeeze,
    )


def _bwd_scatter(
    dq, dk_loc, dv_loc, gather_ids, bsz, n, n_kv, n_pad, nb, u_pad, h, c,
    c_true, hc, in_dtype, squeeze,
):
    """Scatter block-local dk/dv back to global rows (per batch element).

    Unions overlap across blocks; padding slots point at row 0 with
    identically-zero columns, so they add exact zeros there."""
    dq = dq.reshape(bsz, n_pad, h, c)[:, :n, :, :c_true]
    ids = gather_ids.reshape(-1)

    def seg(t):
        return jax.ops.segment_sum(t, ids, num_segments=n_kv)

    dk = jax.vmap(seg)(
        dk_loc.reshape(bsz, nb * u_pad, hc).astype(jnp.float32)
    )
    dv = jax.vmap(seg)(
        dv_loc.reshape(bsz, nb * u_pad, hc).astype(jnp.float32)
    )
    dk = dk.astype(in_dtype).reshape(bsz, n_kv, h, c)[..., :c_true]
    dv = dv.astype(in_dtype).reshape(bsz, n_kv, h, c)[..., :c_true]
    if squeeze:
        return dq[0], dk[0], dv[0]
    return dq, dk, dv


def _symmetric_fits(block: int, u_pad: int, c: int, dt: int) -> bool:
    """Both symmetric-path kernels must fit the VMEM budget (per head)."""
    dq_bytes = (
        3 * block * c * dt * 2  # q, do, dq (double-buffered streams)
        + 2 * u_pad * c * dt * 2  # k_loc, v_loc
        + block * u_pad * 2  # int8 mask
        + 2 * block * 128 * 4 * 2  # lse, delta
        + 3 * block * u_pad * 4  # s/p/dp temps
    )
    dkv_bytes = (
        4 * block * c * dt * 2  # k, v, dk, dv
        + 2 * u_pad * c * dt * 2  # q_loc, do_loc
        + block * u_pad * 2  # mask
        + 2 * u_pad * 4 * 2  # lse, delta union rows
        + 3 * block * u_pad * 4  # s/p/dp temps
    )
    return dq_bytes <= _VMEM_BUDGET and dkv_bytes <= _VMEM_BUDGET


def _bwd_symmetric(
    q_p, k_f, v_f, gather_ids, masks, g_f, lse, delta, delta_n,
    bsz, n, nb, n_pad, u_pad, h, c, c_true, hc, block, scale,
    in_dtype, interpret, squeeze,
):
    """Scatter-free backward for symmetric graphs: a dq-only kernel over
    receiver blocks plus a transpose dk/dv kernel over key blocks whose
    outputs land directly at global block rows (see module docstring)."""
    bnb = bsz * nb
    masks8 = masks.astype(jnp.int8)
    k_loc = _gather_kv(k_f, gather_ids)
    v_loc = _gather_kv(v_f, gather_ids)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel_onepass, scale=scale),
        grid=(bnb, h),
        in_specs=[
            pl.BlockSpec((1, block, c), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, u_pad, c), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, u_pad, c), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, block, u_pad), lambda b, g: (b % nb, 0, 0)),
            pl.BlockSpec((1, block, c), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, block, 128), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, block, 128), lambda b, g: (b, 0, g)),
        ],
        out_specs=pl.BlockSpec((1, block, c), lambda b, g: (b, 0, g)),
        out_shape=jax.ShapeDtypeStruct((bnb, block, hc), in_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(q_p, k_loc, v_loc, masks8, g_f, lse, delta)

    # Transpose-kernel operands: the block's own key rows plus the
    # gathered q/do/lse/delta rows of its receiver union.
    row_pad = ((0, 0), (0, n_pad - n), (0, 0))
    k_p = jnp.pad(k_f, row_pad).reshape(bnb, block, hc)
    v_p = jnp.pad(v_f, row_pad).reshape(bnb, block, hc)
    q_loc = _gather_kv(q_p.reshape(bsz, n_pad, hc), gather_ids)
    do_loc = _gather_kv(g_f.reshape(bsz, n_pad, hc), gather_ids)
    lse_n = lse.reshape(bsz, n_pad, h, 128)[..., 0]  # [bsz, n_pad, h]
    lse_h = jnp.transpose(
        jnp.take(lse_n, gather_ids, axis=1), (0, 1, 3, 2)
    ).reshape(bnb, h, u_pad)
    delta_h = jnp.transpose(
        jnp.take(delta_n, gather_ids, axis=1), (0, 1, 3, 2)
    ).reshape(bnb, h, u_pad)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel_onepass, scale=scale),
        grid=(bnb, h),
        in_specs=[
            pl.BlockSpec((1, block, c), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, block, c), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, u_pad, c), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, u_pad, c), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, block, u_pad), lambda b, g: (b % nb, 0, 0)),
            pl.BlockSpec((1, h, u_pad), lambda b, g: (b, 0, 0)),
            pl.BlockSpec((1, h, u_pad), lambda b, g: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block, c), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, block, c), lambda b, g: (b, 0, g)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bnb, block, hc), in_dtype),
            jax.ShapeDtypeStruct((bnb, block, hc), in_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(k_p, v_p, q_loc, do_loc, masks8, lse_h, delta_h)

    def unblock(t):
        return t.reshape(bsz, n_pad, h, c)[:, :n, :, :c_true]

    dq, dk, dv = unblock(dq), unblock(dk), unblock(dv)
    if squeeze:
        return dq[0], dk[0], dv[0]
    return dq, dk, dv
