"""Pallas TPU kernel for 3D neighborhood attention (NATTEN).

TPU-native replacement for the O(window x volume) HBM traffic of the
XLA slot-scan in ops/neighborhood_attention.py (reference CUDA analogue:
natten.NeighborhoodAttention3D used by WeatherMesh, reference
models/weathermesh/processor.py:27-45). The XLA scan re-reads the full
k/v volume plus the f32 softmax accumulators from HBM once per window
slot (Kd*Kh*Kw = 75-245 times); this kernel keeps a (D, H, w-tile) slab
of k/v resident in VMEM and walks the window slots as the inner grid
dimension, so HBM traffic is O(1 + halo) per element.

Design notes (all constraints below were hit on real v5e hardware):
  * Layout [B, D, H, W, heads*ch]: channels (heads-major) on the lanes,
    the w-tile on the sublanes. Mosaic cannot dynamically slice the
    sublane dim at non-multiple-of-8 offsets, so the W axis of the
    window is PRE-APPLIED in XLA: k/v are expanded into kw "z-copies"
    k_z[w] = k[w_window(w, z)] (clamp or wrap), tiled [B*nW, kw, D+kd-1,
    H+kh-1, tw, hc]. The kernel's grid walks z in the OUTER part of the
    slot index so each z-plane is fetched once per kd*kh steps. D/H
    shifts are dynamic slices on MAJOR dims (any offset allowed), with
    the clamped boundary rows fixed by iota-masked row broadcasts.
  * Per-slot logits: elementwise q * k_shifted, then ONE [hc, hc]
    block-diagonal matmul (ones per head block) that computes every
    head's lane-sum AND broadcasts it back across that head's lanes —
    all softmax state stays in full-lane replicated form, so the only
    cross-lane op in the kernel rides the MXU.
  * Relative-position bias: rpb[rel] is a pure QUERY-side quantity per
    slot, and rel depends on the query position only through its
    per-axis boundary CLASS (first c positions / interior / last k-1-c,
    per axis — kd*kh*kw classes total). So bias = Qcls @ Wcls[s]:
    Qcls [rows, CLS] is a static position-class one-hot (fetched once
    per tile), Wcls [K, CLS, hc] holds each slot's per-class rpb values
    replicated over head lanes (built from the learned rpb in XLA each
    call, ~2 MB; streamed 32 KB/slot). One extra small MXU matmul per
    slot replaces all edge-case select logic, exactly.

Backward: custom_vjp whose backward differentiates the XLA reference
implementation (mathematically the same function) — training gradients
stay exact while the forward gets the fast path; a dedicated backward
kernel can replace it later.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _natten_kernel(
    q_ref,  # [1, D, H, tw, hc]
    k_ref,  # [1, 1, D+kd-1, H+kh-1, tw, hc] (z-plane)
    v_ref,
    qcls_ref,  # [1, D, H, tw, CLS]
    wcls_ref,  # [1, CLS, hc]
    ee_ref,  # [hc, hc] block-diag ones
    o_ref,  # [1, D, H, tw, hc]
    m_s,  # scratch [D, H, tw, hc] f32
    l_s,
    acc_s,
    *,
    kd,
    kh,
    kw,
    d,
    h,
    tw,
    has_bias,
    out_dtype,
):
    s = pl.program_id(1)
    n_slots = kd * kh * kw
    r = s % (kd * kh)
    x = r // kh
    y = r % kh
    cd, ch = kd // 2, kh // 2

    @pl.when(s == 0)
    def _init():
        m_s[...] = jnp.full(m_s.shape, _NEG, jnp.float32)
        l_s[...] = jnp.zeros(l_s.shape, jnp.float32)
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

    def iota(axis):
        return jax.lax.broadcasted_iota(jnp.int32, (d, h, tw, 1), axis)

    def shifted(ref):
        t = ref[0, 0, pl.dslice(x, d), pl.dslice(y, h), :, :]
        # Clamped-boundary fixups along D and H (iota-mask selects): the
        # first c rows all use the window anchored at 0 (== in-slice row
        # c), the last k-1-c rows the one anchored at S-k (== in-slice
        # row S-1-(k-1-c)). The W axis is pre-applied in XLA.
        if cd > 0:
            t = jnp.where(
                iota(0) < cd, jnp.broadcast_to(t[cd : cd + 1], t.shape), t
            )
        if kd - 1 - cd > 0:
            n_t = kd - 1 - cd
            t = jnp.where(
                iota(0) >= d - n_t,
                jnp.broadcast_to(t[d - 1 - n_t : d - n_t], t.shape),
                t,
            )
        if ch > 0:
            t = jnp.where(
                iota(1) < ch,
                jnp.broadcast_to(t[:, ch : ch + 1], t.shape),
                t,
            )
        if kh - 1 - ch > 0:
            n_t = kh - 1 - ch
            t = jnp.where(
                iota(1) >= h - n_t,
                jnp.broadcast_to(t[:, h - 1 - n_t : h - n_t], t.shape),
                t,
            )
        return t

    def dot32(a, b, exact, n_terms=3):
        """f32-accurate matmul where the `exact` ("lhs"/"rhs") operand is
        exactly bf16-representable (the 0/1 one-hot / block-diag matrices
        here) and the OTHER operand is split into bf16 terms.

        Mosaic supports only DEFAULT dot precision in-kernel (HIGH is
        unimplemented, HIGHEST hangs the v5e compiler on this kernel).
        Each split term's product against the exact operand accumulates
        in f32 on the MXU; 3 terms recover ~24 mantissa bits (f32
        inputs), 2 terms are EXACT for values that are products of two
        bf16s (<= 16 mantissa bits — the q*k path with bf16 inputs,
        matching CUDA natten's exact-half-product + f32-accumulate
        semantics).
        """

        def split(t):
            terms = []
            r = t
            for _ in range(n_terms - 1):
                ti = r.astype(jnp.bfloat16)
                terms.append(ti)
                r = r - ti.astype(jnp.float32)
            terms.append(r.astype(jnp.bfloat16))
            return terms

        dims = (((1,), (0,)), ((), ()))

        def one(a_, b_):
            return jax.lax.dot_general(
                a_, b_, dims, preferred_element_type=jnp.float32
            )

        if a.dtype == jnp.bfloat16 and b.dtype == jnp.bfloat16:
            return one(a, b)
        if exact == "rhs":
            b16 = b.astype(jnp.bfloat16)
            return sum(one(ai, b16) for ai in split(a.astype(jnp.float32)))
        a16 = a.astype(jnp.bfloat16)
        return sum(one(a16, bi) for bi in split(b.astype(jnp.float32)))

    q = q_ref[0]
    ks = shifted(k_ref)
    in_bf16 = q.dtype == jnp.bfloat16
    # Products in f32: exact for bf16 inputs (<= 16 mantissa bits), so a
    # 2-term split recovers them losslessly through the bf16 MXU.
    prod = q.astype(jnp.float32) * ks.astype(jnp.float32)
    hc = q.shape[-1]
    rows = d * h * tw
    # Per-head lane sums, replicated back over each head's lanes, in one
    # block-diagonal MXU matmul (exact: EE is 0/1).
    logits = dot32(
        prod.reshape(rows, hc), ee_ref[...], "rhs",
        n_terms=2 if in_bf16 else 3,
    ).reshape(d, h, tw, hc)

    if has_bias:
        cls = qcls_ref.shape[-1]
        # qcls is 0/1 (exact); wcls carries the f32 rpb values.
        bias = dot32(qcls_ref[0].reshape(rows, cls), wcls_ref[0], "lhs").reshape(
            d, h, tw, hc
        )
        logits = logits + bias

    vs = shifted(v_ref)
    m_old = m_s[...]
    m_new = jnp.maximum(m_old, logits)
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(logits - m_new)
    m_s[...] = m_new
    l_s[...] = l_s[...] * alpha + p
    acc_s[...] = acc_s[...] * alpha + p * vs.astype(jnp.float32)

    @pl.when(s == n_slots - 1)
    def _finalize():
        o_ref[0] = (acc_s[...] / l_s[...]).astype(out_dtype)


def _w_window_indices(w, kw, circular):
    """[kw, W] gather indices: k_z[w] = k[idx[z, w]]."""
    cw = kw // 2
    ww = np.arange(w)[None, :]
    zz = np.arange(kw)[:, None]
    if circular:
        idx = (ww - cw + zz) % w
    else:
        idx = np.clip(ww - cw, 0, w - kw) + zz
    return idx.astype(np.int32)


def _axis_classes(size, k):
    """Position -> boundary-class id (0..k-1) and class -> example
    position, for one clamped axis."""
    c = k // 2
    cls_of_pos = np.full(size, c, np.int32)  # interior class id = c
    reps = np.empty(k, np.int32)
    for p in range(c):
        cls_of_pos[p] = p
        reps[p] = p
    reps[c] = c  # interior representative (any interior position works)
    for p in range(k - 1 - c):
        cls_of_pos[size - 1 - p] = k - 1 - p
        reps[k - 1 - p] = size - 1 - p
    return cls_of_pos, reps


def _class_tables(d, h, w, kernel, circular_w):
    """Static Qcls class index [D, H, W] and per-axis rel lookups."""
    kd, kh, kw = kernel
    cd = kd // 2

    def rel_table(size, k, circular):
        c = k // 2
        i = np.arange(size)[:, None]
        kk = np.arange(k)[None, :]
        if circular:
            return np.broadcast_to(kk - c + k - 1, (size, k)).copy()
        start = np.clip(i - c, 0, size - k)
        return (start + kk) - i + k - 1

    cls_d, rep_d = _axis_classes(d, kd)
    cls_h, rep_h = _axis_classes(h, kh)
    if circular_w:
        cls_w = np.zeros(w, np.int32)
        rep_w = np.zeros(1, np.int32)
        n_w_cls = 1
    else:
        cls_w, rep_w = _axis_classes(w, kw)
        n_w_cls = kw
    rel_d = rel_table(d, kd, False)[rep_d]  # [kd cls, kd slots]
    rel_h = rel_table(h, kh, False)[rep_h]
    rel_w = rel_table(w, kw, circular_w)[rep_w]  # [n_w_cls, kw]
    joint = (
        cls_d[:, None, None] * (kh * n_w_cls)
        + cls_h[None, :, None] * n_w_cls
        + cls_w[None, None, :]
    )  # [D, H, W] -> class id in [0, kd*kh*n_w_cls)
    return joint, rel_d, rel_h, rel_w, n_w_cls


def _build_wcls(rpb, kernel, rel_d, rel_h, rel_w, n_w_cls, ch, cls_pad, dtype):
    """[K, CLS_pad, hc]: slot s, class (a,b,c) -> rpb[head, rel...]."""
    kd, kh, kw = kernel
    xs = np.repeat(np.arange(kd), kh * kw)
    ys = np.tile(np.repeat(np.arange(kh), kw), kd)
    zs = np.tile(np.arange(kw), kd * kh)
    # reorder slots: z outer (matches the kernel's s -> (z, x, y) map)
    order = np.argsort(zs * (kd * kh) + xs * kh + ys, kind="stable")
    xs, ys, zs = xs[order], ys[order], zs[order]
    a = rel_d[:, xs]  # [kd_cls, K]
    b = rel_h[:, ys]  # [kh_cls, K]
    c = rel_w[:, zs]  # [n_w_cls, K]
    vals = rpb[
        :,
        a.T[:, :, None, None],
        b.T[:, None, :, None],
        c.T[:, None, None, :],
    ]  # [heads, K, kd, kh, n_w_cls]
    heads = rpb.shape[0]
    k_total = kd * kh * kw
    vals = jnp.transpose(vals, (1, 2, 3, 4, 0)).reshape(
        k_total, kd * kh * n_w_cls, heads
    )
    vals = jnp.repeat(vals, ch, axis=-1)  # [K, CLS, hc]
    pad = cls_pad - vals.shape[1]
    if pad:
        vals = jnp.pad(vals, ((0, 0), (0, pad), (0, 0)))
    return vals.astype(dtype)


def _natten_fwd_impl(q, k, v, rpb, kernel, circular_w, tw, interpret):
    bsz, d, h, w, heads, ch = q.shape
    kd, kh, kw = kernel
    hc = heads * ch
    cd, ch_ = kd // 2, kh // 2
    scale = ch**-0.5
    dt = q.dtype

    def merge(t):
        return t.reshape(bsz, d, h, w, hc)

    qm = merge(q * scale)
    km, vm = merge(k), merge(v)

    n_w = w // tw
    w_idx = _w_window_indices(w, kw, circular_w)  # [kw, W]

    def z_tiles(t):
        # [B, D, H, W, hc] -> halo-pad D/H, apply the W window per z,
        # tile W -> [B*nW, kw, D+kd-1, H+kh-1, tw, hc].
        t = jnp.pad(
            t,
            (
                (0, 0),
                (cd, kd - 1 - cd),
                (ch_, kh - 1 - ch_),
                (0, 0),
                (0, 0),
            ),
        )
        tz = jnp.take(t, jnp.asarray(w_idx), axis=3)  # [B, D+, H+, kw, W, hc]
        tz = jnp.moveaxis(tz, 3, 1)  # [B, kw, D+, H+, W, hc]
        tz = tz.reshape(
            bsz, kw, d + kd - 1, h + kh - 1, n_w, tw, hc
        )
        tz = jnp.moveaxis(tz, 4, 1)  # [B, nW, kw, D+, H+, tw, hc]
        return tz.reshape(bsz * n_w, kw, d + kd - 1, h + kh - 1, tw, hc)

    kt, vt = z_tiles(km), z_tiles(vm)
    qt = qm.reshape(bsz, d, h, n_w, tw, hc)
    qt = jnp.moveaxis(qt, 3, 1).reshape(bsz * n_w, d, h, tw, hc)

    joint, rel_d, rel_h, rel_w, n_w_cls = _class_tables(
        d, h, w, kernel, circular_w
    )
    n_cls = kd * kh * n_w_cls
    cls_pad = max(128, -(-n_cls // 128) * 128)
    has_bias = rpb is not None
    bias_dt = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32
    if has_bias:
        onehot = np.zeros((d, h, w, cls_pad), np.int8)
        dd, hh, ww2 = np.meshgrid(
            np.arange(d), np.arange(h), np.arange(w), indexing="ij"
        )
        onehot[dd, hh, ww2, joint] = 1
        qcls = onehot.reshape(d, h, n_w, tw, cls_pad)
        qcls = np.moveaxis(qcls, 2, 0)  # [nW, D, H, tw, CLS]
        # tile id t = b * n_w + wt -> qcls row wt
        qcls = jnp.asarray(qcls, bias_dt)
        wcls = _build_wcls(
            rpb, kernel, rel_d, rel_h, rel_w, n_w_cls, ch, cls_pad, bias_dt
        )
    else:
        qcls = jnp.zeros((n_w, 1, 1, 1, cls_pad), bias_dt)
        wcls = jnp.zeros((kd * kh * kw, cls_pad, hc), bias_dt)

    ee = jnp.kron(
        jnp.eye(heads, dtype=jnp.bfloat16),
        jnp.ones((ch, ch), dtype=jnp.bfloat16),
    )

    n_slots = kd * kh * kw
    grid = (bsz * n_w, n_slots)
    kernel_fn = functools.partial(
        _natten_kernel,
        kd=kd,
        kh=kh,
        kw=kw,
        d=d,
        h=h,
        tw=tw,
        has_bias=has_bias,
        out_dtype=dt,
    )
    qcls_block = (1, d, h, tw, cls_pad) if has_bias else (1, 1, 1, 1, cls_pad)
    out = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, h, tw, hc), lambda t, s: (t, 0, 0, 0, 0)),
            pl.BlockSpec(
                (1, 1, d + kd - 1, h + kh - 1, tw, hc),
                lambda t, s: (t, s // (kd * kh), 0, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, d + kd - 1, h + kh - 1, tw, hc),
                lambda t, s: (t, s // (kd * kh), 0, 0, 0, 0),
            ),
            pl.BlockSpec(
                qcls_block, lambda t, s: (t % n_w, 0, 0, 0, 0)
            ),
            pl.BlockSpec((1, cls_pad, hc), lambda t, s: (s, 0, 0)),
            pl.BlockSpec((hc, hc), lambda t, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, d, h, tw, hc), lambda t, s: (t, 0, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz * n_w, d, h, tw, hc), dt),
        scratch_shapes=[
            pltpu.VMEM((d, h, tw, hc), jnp.float32),
            pltpu.VMEM((d, h, tw, hc), jnp.float32),
            pltpu.VMEM((d, h, tw, hc), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # The default 16 MB scoped-vmem limit rejects useful tile
            # sizes; v5e has 128 MB of VMEM. _pick_tw budgets ~20 MB of
            # modeled working set (observed peak is ~2x the model).
            vmem_limit_bytes=80 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qt, kt, vt, qcls, wcls, ee)

    out = out.reshape(bsz, n_w, d, h, tw, hc)
    out = jnp.moveaxis(out, 1, 3).reshape(bsz, d, h, w, hc)
    return out.reshape(bsz, d, h, w, heads, ch)


def _pick_tw(w, d, h, kernel, hc, dt_bytes):
    """Largest w-tile (dividing w) whose working set fits VMEM."""
    kd, kh, kw = kernel
    budget = 20 * 1024 * 1024
    cls_pad = max(128, -(-(kd * kh * kw) // 128) * 128)
    for tw in range(min(16, w), 0, -1):
        if w % tw:
            continue
        rows = d * h * tw
        est = (
            rows * hc * dt_bytes  # q
            + 4 * (d + kd - 1) * (h + kh - 1) * tw * hc * dt_bytes  # k,v x2buf
            + 3 * rows * hc * 4  # m, l, acc scratch f32
            + rows * hc * dt_bytes  # out
            + rows * cls_pad * dt_bytes  # qcls
            + 2 * cls_pad * hc * dt_bytes  # wcls stream
            + 3 * rows * hc * 4  # logits/p/alpha temporaries
        )
        if est <= budget:
            return tw
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _natten(q, k, v, rpb, kernel, circular_w, tw, interpret):
    return _natten_fwd_impl(q, k, v, rpb, kernel, circular_w, tw, interpret)


def _natten_fwd(q, k, v, rpb, kernel, circular_w, tw, interpret):
    out = _natten_fwd_impl(q, k, v, rpb, kernel, circular_w, tw, interpret)
    return out, (q, k, v, rpb)


def _natten_bwd(kernel, circular_w, tw, interpret, res, g):
    """Gradients via the XLA reference implementation (same function)."""
    from graph_weather_tpu.ops.neighborhood_attention import (
        neighborhood_attention_3d_xla,
    )

    q, k, v, rpb = res
    if rpb is None:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: neighborhood_attention_3d_xla(
                q_, k_, v_, kernel, None, circular_w
            ),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    _, vjp = jax.vjp(
        lambda q_, k_, v_, r_: neighborhood_attention_3d_xla(
            q_, k_, v_, kernel, r_, circular_w
        ),
        q, k, v, rpb,
    )
    return vjp(g)


_natten.defvjp(_natten_fwd, _natten_bwd)


def neighborhood_attention_3d_pallas(
    q: jnp.ndarray,  # [B, D, H, W, heads, ch]
    k: jnp.ndarray,
    v: jnp.ndarray,
    kernel: tuple[int, int, int],
    rpb: jnp.ndarray | None = None,
    circular_w: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas NATTEN forward (+ XLA-backward custom_vjp). Returns the
    input shape. Raises ValueError when the shape doesn't fit the kernel
    (caller falls back to the XLA path)."""
    bsz, d, h, w, heads, ch = q.shape
    hc = heads * ch
    if hc % 128 != 0:
        raise ValueError(
            f"heads*ch = {hc} must be a multiple of 128 lanes for the "
            "Pallas NATTEN kernel"
        )
    for size, kk in zip((d, h, w), kernel):
        if kk > size:
            raise ValueError(f"kernel {kernel} exceeds volume {(d, h, w)}")
    tw = _pick_tw(w, d, h, kernel, hc, 2 if q.dtype == jnp.bfloat16 else 4)
    if tw is None:
        raise ValueError(
            f"NATTEN working set for volume {(d, h, w)} x {hc} exceeds VMEM"
        )
    return _natten(
        q, k, v, rpb, tuple(kernel), bool(circular_w), tw, interpret
    )
