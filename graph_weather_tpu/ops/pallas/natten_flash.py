"""Block-dense halo flash kernel for 3D neighborhood attention (NATTEN).

Second-generation TPU kernel for `natten.NeighborhoodAttention3D`
semantics (reference models/weathermesh/processor.py:27-45), replacing
the slot-serial kernel in ops/pallas/natten3d.py on qualifying shapes.

The slot kernel walks the Kd*Kh*Kw window slots as a grid axis and pays,
PER SLOT, a full [rows, hc] x [hc, hc] lane-sum matmul plus online-
softmax state updates on the whole tile — ~75x the logical work at
WeatherMesh scale (measured 23.9 ms/layer on a [1,14,45,90,128] latent
volume, v5e). This kernel instead treats NATTEN as what it is on a
regular grid: BLOCK-DENSE masked attention against a halo.

  * The volume is tiled into (D, th, tw) query blocks (a pure XLA
    reshape/transpose — no gather); each block's keys live in its
    (D, th+2*(kh//2), tw+2*(kw//2)) halo, gathered once per call in XLA
    from precomputed ids (meshes-style static layout, lru-cached).
  * One grid step per (batch*block, lane-group): logits for ALL heads in
    a lane group ride ONE full-128-lane MXU dot — K arrives transposed
    [128, U_pad] and is expanded to a head-block-diagonal
    [128, hpg*U_pad] by iota-masked lane copies, so a [block, 128] x
    [128, hpg*U_pad] dot yields every head's [block, U_pad] logits with
    no 32-lane contractions and no c-padding waste.
  * Window validity varies across tiles only via per-axis boundary
    classes (clamped edges, circular wrap, pad rows). Masks are stored
    once per CLASS [n_cls, block, U_pad] (a few MB, VMEM-resident) and
    selected in-kernel by a dynamic major-dim slice driven by a tiny
    per-tile class table. Relative-position-bias VALUES are translation
    invariant, so one [block, hpg*U_pad] bias tensor (built from the
    learned rpb each call) serves every tile.

Backward: hand-written flash backward (same recipe as clustered_flash):
the forward saves per-(node, head) logsumexp; one backward kernel per
(lane-group, batch*block) grid step recomputes the masked logits, forms
P and dS = P * (dO V^T - delta), and emits dq (block rows, exact), the
block-local dk/dv in TRANSPOSED [128, u_pad] layout (scatter-added over
the overlapping halo gather ids with one XLA segment_sum — NATTEN halos
overlap between adjacent tiles, so unlike the symmetric clustered path
the scatter cannot be elided), and a [block, hpg*u_pad] dbias
accumulator: the relative-position bias is translation invariant, so
summing dS over every tile and batch row then segment-summing over the
canonical rel_flat table yields drpb exactly. Falls back to
differentiating the XLA slot-scan when no backward tile fits VMEM.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_SAFE = -1e28
_VMEM_MODEL_BUDGET = 28 * 2**20  # modeled working set; limit set to 100 MB
# Backward working-set model. The estimate is conservative (it counts
# every temporary as simultaneously live; Mosaic reuses buffers), and the
# clamped-W WeatherMesh 1-degree latent ([14,45,90]x128, kernel (3,5,5))
# needs 30.8 MB at its smallest legal tile — measured to compile and run
# fine under the 100 MB scoped-vmem limit, so the budget sits above it.
_VMEM_BWD_BUDGET = 36 * 2**20


# ---------------------------------------------------------------------------
# Static layout (host-side numpy, cached)
# ---------------------------------------------------------------------------


def _axis_halo(k, circular):
    """(back, front) halo extents for one axis.

    Circular axes need exactly k//2 each side. Clamped axes need k-1
    BEHIND: a query within k//2 of the far volume edge has its window
    shifted back to [size-k, size), reaching up to k-1 before itself —
    and tile padding can place such queries at the start of the last
    tile. The forward reach past k//2 only occurs for queries within
    k//2 of position 0, whose deep-forward keys lie inside the first
    tile itself (requires tile >= k//2 + 1, asserted by the picker).
    """
    c = k // 2
    return (c, c) if circular else (k - 1, c)


def _axis_tile_patterns(size, padded, k, tile, circular):
    """Per-tile validity patterns for one axis, deduplicated.

    Returns (classes [n_tiles] int32, patterns list of [tile, u] bool,
    rel [tile, u] int32) where u = tile + back + front and rel is the
    canonical relative offset (key_slot - back - query_offset) + k - 1,
    shared by all tiles.
    """
    c = k // 2
    back, front = _axis_halo(k, circular)
    u = tile + back + front
    n_tiles = padded // tile
    qoff = np.arange(tile)
    joff = np.arange(u)
    rel = np.clip(joff[None, :] - back - qoff[:, None] + k - 1, 0, 2 * k - 2)
    pats: list[np.ndarray] = []
    classes = np.zeros(n_tiles, np.int32)
    seen: dict[bytes, int] = {}
    for bt in range(n_tiles):
        q_abs = bt * tile + qoff  # [tile]
        k_raw = bt * tile - back + joff  # [u]
        if circular:
            k_abs = np.mod(k_raw, size)
            k_ok = np.ones(u, bool)
            delta = np.mod(k_abs[None, :] - q_abs[:, None] + c, size) - c
            member = np.abs(delta) <= c
        else:
            k_abs = k_raw
            k_ok = (k_abs >= 0) & (k_abs < size)
            start = np.clip(q_abs - c, 0, size - k)
            member = (k_abs[None, :] >= start[:, None]) & (
                k_abs[None, :] < start[:, None] + k
            )
        q_ok = q_abs < size
        valid = member & q_ok[:, None] & k_ok[None, :]
        key = valid.tobytes()
        if key not in seen:
            seen[key] = len(pats)
            pats.append(valid)
        classes[bt] = seen[key]
    return classes, pats, rel.astype(np.int32)


def _axis_key_rows(size, padded, tile, k, circular):
    """[n_tiles, u] absolute axis position per halo slot (or -1)."""
    back, front = _axis_halo(k, circular)
    u = tile + back + front
    n_tiles = padded // tile
    joff = np.arange(u)
    rows = np.empty((n_tiles, u), np.int64)
    for bt in range(n_tiles):
        k_raw = bt * tile - back + joff
        if circular:
            rows[bt] = np.mod(k_raw, size)
        else:
            rows[bt] = np.where((k_raw >= 0) & (k_raw < size), k_raw, -1)
    return rows


@dataclasses.dataclass(frozen=True)
class _Layout:
    th: int
    tw: int
    nbh: int
    nbw: int
    hp: int
    wp: int
    block: int
    u_pad: int
    ids: np.ndarray  # [nb, u_pad] int32 rows into the tiled node order
    masks: np.ndarray  # [n_cls, block, u_pad] int8
    cls_tab: np.ndarray  # [nb_pad8, 128] int32 (lane-replicated)
    rel_flat: np.ndarray  # [block, u_pad] int32 into flattened rpb


def _candidate_tiles(d, h, w, kernel, circular_w):
    _, kh, kw = kernel
    ch_, cw = kh // 2, kw // 2
    bh_, fh_ = _axis_halo(kh, False)
    bw_, fw_ = _axis_halo(kw, circular_w)
    cands = []
    for th in (16, 12, 8, 6, 4, 3, 2, 1):
        for tw in (16, 12, 8, 6, 4, 3, 2, 1):
            # th >= kh//2 + 1 keeps a first-tile query's deep-forward
            # keys (up to k-1) inside tile+front halo; circular axes
            # additionally must not alias (halo span <= axis size).
            if th < ch_ + 1 or tw < cw + 1:
                continue
            if circular_w and tw + bw_ + fw_ > w:
                continue
            if (d * th * tw) % 8:
                continue
            cands.append((th, tw))
    # biggest halo-efficiency first: minimize halo ratio, then bigger block
    def ratio(c):
        th, tw = c
        return ((th + bh_ + fh_) * (tw + bw_ + fw_)) / (th * tw)

    return sorted(cands, key=lambda c: (ratio(c), -c[0] * c[1]))


def _n_cls(h, w, kernel, th, tw, circular_w):
    """Exact mask-class count for a (th, tw) tiling — n_h * n_w distinct
    per-axis validity patterns (see _build_layout). Cheap host numpy; the
    VMEM estimators must use this rather than a constant: layouts whose
    clamped halo spans >1 tile produce more than 3 classes per axis, and
    an undercount lets the tile picker choose a tile whose resident mask
    buffer blows the scoped-vmem limit at compile time."""
    _, kh, kw = kernel
    nbh, nbw = -(-h // th), -(-w // tw)
    _, pats_h, _ = _axis_tile_patterns(h, nbh * th, kh, th, False)
    _, pats_w, _ = _axis_tile_patterns(w, nbw * tw, kw, tw, circular_w)
    return len(pats_h) * len(pats_w)


def _est_bytes(d, th, tw, kernel, hc, ch, dt_bytes, circular_w, n_cls=9):
    kd, kh, kw = kernel
    bh, fh = _axis_halo(kh, False)
    bw_, fw = _axis_halo(kw, circular_w)
    block = d * th * tw
    u = d * (th + bh + fh) * (tw + bw_ + fw)
    u_pad = -(-u // 128) * 128
    hpg = 128 // ch
    return (
        2 * block * hpg * u_pad * 4  # logits + p temporaries (f32)
        + block * hpg * u_pad * dt_bytes  # bias (resident)
        + 2 * 128 * hpg * u_pad * dt_bytes  # kT + khat
        + 2 * hpg * u_pad * 128 * dt_bytes  # v + vhat
        + n_cls * block * u_pad  # masks (resident, int8)
        + 2 * block * 128 * dt_bytes  # q, o
    )


@functools.lru_cache(maxsize=32)
def _build_layout(d, h, w, kernel, circular_w, th, tw):
    kd, kh, kw = kernel
    nbh, nbw = -(-h // th), -(-w // tw)
    hp, wp = nbh * th, nbw * tw
    nb = nbh * nbw
    block = d * th * tw
    bh_, fh_ = _axis_halo(kh, False)
    bw_, fw_ = _axis_halo(kw, circular_w)
    uh, uw = th + bh_ + fh_, tw + bw_ + fw_
    u = d * uh * uw
    u_pad = -(-u // 128) * 128

    cls_h, pats_h, rel_h = _axis_tile_patterns(h, hp, kh, th, False)
    cls_w, pats_w, rel_w = _axis_tile_patterns(w, wp, kw, tw, circular_w)

    # D axis: every tile spans the full depth; membership is one matrix.
    qd = np.arange(d)
    start_d = np.clip(qd - kd // 2, 0, d - kd)
    vd = (qd[None, :] >= start_d[:, None]) & (
        qd[None, :] < start_d[:, None] + kd
    )  # [d(query), d(key)]
    rel_d = np.clip(
        qd[None, :] - qd[:, None] + kd - 1, 0, 2 * kd - 2
    )  # [d, d]

    # masks per (h_cls, w_cls): [block, u] via outer product of axis terms
    n_h, n_w = len(pats_h), len(pats_w)
    masks = np.zeros((n_h * n_w, block, u_pad), np.int8)
    for a in range(n_h):
        for b in range(n_w):
            m = (
                vd[:, None, None, :, None, None]
                & pats_h[a][None, :, None, None, :, None]
                & pats_w[b][None, None, :, None, None, :]
            ).reshape(block, u)
            masks[a * n_w + b, :, :u] = m
    cls_tab_flat = (
        cls_h[:, None] * n_w + cls_w[None, :]
    ).reshape(nb).astype(np.int32)
    nb_pad = -(-nb // 8) * 8
    cls_tab = np.zeros((nb_pad, 128), np.int32)
    cls_tab[:nb] = cls_tab_flat[:, None]

    # gather ids: halo slot (dd, a, b) of tile (bh, bw) -> tiled row
    rows_h = _axis_key_rows(h, hp, th, kh, False)  # [nbh, uh]
    rows_w = _axis_key_rows(w, wp, tw, kw, circular_w)  # [nbw, uw]
    hh_abs = rows_h[:, None, None, :, None]  # [nbh, 1, 1, uh, 1]
    ww_abs = rows_w[None, :, None, None, :]  # [1, nbw, 1, 1, uw]
    dd = np.arange(d)[None, None, :, None, None]
    ok = (hh_abs >= 0) & (ww_abs >= 0)
    hh_s = np.maximum(hh_abs, 0)
    ww_s = np.maximum(ww_abs, 0)
    tile_of = (hh_s // th) * nbw + (ww_s // tw)
    row = (
        tile_of * block
        + dd * (th * tw)
        + (hh_s % th) * tw
        + (ww_s % tw)
    )
    row = np.where(ok, row, 0)
    ids = np.zeros((nb, u_pad), np.int32)
    ids[:, :u] = np.broadcast_to(
        row, (nbh, nbw, d, uh, uw)
    ).reshape(nb, u)

    # rpb relative index per canonical (i, j): tile-independent
    r = (
        rel_d[:, None, None, :, None, None] * ((2 * kh - 1) * (2 * kw - 1))
        + rel_h[None, :, None, None, :, None] * (2 * kw - 1)
        + rel_w[None, None, :, None, None, :]
    )
    rel_flat = np.zeros((block, u_pad), np.int32)
    rel_flat[:, :u] = np.broadcast_to(
        r, (d, th, tw, d, uh, uw)
    ).reshape(block, u)

    return _Layout(
        th=th, tw=tw, nbh=nbh, nbw=nbw, hp=hp, wp=wp, block=block,
        u_pad=u_pad, ids=ids, masks=masks, cls_tab=cls_tab,
        rel_flat=rel_flat,
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _flash_kernel(
    q_ref,  # [1, block, 128] (pre-scaled)
    kt_ref,  # [1, 128, u_pad] (transposed keys, this lane group)
    v_ref,  # [1, u_pad, 128]
    mask_ref,  # [n_cls, block, u_pad] int8 (resident)
    bias_ref,  # [1, block, hpg*u_pad]
    ctab_ref,  # [nb_pad, 128] int32 (resident)
    o_ref,  # [1, block, 128]
    *rest,  # (lse_ref [1, block, 128],) when with_lse
    nb,
    hpg,
    ch,
    u_pad,
    has_bias,
    with_lse,
):
    if with_lse:
        (lse_ref,) = rest
    b = pl.program_id(0)
    tile = jax.lax.rem(b, nb)
    cls = ctab_ref[pl.dslice(tile, 1), pl.dslice(0, 1)][0, 0]
    msk = mask_ref[pl.dslice(cls, 1), :, :][0]  # [block, u_pad] int8

    kt = kt_ref[0]  # [128, u_pad]
    row = jax.lax.broadcasted_iota(jnp.int32, kt.shape, 0)
    khat = jnp.concatenate(
        [
            jnp.where((row >= hh * ch) & (row < (hh + 1) * ch), kt, 0)
            for hh in range(hpg)
        ],
        axis=1,
    )  # [128, hpg*u_pad] head-block-diagonal
    s = jax.lax.dot_general(
        q_ref[0], khat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block, hpg*u_pad]
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)

    v = v_ref[0]  # [u_pad, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    parts = []
    vparts = []
    lparts = []
    for hh in range(hpg):
        sl = s[:, hh * u_pad : (hh + 1) * u_pad]
        sl = jnp.where(msk != 0, sl, _NEG)
        m = jnp.maximum(jnp.max(sl, axis=-1, keepdims=True), _SAFE)
        p = jnp.exp(sl - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        parts.append(p / jnp.maximum(l, 1e-30))
        vparts.append(
            jnp.where((lane >= hh * ch) & (lane < (hh + 1) * ch), v, 0)
        )
        if with_lse:
            lse = m + jnp.log(jnp.maximum(l, 1e-30))
            lparts.append(jnp.broadcast_to(lse, (lse.shape[0], ch)))
    phat = jnp.concatenate(parts, axis=1).astype(v.dtype)
    vhat = jnp.concatenate(vparts, axis=0)  # [hpg*u_pad, 128]
    o = jax.lax.dot_general(
        phat, vhat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)
    if with_lse:
        lse_ref[0] = jnp.concatenate(lparts, axis=1)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def _tile_nodes(t, lay, bsz, d, h, w):
    """[B, D, H, W, F] -> [B*nb, block, F] in the tiled row order."""
    f = t.shape[-1]
    nb = lay.nbh * lay.nbw
    t = jnp.pad(
        t, ((0, 0), (0, 0), (0, lay.hp - h), (0, lay.wp - w), (0, 0))
    )
    t = t.reshape(bsz, d, lay.nbh, lay.th, lay.nbw, lay.tw, f)
    t = jnp.transpose(t, (0, 2, 4, 1, 3, 5, 6))
    return t.reshape(bsz * nb, lay.block, f)


def _untile_nodes(t, lay, bsz, d, h, w):
    """Inverse of _tile_nodes: [B*nb, block, F] -> [B, D, H, W, F]."""
    f = t.shape[-1]
    t = t.reshape(bsz, lay.nbh, lay.nbw, d, lay.th, lay.tw, f)
    t = jnp.transpose(t, (0, 3, 1, 4, 2, 5, 6)).reshape(
        bsz, d, lay.hp, lay.wp, f
    )
    return t[:, :, :h, :w]


def _build_bias(rpb, lay, heads, n_groups, hpg, dt):
    """Learned rpb -> [n_groups, block, hpg*u_pad] folded bias (or dummy)."""
    bias_dt = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32
    if rpb is None:
        return jnp.zeros((n_groups, 1, 128), bias_dt), (1, 1, 128)
    block, u_pad = lay.block, lay.u_pad
    rel = jnp.asarray(lay.rel_flat)
    rpb_flat = rpb.reshape(heads, -1)
    per_head = jnp.take(rpb_flat, rel, axis=1)  # [heads, block, u_pad]
    bias = (
        per_head.reshape(n_groups, hpg, block, u_pad)
        .transpose(0, 2, 1, 3)
        .reshape(n_groups, block, hpg * u_pad)
        .astype(bias_dt)
    )
    return bias, (1, block, hpg * u_pad)


def _gather_halo(km, vm, lay, bsz):
    """Tiled K/V rows -> per-tile halo unions [B*nb, u_pad, hc]."""
    nb = lay.nbh * lay.nbw
    hc = km.shape[-1]
    ids = jnp.asarray(lay.ids)
    k_flat = km.reshape(bsz, nb * lay.block, hc)
    v_flat = vm.reshape(bsz, nb * lay.block, hc)
    k_loc = jnp.take(k_flat, ids, axis=1).reshape(bsz * nb, lay.u_pad, hc)
    v_loc = jnp.take(v_flat, ids, axis=1).reshape(bsz * nb, lay.u_pad, hc)
    return k_loc, v_loc


def _flash_fwd_impl(
    q, k, v, rpb, kernel, circular_w, th, tw, interpret, with_lse=False
):
    bsz, d, h, w, heads, ch = q.shape
    hc = heads * ch
    hpg = 128 // ch
    n_groups = hc // 128
    lay = _build_layout(d, h, w, kernel, bool(circular_w), th, tw)
    nb = lay.nbh * lay.nbw
    block, u_pad = lay.block, lay.u_pad
    dt = q.dtype

    scale = ch**-0.5
    qm = _tile_nodes(
        (q * scale).reshape(bsz, d, h, w, hc).astype(dt), lay, bsz, d, h, w
    )
    km = _tile_nodes(k.reshape(bsz, d, h, w, hc), lay, bsz, d, h, w)
    vm = _tile_nodes(v.reshape(bsz, d, h, w, hc), lay, bsz, d, h, w)
    k_loc, v_loc = _gather_halo(km, vm, lay, bsz)
    k_t = jnp.swapaxes(k_loc, 1, 2)  # [B*nb, hc, u_pad]

    bias, bias_block = _build_bias(rpb, lay, heads, n_groups, hpg, dt)
    masks = jnp.asarray(lay.masks)
    ctab = jnp.asarray(lay.cls_tab)
    n_cls = lay.masks.shape[0]
    nb_pad = lay.cls_tab.shape[0]

    out_specs = [pl.BlockSpec((1, block, 128), lambda b, g: (b, 0, g))]
    out_shapes = [jax.ShapeDtypeStruct((bsz * nb, block, hc), dt)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((1, block, 128), lambda b, g: (b, 0, g))
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((bsz * nb, block, hc), jnp.float32)
        )
    res = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            nb=nb, hpg=hpg, ch=ch, u_pad=u_pad, has_bias=rpb is not None,
            with_lse=with_lse,
        ),
        grid=(bsz * nb, n_groups),
        in_specs=[
            pl.BlockSpec((1, block, 128), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, 128, u_pad), lambda b, g: (b, g, 0)),
            pl.BlockSpec((1, u_pad, 128), lambda b, g: (b, 0, g)),
            pl.BlockSpec((n_cls, block, u_pad), lambda b, g: (0, 0, 0)),
            pl.BlockSpec(bias_block, lambda b, g: (g, 0, 0)),
            pl.BlockSpec((nb_pad, 128), lambda b, g: (0, 0)),
        ],
        out_specs=out_specs if with_lse else out_specs[0],
        out_shape=out_shapes if with_lse else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qm, k_t, v_loc, masks, bias, ctab)
    out, lse_t = res if with_lse else (res, None)

    out = _untile_nodes(out, lay, bsz, d, h, w).reshape(
        bsz, d, h, w, heads, ch
    )
    if not with_lse:
        return out, None
    # Folded-lane lse (each head's value broadcast over its ch lanes) ->
    # per-node per-head values, independent of the tiling so the backward
    # may retile at a different (th, tw).
    lse_nodes = _untile_nodes(lse_t, lay, bsz, d, h, w).reshape(
        bsz, d, h, w, heads, ch
    )[..., 0]
    return out, lse_nodes


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _est_bytes_bwd(d, th, tw, kernel, hc, ch, dt_bytes, circular_w, has_bias,
                   n_cls=9):
    kd, kh, kw = kernel
    bh, fh = _axis_halo(kh, False)
    bw_, fw = _axis_halo(kw, circular_w)
    block = d * th * tw
    u = d * (th + bh + fh) * (tw + bw_ + fw)
    u_pad = -(-u // 128) * 128
    hpg = 128 // ch
    wide = hpg * u_pad
    return (
        4 * block * wide * 4  # s, p, dp, ds f32 temporaries
        + (block * wide * (4 + dt_bytes) if has_bias else 0)  # dbias + bias
        + 2 * 128 * wide * dt_bytes  # kT + khat
        + 2 * wide * 128 * dt_bytes  # v + vhat
        + 2 * 128 * wide * 4  # dk/dv full temporaries (f32)
        + n_cls * block * u_pad  # masks (resident, int8)
        + 4 * block * 128 * dt_bytes  # q, do, dq, o streams
        + 2 * block * 128 * 4  # lse, delta (f32)
        + 2 * 128 * u_pad * dt_bytes  # dkt, dvt outs
    )


def _flash_bwd_kernel(
    q_ref,  # [1, block, 128] (pre-scaled)
    kt_ref,  # [1, 128, u_pad]
    v_ref,  # [1, u_pad, 128]
    do_ref,  # [1, block, 128]
    lse_ref,  # [1, block, 128] per-head lse broadcast over head lanes
    delta_ref,  # [1, block, 128] sum(dO*O) per head, same lane layout
    mask_ref,  # [n_cls, block, u_pad] int8 (resident)
    bias_ref,  # [1, block, hpg*u_pad]
    ctab_ref,  # [nb_pad, 128] int32 (resident)
    dq_ref,  # [1, block, 128]
    dkt_ref,  # [1, 128, u_pad] (transposed block-local dk)
    dvt_ref,  # [1, 128, u_pad]
    *rest,  # (dbias_ref [1, block, hpg*u_pad] f32,) when has_bias
    nb,
    hpg,
    ch,
    u_pad,
    has_bias,
    scale,
):
    if has_bias:
        (dbias_ref,) = rest
    b = pl.program_id(1)
    tile = jax.lax.rem(b, nb)
    cls = ctab_ref[pl.dslice(tile, 1), pl.dslice(0, 1)][0, 0]
    msk = mask_ref[pl.dslice(cls, 1), :, :][0]  # [block, u_pad] int8

    kt = kt_ref[0]  # [128, u_pad]
    row = jax.lax.broadcasted_iota(jnp.int32, kt.shape, 0)
    khat = jnp.concatenate(
        [
            jnp.where((row >= hh * ch) & (row < (hh + 1) * ch), kt, 0)
            for hh in range(hpg)
        ],
        axis=1,
    )  # [128, hpg*u_pad]
    s = jax.lax.dot_general(
        q_ref[0], khat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block, hpg*u_pad]
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)

    v = v_ref[0]  # [u_pad, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    vhat = jnp.concatenate(
        [
            jnp.where((lane >= hh * ch) & (lane < (hh + 1) * ch), v, 0)
            for hh in range(hpg)
        ],
        axis=0,
    )  # [hpg*u_pad, 128]
    do = do_ref[0]  # [block, 128]
    dp = jax.lax.dot_general(
        do, vhat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block, hpg*u_pad]

    pparts = []
    dsparts = []
    for hh in range(hpg):
        sl = s[:, hh * u_pad : (hh + 1) * u_pad]
        sl = jnp.where(msk != 0, sl, _NEG)
        lse_h = lse_ref[0][:, hh * ch : hh * ch + 1]
        p = jnp.exp(sl - lse_h)  # exact zeros at masked/padded slots
        delta_h = delta_ref[0][:, hh * ch : hh * ch + 1]
        ds = p * (dp[:, hh * u_pad : (hh + 1) * u_pad] - delta_h)
        pparts.append(p)
        dsparts.append(ds)
    phat = jnp.concatenate(pparts, axis=1)  # [block, hpg*u_pad] f32
    dshat = jnp.concatenate(dsparts, axis=1)

    if has_bias:
        # rpb is translation invariant: accumulate dS over every tile and
        # batch row (consecutive revisits of the same output block along
        # the innermost grid axis), segment-summed over rel_flat in XLA.
        @pl.when(b == 0)
        def _init():
            dbias_ref[0] = dshat

        @pl.when(b != 0)
        def _acc():
            dbias_ref[0] += dshat

    dsc = dshat.astype(kt.dtype)
    dq = jax.lax.dot_general(
        dsc, khat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block, 128]; d(q*scale) -> dq needs the extra *scale
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)

    # dk in kT layout: full[r, hh*u_pad+j] = sum_i q_scaled[i, r] ds_h[i, j];
    # the true rows of head hh are its own lanes — head-diagonal select.
    dkfull = jax.lax.dot_general(
        q_ref[0], dsc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [128, hpg*u_pad]
    dvfull = jax.lax.dot_general(
        do, phat.astype(do.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [128, hpg*u_pad]
    rowm = [
        (row >= hh * ch) & (row < (hh + 1) * ch) for hh in range(hpg)
    ]
    dkt = sum(
        jnp.where(rowm[hh], dkfull[:, hh * u_pad : (hh + 1) * u_pad], 0)
        for hh in range(hpg)
    )
    dvt = sum(
        jnp.where(rowm[hh], dvfull[:, hh * u_pad : (hh + 1) * u_pad], 0)
        for hh in range(hpg)
    )
    dkt_ref[0] = dkt.astype(dkt_ref.dtype)
    dvt_ref[0] = dvt.astype(dvt_ref.dtype)


def _flash_bwd_impl(q, k, v, rpb, out, lse_nodes, g, kernel, circular_w,
                    interpret):
    bsz, d, h, w, heads, ch = q.shape
    hc = heads * ch
    hpg = 128 // ch
    n_groups = hc // 128
    dt = q.dtype
    dt_bytes = 2 if dt == jnp.bfloat16 else 4
    has_bias = rpb is not None

    chosen = None
    for th, tw in _candidate_tiles(d, h, w, kernel, bool(circular_w)):
        if th > h or tw > w:
            continue
        est = _est_bytes_bwd(
            d, th, tw, kernel, hc, ch, dt_bytes, bool(circular_w), has_bias,
            n_cls=_n_cls(h, w, kernel, th, tw, bool(circular_w)),
        )
        if est <= _VMEM_BWD_BUDGET:
            chosen = (th, tw)
            break
    if chosen is None:
        return None  # caller falls back to the XLA VJP

    lay = _build_layout(d, h, w, kernel, bool(circular_w), *chosen)
    nb = lay.nbh * lay.nbw
    block, u_pad = lay.block, lay.u_pad
    scale = ch**-0.5

    qm = _tile_nodes(
        (q * scale).reshape(bsz, d, h, w, hc).astype(dt), lay, bsz, d, h, w
    )
    km = _tile_nodes(k.reshape(bsz, d, h, w, hc), lay, bsz, d, h, w)
    vm = _tile_nodes(v.reshape(bsz, d, h, w, hc), lay, bsz, d, h, w)
    dom = _tile_nodes(
        g.reshape(bsz, d, h, w, hc).astype(dt), lay, bsz, d, h, w
    )
    k_loc, v_loc = _gather_halo(km, vm, lay, bsz)
    k_t = jnp.swapaxes(k_loc, 1, 2)

    delta_nodes = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [B, D, H, W, heads]

    def fold_scalar(t):
        tt = jnp.broadcast_to(
            t[..., None], (bsz, d, h, w, heads, ch)
        ).reshape(bsz, d, h, w, hc)
        return _tile_nodes(tt.astype(jnp.float32), lay, bsz, d, h, w)

    lse_m = fold_scalar(lse_nodes)
    delta_m = fold_scalar(delta_nodes)

    bias, bias_block = _build_bias(rpb, lay, heads, n_groups, hpg, dt)
    masks = jnp.asarray(lay.masks)
    ctab = jnp.asarray(lay.cls_tab)
    n_cls = lay.masks.shape[0]
    nb_pad = lay.cls_tab.shape[0]
    bnb = bsz * nb

    out_specs = [
        pl.BlockSpec((1, block, 128), lambda gg, b: (b, 0, gg)),
        pl.BlockSpec((1, 128, u_pad), lambda gg, b: (b, gg, 0)),
        pl.BlockSpec((1, 128, u_pad), lambda gg, b: (b, gg, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((bnb, block, hc), dt),
        jax.ShapeDtypeStruct((bnb, hc, u_pad), dt),
        jax.ShapeDtypeStruct((bnb, hc, u_pad), dt),
    ]
    if has_bias:
        out_specs.append(
            pl.BlockSpec((1, block, hpg * u_pad), lambda gg, b: (gg, 0, 0))
        )
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (n_groups, block, hpg * u_pad), jnp.float32
            )
        )

    res = pl.pallas_call(
        functools.partial(
            _flash_bwd_kernel,
            nb=nb, hpg=hpg, ch=ch, u_pad=u_pad, has_bias=has_bias,
            scale=scale,
        ),
        grid=(n_groups, bnb),
        in_specs=[
            pl.BlockSpec((1, block, 128), lambda gg, b: (b, 0, gg)),
            pl.BlockSpec((1, 128, u_pad), lambda gg, b: (b, gg, 0)),
            pl.BlockSpec((1, u_pad, 128), lambda gg, b: (b, 0, gg)),
            pl.BlockSpec((1, block, 128), lambda gg, b: (b, 0, gg)),
            pl.BlockSpec((1, block, 128), lambda gg, b: (b, 0, gg)),
            pl.BlockSpec((1, block, 128), lambda gg, b: (b, 0, gg)),
            pl.BlockSpec((n_cls, block, u_pad), lambda gg, b: (0, 0, 0)),
            pl.BlockSpec(bias_block, lambda gg, b: (gg, 0, 0)),
            pl.BlockSpec((nb_pad, 128), lambda gg, b: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qm, k_t, v_loc, dom, lse_m, delta_m, masks, bias, ctab)
    if has_bias:
        dq_t, dkt, dvt, dbias = res
    else:
        dq_t, dkt, dvt = res
        dbias = None

    dq = _untile_nodes(dq_t, lay, bsz, d, h, w).reshape(
        bsz, d, h, w, heads, ch
    )

    # Halo unions overlap between adjacent tiles, but the overlap is
    # STRUCTURED: tile i's halo rows live in tile-aligned chunks
    # i-1..i+ceil(halo/tile), so splitting the halo axis into tile-sized
    # chunks makes each chunk's contributions disjoint across tiles. The
    # scatter-add is then ceil(uh/th)*ceil(uw/tw) shifted dense adds plus
    # an edge crop/fold — no segment_sum (which cost ~2/3 of the whole
    # backward's overhead at WeatherMesh 1-degree scale).
    kd_, kh_, kw_ = kernel
    bh_, fh_ = _axis_halo(kh_, False)
    bw_, fw_ = _axis_halo(kw_, bool(circular_w))
    uh = lay.th + bh_ + fh_
    uw = lay.tw + bw_ + fw_
    u = d * uh * uw

    def _overlap_add_axis(x, axis_tiles, axis_halo, tile, n_tiles):
        """x[..., n_tiles(axis_tiles), u(axis_halo), ...] -> merged axis.

        Returns the tensor with (tiles, halo) collapsed into one extended
        dense axis of length (n_tiles + n_chunks - 1) * tile, where
        position p holds the sum of every tile's contribution to absolute
        row p - back."""
        uu = x.shape[axis_halo]
        n_chunks = -(-uu // tile)
        pad = [(0, 0)] * x.ndim
        pad[axis_halo] = (0, n_chunks * tile - uu)
        x = jnp.pad(x, pad)
        new_shape = (
            x.shape[:axis_halo]
            + (n_chunks, tile)
            + x.shape[axis_halo + 1 :]
        )
        x = x.reshape(new_shape)  # [..., n_tiles, n_chunks, tile, ...]
        out_shape = (
            x.shape[:axis_tiles]
            + (n_tiles + n_chunks - 1, tile)
            + x.shape[axis_halo + 2 :]
        )
        out = jnp.zeros(out_shape, x.dtype)
        idx_all = [slice(None)] * len(out_shape)
        for c in range(n_chunks):
            src = jax.lax.index_in_dim(x, c, axis_halo, keepdims=False)
            idx = list(idx_all)
            idx[axis_tiles] = slice(c, c + n_tiles)
            out = out.at[tuple(idx)].add(src)
        return out.reshape(
            out_shape[:axis_tiles]
            + ((n_tiles + n_chunks - 1) * tile,)
            + out_shape[axis_tiles + 2 :]
        )

    def _fold_w_circular(x, axis):
        """Extended dense W axis -> [w] with circular wrap-add.

        Position p on the extended axis is absolute column (p - bw_) % w;
        the span is < 2w for every legal circular layout (tw + halo <= w,
        asserted by the tile picker), so one forward fold + the head wrap
        suffice, both static slices."""
        ext = x.shape[axis]
        main = jax.lax.slice_in_dim(x, bw_, min(bw_ + w, ext), axis=axis)
        if main.shape[axis] < w:
            pad = [(0, 0)] * x.ndim
            pad[axis] = (0, w - main.shape[axis])
            main = jnp.pad(main, pad)
        idx = [slice(None)] * x.ndim
        for off in range(bw_ + w, ext, w):
            seg = jax.lax.slice_in_dim(x, off, min(off + w, ext), axis=axis)
            i2 = list(idx)
            i2[axis] = slice(0, seg.shape[axis])
            main = main.at[tuple(i2)].add(seg)
        head = jax.lax.slice_in_dim(x, 0, bw_, axis=axis)
        i2 = list(idx)
        i2[axis] = slice(w - bw_, w)
        return main.at[tuple(i2)].add(head)

    def scatter(t_loc):
        # [bnb, hc, u_pad] -> [bsz, d, nbh, uh, nbw, uw, hc]
        x = jnp.swapaxes(t_loc, 1, 2)[:, :u].astype(jnp.float32)
        x = x.reshape(bsz, lay.nbh, lay.nbw, d, uh, uw, hc)
        x = jnp.transpose(x, (0, 3, 1, 4, 2, 5, 6))
        # H: overlap-add then crop (clamped; out-of-range rows hold exact
        # zeros - masked logits zero ds/p columns).
        x = _overlap_add_axis(x, 2, 3, lay.th, lay.nbh)
        x = jax.lax.slice_in_dim(x, bh_, bh_ + h, axis=2)
        # W: overlap-add then crop or circular fold.
        x = _overlap_add_axis(x, 3, 4, lay.tw, lay.nbw)
        if circular_w:
            x = _fold_w_circular(x, 3)
        else:
            x = jax.lax.slice_in_dim(x, bw_, bw_ + w, axis=3)
        return x.astype(dt).reshape(bsz, d, h, w, heads, ch)

    dk = scatter(dkt)
    dv = scatter(dvt)

    if not has_bias:
        return dq, dk, dv, None
    kd, kh, kw = kernel
    n_rel = (2 * kd - 1) * (2 * kh - 1) * (2 * kw - 1)
    rel_ids = jnp.asarray(lay.rel_flat).reshape(-1)
    dbias_heads = (
        dbias.reshape(n_groups, block, hpg, u_pad)
        .transpose(0, 2, 1, 3)
        .reshape(heads, block * u_pad)
    )
    drpb = jax.vmap(
        lambda t: jax.ops.segment_sum(t, rel_ids, num_segments=n_rel)
    )(dbias_heads)
    return dq, dk, dv, drpb.reshape(rpb.shape).astype(rpb.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, rpb, kernel, circular_w, th, tw, interpret):
    out, _ = _flash_fwd_impl(
        q, k, v, rpb, kernel, circular_w, th, tw, interpret
    )
    return out


def _flash_fwd(q, k, v, rpb, kernel, circular_w, th, tw, interpret):
    out, lse = _flash_fwd_impl(
        q, k, v, rpb, kernel, circular_w, th, tw, interpret, with_lse=True
    )
    return out, (q, k, v, rpb, out, lse)


def _flash_bwd(kernel, circular_w, th, tw, interpret, res, g):
    q, k, v, rpb, out, lse = res
    grads = _flash_bwd_impl(
        q, k, v, rpb, out, lse, g, kernel, circular_w, interpret
    )
    if grads is not None:
        return grads
    # No backward tile fits VMEM: differentiate the XLA slot scan instead.
    from graph_weather_tpu.ops.neighborhood_attention import (
        neighborhood_attention_3d_xla,
    )

    if rpb is None:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: neighborhood_attention_3d_xla(
                q_, k_, v_, kernel, None, circular_w
            ),
            q, k, v,
        )
        return (*vjp(g), None)
    _, vjp = jax.vjp(
        lambda q_, k_, v_, r_: neighborhood_attention_3d_xla(
            q_, k_, v_, kernel, r_, circular_w
        ),
        q, k, v, rpb,
    )
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def neighborhood_attention_3d_flash(
    q: jnp.ndarray,  # [B, D, H, W, heads, ch]
    k: jnp.ndarray,
    v: jnp.ndarray,
    kernel: tuple[int, int, int],
    rpb: jnp.ndarray | None = None,
    circular_w: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Block-dense halo NATTEN forward (+ XLA-backward custom_vjp).

    Raises ValueError when the shape doesn't qualify (caller falls back
    to the slot kernel / XLA scan): heads*ch must be a multiple of 128
    with ch dividing 128, every axis must be >= its kernel size, and the
    per-tile working set must fit VMEM at some tile size.
    """
    bsz, d, h, w, heads, ch = q.shape
    hc = heads * ch
    if hc % 128 != 0 or 128 % ch != 0:
        raise ValueError(
            f"heads*ch = {hc} must be a multiple of 128 with ch ({ch}) "
            "dividing 128 for the NATTEN flash kernel"
        )
    kd, kh, kw = kernel
    for size, kk in zip((d, h, w), kernel):
        if kk > size:
            raise ValueError(f"kernel {kernel} exceeds volume {(d, h, w)}")
    dt_bytes = 2 if q.dtype == jnp.bfloat16 else 4
    chosen = None
    for th, tw in _candidate_tiles(d, h, w, kernel, bool(circular_w)):
        if th > h or tw > w:
            continue
        est = _est_bytes(
            d, th, tw, kernel, hc, ch, dt_bytes, bool(circular_w),
            n_cls=_n_cls(h, w, kernel, th, tw, bool(circular_w)),
        )
        if est <= _VMEM_MODEL_BUDGET:
            chosen = (th, tw)
            break
    if chosen is None:
        raise ValueError(
            f"NATTEN flash working set for volume {(d, h, w)} x {hc} "
            "exceeds VMEM at every tile size"
        )
    return _flash(
        q, k, v, rpb, tuple(kernel), bool(circular_w), chosen[0], chosen[1],
        interpret,
    )
