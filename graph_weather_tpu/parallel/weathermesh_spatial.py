"""Spatially-sharded WeatherMesh: latitude (H) slabs over a device mesh.

WeatherMesh is the one model family whose production resolution exceeds a
single chip's HBM at train time (reference weathermesh2.py:69-149 targets
0.25 deg = 720x1440 x 13 levels); its conv + neighborhood-attention stack
is also the natural fit for halo exchange: every op's receptive field
along latitude is a small constant, so each device can own a contiguous
H-slab and fetch only kernel-halo rows from its two neighbors with
`jax.lax.ppermute` over ICI — no all_gather of the volume, communication
volume per layer = O(halo * W * C) per device, independent of H.

Design (explicit shard_map, numerics match the unsharded model):

  * Convs: exchange `k//2` boundary rows per conv, then run the conv
    VALID along H on the halo-extended slab (padding stays symmetric
    along W/D). `ppermute` leaves unpaired edges as ZEROS, which is
    exactly the reference's torch zero padding at the global boundary —
    so boundary devices are exact by construction.
  * Stride-2 downsampling convs require even slab sizes (validated);
    slab starts are then even at every level so the strided window grid
    matches the unsharded op's.
  * GroupNorm statistics span the FULL (D, H, W) volume per sample in
    the unsharded model, so the sharded version computes slab-local
    sums and combines them with `lax.psum` — exact up to re-association.
    BatchNorm (the reference-parity "batch" norm) is per-channel
    running stats: purely local.
  * Bilinear x2 upsampling (half-pixel) is separable: W rides
    jax.image.resize locally; H is computed from one exchanged halo row
    with edge-replication at the global boundary (== jax.image.resize's
    clamped sampling).
  * Neighborhood attention: K/V halo of `kh//2` rows; interior queries
    then see exactly their unclamped window. NATTEN's *clamped* (edge-
    shifted) windows only differ for the first/last `kh//2` global
    rows, which are recomputed from the boundary device's first/last
    `kh` own rows and selected in by `lax.axis_index` — two tiny extra
    attention calls, SPMD-uniform.

The per-device attention calls dispatch to the same Pallas flash kernel
as the unsharded model (ops/pallas/natten_flash.py) when the local slab
qualifies, so the sharded production step keeps the single-chip kernel
performance.

Reference hot path: graph_weather/models/weathermesh/processor.py:27-45
(natten NeighborhoodAttention3D), weathermesh2.py:135-149 (rollout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_weather_tpu.models.weathermesh.model import (
    WeatherMeshConfig,
    WeatherMeshOutput,
)
from graph_weather_tpu.ops.neighborhood_attention import (
    neighborhood_attention_3d,
)


# ---------------------------------------------------------------------------
# halo exchange
# ---------------------------------------------------------------------------


def _halo_rows(x: jnp.ndarray, h: int, axis_name: str, n: int, ax: int):
    """(rows_above, rows_below): h rows from the previous / next device
    along `ax`. Unpaired global edges come back as ZEROS (ppermute
    semantics) — matching torch zero padding."""
    size = x.shape[ax]
    below_src = jax.lax.slice_in_dim(x, size - h, size, axis=ax)
    above = jax.lax.ppermute(
        below_src, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    above_src = jax.lax.slice_in_dim(x, 0, h, axis=ax)
    below = jax.lax.ppermute(
        above_src, axis_name, [(i, i - 1) for i in range(1, n)]
    )
    return above, below


def _extend(x: jnp.ndarray, h: int, axis_name: str, n: int, ax: int):
    above, below = _halo_rows(x, h, axis_name, n, ax)
    return jnp.concatenate([above, x, below], axis=ax)


# ---------------------------------------------------------------------------
# primitive layers on raw param subtrees
# ---------------------------------------------------------------------------


def _conv(x, kernel, strides, padding, bias=None):
    """lax conv over channels-last x with a flax (spatial..., in, out)
    kernel. `padding` is per-spatial-dim [(lo, hi)]."""
    nd = kernel.ndim - 2
    dn = jax.lax.conv_dimension_numbers(
        x.shape,
        kernel.shape,
        ("NHWC", "HWIO", "NHWC") if nd == 2 else ("NDHWC", "DHWIO", "NDHWC"),
    )
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), strides, padding, dimension_numbers=dn
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _norm_apply(p, stats, x, axis_name: str, kind: str, eps: float = 1e-5):
    """GroupNorm with cross-shard (psum) statistics, or eval-mode
    BatchNorm from running stats (local). Matches models.weathermesh._norm."""
    c = x.shape[-1]
    if kind == "batch":
        mean = stats["mean"].astype(x.dtype)
        var = stats["var"].astype(x.dtype)
        inv = jax.lax.rsqrt(var + eps)
        return (x - mean) * inv * p["scale"].astype(x.dtype) + p[
            "bias"
        ].astype(x.dtype)
    g = min(32, c)
    xg = x.reshape(x.shape[:-1] + (g, c // g)).astype(jnp.float32)
    red = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    n_local = 1
    for d in red:
        n_local *= xg.shape[d]
    count = n_local * jax.lax.psum(1, axis_name)
    # Two-pass mean/variance (matches flax GroupNorm's mean-of-squared-
    # deviations; the one-pass E[x^2]-E[x]^2 form differs by ~1e-4 rel
    # in f32, outside the exact-match tolerance).
    mean = jax.lax.psum(jnp.sum(xg, axis=red), axis_name) / count  # [B, g]
    shape = (x.shape[0],) + (1,) * (xg.ndim - 3) + (g, 1)
    centered = xg - mean.reshape(shape)
    var = jax.lax.psum(
        jnp.sum(jnp.square(centered), axis=red), axis_name
    ) / count
    xn = centered * jax.lax.rsqrt(var.reshape(shape) + eps)
    xn = xn.reshape(x.shape).astype(x.dtype)
    return xn * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _norm_keys(block_params, block_stats, idx: int, kind: str):
    name = ("BatchNorm_" if kind == "batch" else "GroupNorm_") + str(idx)
    stats = (block_stats or {}).get(name) if kind == "batch" else None
    return block_params[name], stats


def _conv_down_block(p, stats, x, is_3d, axis_name, n, kind):
    """ConvDownBlock (models/weathermesh/model.py:91-125) with per-conv
    halo exchange; stride (1, 2, 2) on 3D paths, 2 on 2D."""
    ax = 2 if is_3d else 1
    nd = 3 if is_3d else 2
    stride2 = (1, 2, 2) if is_3d else (2, 2)
    pad_w = [(1, 1)] * nd
    pad_w[ax - 1] = (0, 0)  # H handled by the halo

    np1, ns1 = _norm_keys(p, stats, 0, kind)
    identity = _conv(x, p["Conv_0"]["kernel"], stride2, [(0, 0)] * nd)
    identity = _norm_apply(np1, ns1, identity, axis_name, kind)

    out = _conv(
        _extend(x, 1, axis_name, n, ax),
        p["Conv_1"]["kernel"], (1,) * nd, pad_w,
    )
    np2, ns2 = _norm_keys(p, stats, 1, kind)
    out = jax.nn.gelu(
        _norm_apply(np2, ns2, out, axis_name, kind), approximate=False
    )
    out = _conv(
        _extend(out, 1, axis_name, n, ax),
        p["Conv_2"]["kernel"], stride2, pad_w,
    )
    np3, ns3 = _norm_keys(p, stats, 2, kind)
    out = _norm_apply(np3, ns3, out, axis_name, kind)
    return jax.nn.gelu(out + identity, approximate=False)


def _resize_h_x2(x, axis_name, n, ax):
    """Separable half-pixel linear x2 upsample along the SHARDED H axis:
    out[2i] = 0.25*x[i-1] + 0.75*x[i]; out[2i+1] = 0.75*x[i] + 0.25*x[i+1]
    with edge REPLICATION at the global boundary (jax.image.resize's
    clamped sampling), selected by axis_index."""
    above, below = _halo_rows(x, 1, axis_name, n, ax)
    idx = jax.lax.axis_index(axis_name)
    first = jax.lax.slice_in_dim(x, 0, 1, axis=ax)
    last = jax.lax.slice_in_dim(x, x.shape[ax] - 1, x.shape[ax], axis=ax)
    above = jnp.where(idx == 0, first, above)
    below = jnp.where(idx == n - 1, last, below)
    prev = jnp.concatenate(
        [above, jax.lax.slice_in_dim(x, 0, x.shape[ax] - 1, axis=ax)], axis=ax
    )
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, x.shape[ax], axis=ax), below], axis=ax
    )
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    out = jnp.stack([even, odd], axis=ax + 1)
    return out.reshape(
        x.shape[:ax] + (2 * x.shape[ax],) + x.shape[ax + 1:]
    )


def _resize_w_x2(x, ax_w):
    """Unsharded W upsample via jax.image.resize (linear, half-pixel)."""
    shape = list(x.shape)
    shape[ax_w] *= 2
    return jax.image.resize(x, tuple(shape), method="linear")


def _conv_up_block(p, stats, x, is_3d, axis_name, n, kind):
    """ConvUpBlock (models/weathermesh/model.py:128-160): x2 upsample
    (H sharded, W local) then stride-1 convs with halo."""
    ax = 2 if is_3d else 1
    nd = 3 if is_3d else 2
    pad_w = [(1, 1)] * nd
    pad_w[ax - 1] = (0, 0)

    x = _resize_h_x2(x, axis_name, n, ax)
    x = _resize_w_x2(x, ax + 1)

    np1, ns1 = _norm_keys(p, stats, 0, kind)
    identity = _conv(x, p["Conv_0"]["kernel"], (1,) * nd, [(0, 0)] * nd)
    identity = _norm_apply(np1, ns1, identity, axis_name, kind)

    out = _conv(
        _extend(x, 1, axis_name, n, ax),
        p["Conv_1"]["kernel"], (1,) * nd, pad_w,
    )
    np2, ns2 = _norm_keys(p, stats, 1, kind)
    out = jax.nn.gelu(
        _norm_apply(np2, ns2, out, axis_name, kind), approximate=False
    )
    out = _conv(
        _extend(out, 1, axis_name, n, ax),
        p["Conv_2"]["kernel"], (1,) * nd, pad_w,
    )
    np3, ns3 = _norm_keys(p, stats, 2, kind)
    out = _norm_apply(np3, ns3, out, axis_name, kind)
    return jax.nn.gelu(out + identity, approximate=False)


def _natten_layer(p, x, kernel, num_heads, axis_name, n, impl="auto"):
    """NeighborhoodAttention3D (qkv -> clamped-window attention -> out
    proj) on an H-slab. K/V halo of kh//2 rows makes interior queries
    exact; the first/last kh//2 GLOBAL rows (edge-clamped windows) are
    recomputed from the boundary device's own first/last kh rows."""
    b, d, sl, w, c = x.shape
    kd, kh, kw = kernel
    ch = c // num_heads
    hc = kh // 2

    def proj(t, name):
        out = t @ p[name]["kernel"].astype(t.dtype)
        return out + p[name]["bias"].astype(t.dtype)

    qkv = proj(x, "TorchLinear_0")
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(t.shape[:-1] + (num_heads, ch))

    rpb = p["rpb"]
    q, k, v = heads(q), heads(k), heads(v)

    # interior: halo'd K/V (and Q rows cropped back out)
    q_ext = _extend(q, hc, axis_name, n, 2)
    k_ext = _extend(k, hc, axis_name, n, 2)
    v_ext = _extend(v, hc, axis_name, n, 2)
    out = neighborhood_attention_3d(
        q_ext, k_ext, v_ext, kernel=kernel, rpb=rpb, impl=impl
    )[:, :, hc: hc + sl]

    if hc > 0:
        idx = jax.lax.axis_index(axis_name)
        top = neighborhood_attention_3d(
            q[:, :, :kh], k[:, :, :kh], v[:, :, :kh],
            kernel=kernel, rpb=rpb, impl=impl,
        )[:, :, :hc]
        bot = neighborhood_attention_3d(
            q[:, :, sl - kh:], k[:, :, sl - kh:], v[:, :, sl - kh:],
            kernel=kernel, rpb=rpb, impl=impl,
        )[:, :, kh - hc:]
        out = out.at[:, :, :hc].set(
            jnp.where(idx == 0, top, out[:, :, :hc])
        )
        out = out.at[:, :, sl - hc:].set(
            jnp.where(idx == n - 1, bot, out[:, :, sl - hc:])
        )

    out = out.reshape(b, d, sl, w, c)
    return proj(out, "TorchLinear_1")


# ---------------------------------------------------------------------------
# model stages
# ---------------------------------------------------------------------------


def _encoder(p, stats, surface, pressure, cfg, axis_name, n, impl):
    kind = cfg.norm
    for i in range(cfg.encoder_num_conv_blocks):
        surface = _conv_down_block(
            p[f"ConvDownBlock_{2 * i}"],
            (stats or {}).get(f"ConvDownBlock_{2 * i}"),
            surface, False, axis_name, n, kind,
        )
        pressure = _conv_down_block(
            p[f"ConvDownBlock_{2 * i + 1}"],
            (stats or {}).get(f"ConvDownBlock_{2 * i + 1}"),
            pressure, True, axis_name, n, kind,
        )
    features = jnp.concatenate([pressure, surface[:, None]], axis=1)
    latent = _conv(
        features, p["Conv_0"]["kernel"], (1, 1, 1), [(0, 0)] * 3,
        bias=p["Conv_0"]["bias"],
    )
    for i in range(cfg.encoder_num_transformer_layers):
        latent = _natten_layer(
            p[f"NeighborhoodAttention3D_{i}"], latent,
            tuple(cfg.kernel), cfg.num_heads, axis_name, n, impl,
        )
    return latent


def _processor_chain(p, latent, cfg, axis_name, n, impl):
    for t in range(len(cfg.timesteps)):
        proc = p[f"WeatherMeshProcessor_{t}"]
        for i in range(cfg.processor_num_layers):
            latent = _natten_layer(
                proc[f"NeighborhoodAttention3D_{i}"], latent,
                tuple(cfg.kernel), cfg.num_heads, axis_name, n, impl,
            )
    return latent


def _decoder(p, stats, latent, cfg, axis_name, n, impl):
    kind = cfg.norm
    for i in range(cfg.decoder_num_transformer_layers):
        latent = _natten_layer(
            p[f"NeighborhoodAttention3D_{i}"], latent,
            tuple(cfg.kernel), cfg.num_heads, axis_name, n, impl,
        )
    features = _conv(
        latent, p["Conv_0"]["kernel"], (1, 1, 1), [(0, 0)] * 3,
        bias=p["Conv_0"]["bias"],
    )
    pressure = features[:, :-1]
    surface = features[:, -1]
    nb = cfg.decoder_num_conv_blocks
    for j, _i in enumerate(reversed(range(nb))):
        pressure = _conv_up_block(
            p[f"ConvUpBlock_{2 * j}"],
            (stats or {}).get(f"ConvUpBlock_{2 * j}"),
            pressure, True, axis_name, n, kind,
        )
        surface = _conv_up_block(
            p[f"ConvUpBlock_{2 * j + 1}"],
            (stats or {}).get(f"ConvUpBlock_{2 * j + 1}"),
            surface, False, axis_name, n, kind,
        )
    return surface, pressure


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def validate_spatial_config(
    cfg: WeatherMeshConfig, height: int, n_shards: int
) -> None:
    """Shape constraints for exact H-slab sharding."""
    if height % n_shards:
        raise ValueError(f"H={height} not divisible by {n_shards} shards")
    slab = height // n_shards
    down = 2 ** cfg.encoder_num_conv_blocks
    if slab % down:
        raise ValueError(
            f"slab {slab} not divisible by the conv downsampling {down} "
            "(stride-2 window grids would cross shard boundaries misaligned)"
        )
    kh = cfg.kernel[1]
    if slab // down < kh:
        raise ValueError(
            f"latent slab {slab // down} is smaller than the attention "
            f"kernel height {kh}; use fewer shards"
        )


def spatial_forward_fn(
    cfg: WeatherMeshConfig,
    mesh: Mesh,
    axis: str = "spatial",
    impl: str = "auto",
    forecast_steps: int = 1,
):
    """Latitude-sharded WeatherMesh forward over `mesh[axis]`.

    Returns fn(variables, surface [B, H, W, C2], pressure
    [B, D, H, W, C3]) -> WeatherMeshOutput with surface/pressure H-sharded
    on the mesh (same partitioning as the inputs). Params are replicated;
    per-layer halos ride `ppermute` over ICI.
    """
    n = mesh.shape[axis]
    axis_name = axis

    def local(variables, surface, pressure):
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        latent = _encoder(
            params["WeatherMeshEncoder_0"],
            stats.get("WeatherMeshEncoder_0"),
            surface, pressure, cfg, axis_name, n, impl,
        )

        if forecast_steps == 1:
            latent = _processor_chain(
                params["processors"], latent, cfg, axis_name, n, impl
            )
        else:
            def step(carry, _):
                return (
                    _processor_chain(
                        params["processors"], carry, cfg, axis_name, n, impl
                    ),
                    None,
                )

            latent, _ = jax.lax.scan(
                step, latent, None, length=forecast_steps
            )

        surface_out, pressure_out = _decoder(
            params["WeatherMeshDecoder_0"],
            stats.get("WeatherMeshDecoder_0"),
            latent, cfg, axis_name, n, impl,
        )
        return surface_out, pressure_out

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),
            P(None, axis, None, None),
            P(None, None, axis, None, None),
        ),
        out_specs=(
            P(None, axis, None, None),
            P(None, None, axis, None, None),
        ),
        check_vma=False,
    )

    def fn(variables, surface, pressure):
        validate_spatial_config(cfg, surface.shape[1], n)
        surface = jax.lax.with_sharding_constraint(
            surface, NamedSharding(mesh, P(None, axis, None, None))
        )
        pressure = jax.lax.with_sharding_constraint(
            pressure, NamedSharding(mesh, P(None, None, axis, None, None))
        )
        s, pr = smapped(variables, surface, pressure)
        return WeatherMeshOutput(surface=s, pressure=pr)

    return fn
