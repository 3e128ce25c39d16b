"""Probe: where do WeatherMesh's 202.8 ms go at the 1-degree bench config?

Decomposes the bench.py metric_weathermesh forward (180x360, 13 levels,
latent 128, kernel (3,5,5), 2+4+2 attention layers at latent resolution
[1, 14, 45, 90, 128]) into:
  a. one NATTEN Pallas layer at latent resolution (fwd, bf16)
  b. the same via the XLA slot-scan (comparison)
  c. the z_tiles k/v expansion alone (XLA glue feeding the kernel)
  d. encoder conv path alone / decoder conv path alone
  e. full model (sanity anchor vs bench.py)

Usage: python scripts/probe_weathermesh.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jax.device_get(leaf)).ravel()[0])


def time_ms(fn, n_iter, *args):
    def one(c, _):
        out = fn(c, *args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return c + 1.0 + 0.0 * leaf.astype(jnp.float32).mean(), None

    @jax.jit
    def scan_fn(c0, *a):
        c, _ = jax.lax.scan(lambda c, x: one(c, x), c0, None, length=n_iter)
        return c

    _fetch(scan_fn(jnp.float32(0.0), *args))
    triv = jax.jit(lambda s: s + 1.0)
    _fetch(triv(jnp.float32(0.5)))
    t0 = time.perf_counter()
    _fetch(triv(jnp.float32(1.5)))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    _fetch(scan_fn(jnp.float32(1.0), *args))
    return (time.perf_counter() - t0 - overhead) / n_iter * 1000.0


def main():
    from graph_weather_tpu.ops.neighborhood_attention import (
        neighborhood_attention_3d,
    )

    dt = jnp.bfloat16
    b, d, h, w, heads, ch = 1, 14, 45, 90, 4, 32
    kernel = (3, 5, 5)
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(kk, (b, d, h, w, heads, ch), dtype=dt)
        for kk in jax.random.split(key, 3)
    )
    rpb = jax.random.normal(
        jax.random.PRNGKey(9),
        (heads, 2 * kernel[0] - 1, 2 * kernel[1] - 1, 2 * kernel[2] - 1),
        jnp.float32,
    )

    def attn_pallas(c, q, k, v, rpb):
        q = q.at[0, 0, 0, 0, 0, 0].set(c.astype(dt))
        return neighborhood_attention_3d(q, k, v, kernel, rpb, True, "pallas")

    def attn_xla(c, q, k, v, rpb):
        q = q.at[0, 0, 0, 0, 0, 0].set(c.astype(dt))
        return neighborhood_attention_3d(q, k, v, kernel, rpb, True, "xla")

    def attn_pallas_nobias(c, q, k, v):
        q = q.at[0, 0, 0, 0, 0, 0].set(c.astype(dt))
        return neighborhood_attention_3d(q, k, v, kernel, None, True, "pallas")

    def attn_flash(c, q, k, v, rpb):
        q = q.at[0, 0, 0, 0, 0, 0].set(c.astype(dt))
        return neighborhood_attention_3d(q, k, v, kernel, rpb, True, "flash")

    def attn_flash_nobias(c, q, k, v):
        q = q.at[0, 0, 0, 0, 0, 0].set(c.astype(dt))
        return neighborhood_attention_3d(q, k, v, kernel, None, True, "flash")

    ms = time_ms(attn_flash, 20, q, k, v, rpb)
    print(f"NATTEN flash layer [1,14,45,90,4x32]    {ms:8.3f} ms")
    ms = time_ms(attn_flash_nobias, 20, q, k, v)
    print(f"NATTEN flash, no rpb                    {ms:8.3f} ms")
    ms = time_ms(attn_pallas, 20, q, k, v, rpb)
    print(f"NATTEN pallas layer [1,14,45,90,4x32]   {ms:8.3f} ms")
    ms = time_ms(attn_pallas_nobias, 20, q, k, v)
    print(f"NATTEN pallas, no rpb                   {ms:8.3f} ms")
    ms = time_ms(attn_xla, 10, q, k, v, rpb)
    print(f"NATTEN xla slot-scan                    {ms:8.3f} ms")

    # z_tiles glue alone: replicate the forward's k/v expansion.
    from graph_weather_tpu.ops.pallas import natten3d as nat

    def glue(c, k, v):
        km = k.reshape(b, d, h, w, heads * ch).at[0, 0, 0, 0, 0].set(
            c.astype(dt)
        )
        vm = v.reshape(b, d, h, w, heads * ch)
        kd, kh, kw = kernel
        cd, ch_ = kd // 2, kh // 2
        w_idx = nat._w_window_indices(w, kw, True)
        tw = nat._pick_tw(w, d, h, kernel, heads * ch, 2)
        n_w = w // tw

        def z_tiles(t):
            t = jnp.pad(
                t,
                ((0, 0), (cd, kd - 1 - cd), (ch_, kh - 1 - ch_), (0, 0), (0, 0)),
            )
            tz = jnp.take(t, jnp.asarray(w_idx), axis=3)
            tz = jnp.moveaxis(tz, 3, 1)
            tz = tz.reshape(b, kw, d + kd - 1, h + kh - 1, n_w, tw, heads * ch)
            tz = jnp.moveaxis(tz, 4, 1)
            return tz.reshape(b * n_w, kw, d + kd - 1, h + kh - 1, tw, heads * ch)

        return z_tiles(km).mean() + z_tiles(vm).mean()

    ms = time_ms(glue, 20, k, v)
    print(f"z_tiles k+v expansion (XLA glue)        {ms:8.3f} ms")

    # Full model + conv-only paths.
    from graph_weather_tpu.models.weathermesh import WeatherMeshConfig

    hh, ww, levels, latent = 180, 360, 13, 128
    cfg = WeatherMeshConfig(
        timesteps=[6],
        surface_channels=8,
        pressure_channels=4,
        pressure_levels=levels,
        latent_dim=latent,
        encoder_num_conv_blocks=2,
        encoder_num_transformer_layers=2,
        encoder_hidden_dim=64,
        decoder_num_conv_blocks=2,
        decoder_num_transformer_layers=2,
        decoder_hidden_dim=64,
        processor_num_layers=4,
        kernel=(3, 5, 5),
        num_heads=4,
    )
    model = cfg.build()
    surface = jax.random.normal(jax.random.PRNGKey(1), (1, hh, ww, 8))
    pressure = jax.random.normal(jax.random.PRNGKey(2), (1, levels, hh, ww, 4))
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), surface, pressure, 1)
    )()

    def to_bf16(t):
        return (
            t.astype(jnp.bfloat16)
            if jnp.issubdtype(t.dtype, jnp.floating)
            else t
        )

    p16 = jax.tree_util.tree_map(to_bf16, params)

    def full(c, p16, surface, pressure):
        out = model.apply(
            p16,
            surface.astype(dt).at[0, 0, 0, 0].set(c.astype(dt)),
            pressure.astype(dt),
            1,
        )
        return out.surface.astype(jnp.float32).mean()

    ms = time_ms(full, 10, p16, surface, pressure)
    print(f"full WeatherMesh fwd (bench anchor)     {ms:8.3f} ms")


if __name__ == "__main__":
    main()
