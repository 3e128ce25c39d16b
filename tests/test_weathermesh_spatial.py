"""Latitude-sharded WeatherMesh (parallel/weathermesh_spatial.py).

Exact-match against the unsharded flax model on the virtual 8-device CPU
mesh, boundary handling (clamped attention windows, zero conv padding,
resize edge replication) included; production-dim lowering asserting the
halo collectives; config validation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from graph_weather_tpu.models.weathermesh import WeatherMeshConfig
from graph_weather_tpu.parallel.weathermesh_spatial import (
    spatial_forward_fn,
    validate_spatial_config,
)


def _cfg(norm="group", blocks=1, kernel=(3, 3, 3)):
    return WeatherMeshConfig(
        timesteps=[6],
        surface_channels=3,
        pressure_channels=2,
        pressure_levels=2,
        latent_dim=16,
        encoder_num_conv_blocks=blocks,
        encoder_num_transformer_layers=1,
        encoder_hidden_dim=8,
        decoder_num_conv_blocks=blocks,
        decoder_num_transformer_layers=1,
        decoder_hidden_dim=8,
        processor_num_layers=2,
        kernel=kernel,
        num_heads=2,
        norm=norm,
    )


def _data(cfg, h=64, w=16, batch=1):
    surface = jax.random.normal(
        jax.random.PRNGKey(1), (batch, h, w, cfg.surface_channels)
    )
    pressure = jax.random.normal(
        jax.random.PRNGKey(2),
        (batch, cfg.pressure_levels, h, w, cfg.pressure_channels),
    )
    return surface, pressure


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("spatial",))


@pytest.mark.parametrize("norm", ["group", "batch"])
def test_spatial_matches_unsharded(norm):
    # Tolerances: "batch" (eval-mode BatchNorm, the reference-parity norm)
    # is tight — every stage is exact up to f32 re-association. "group"
    # amplifies f32 noise: GroupNorm's rsqrt(var + 1e-5) rescales ~7e-6
    # per-stage noise (measured stage-wise: encoder 4e-7, processor 0,
    # decoder 7e-6 on identical inputs) through two norm stacks, so the
    # end-to-end comparison needs the looser bound. Structural exactness
    # is carried by the batch case + the per-stage bisect.
    tol = dict(rtol=2e-2, atol=1e-3) if norm == "group" else dict(
        rtol=2e-4, atol=2e-5
    )
    cfg = _cfg(norm=norm)
    model = cfg.build()
    surface, pressure = _data(cfg)
    variables = model.init(jax.random.PRNGKey(0), surface, pressure, 1)
    ref = model.apply(variables, surface, pressure, 1)

    fn = jax.jit(spatial_forward_fn(cfg, _mesh(8), axis="spatial"))
    out = fn(variables, surface, pressure)
    np.testing.assert_allclose(
        np.asarray(out.surface), np.asarray(ref.surface), **tol
    )
    np.testing.assert_allclose(
        np.asarray(out.pressure), np.asarray(ref.pressure), **tol
    )


def test_spatial_matches_unsharded_rollout():
    cfg = _cfg(norm="batch")  # tight tolerance (see matrix test above)
    model = cfg.build()
    surface, pressure = _data(cfg)
    variables = model.init(jax.random.PRNGKey(0), surface, pressure, 1)
    ref = model.apply(variables, surface, pressure, 3)
    fn = jax.jit(
        spatial_forward_fn(cfg, _mesh(8), axis="spatial", forecast_steps=3)
    )
    out = fn(variables, surface, pressure)
    np.testing.assert_allclose(
        np.asarray(out.surface), np.asarray(ref.surface), rtol=2e-4,
        atol=2e-5,
    )


def test_spatial_matches_wide_kernel_two_blocks():
    """kh=5 halo (hc=2) + two stride-2 levels: slab 16 -> latent slab 4;
    4-way sharding keeps latent slab (8) >= kh (5)."""
    cfg = _cfg(norm="batch", blocks=2, kernel=(3, 5, 5))
    model = cfg.build()
    surface, pressure = _data(cfg, h=64, w=20)
    variables = model.init(jax.random.PRNGKey(0), surface, pressure, 1)
    ref = model.apply(variables, surface, pressure, 1)
    fn = jax.jit(spatial_forward_fn(cfg, _mesh(2), axis="spatial"))
    out = fn(variables, surface, pressure)
    np.testing.assert_allclose(
        np.asarray(out.surface), np.asarray(ref.surface), rtol=2e-4,
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.pressure), np.asarray(ref.pressure), rtol=2e-4,
        atol=2e-5,
    )


def test_spatial_train_step_grads_match():
    """Gradients through the sharded forward (ppermute halos, boundary
    fixups, resize edge handling) match the unsharded model's."""
    cfg = _cfg(norm="batch")  # tight tolerance (see matrix test above)
    model = cfg.build()
    surface, pressure = _data(cfg)
    variables = model.init(jax.random.PRNGKey(0), surface, pressure, 1)
    tgt = jax.random.normal(
        jax.random.PRNGKey(3), surface.shape
    )

    def loss_ref(v):
        out = model.apply(v, surface, pressure, 1)
        return jnp.mean((out.surface - tgt) ** 2)

    fn = spatial_forward_fn(cfg, _mesh(8), axis="spatial")

    def loss_sharded(v):
        out = fn(v, surface, pressure)
        return jnp.mean((out.surface - tgt) ** 2)

    g_ref = jax.grad(loss_ref)(variables)
    g_sh = jax.jit(jax.grad(loss_sharded))(variables)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_sh = jax.tree_util.tree_leaves(g_sh)
    assert len(flat_ref) == len(flat_sh)
    for a, b in zip(flat_ref, flat_sh):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-5
        )


def test_production_dims_lower_with_halo_collectives():
    """0.25 deg production shape (720 x 1440 x 13 levels, reference
    weathermesh2.py:69-149) traces and lowers 6-way latitude-sharded;
    the HLO must contain the ppermute halo exchanges and no all-gather
    of the full volume."""
    cfg = WeatherMeshConfig(
        timesteps=[6],
        surface_channels=4,
        pressure_channels=2,
        pressure_levels=13,
        latent_dim=16,
        encoder_num_conv_blocks=3,
        encoder_num_transformer_layers=1,
        encoder_hidden_dim=4,
        decoder_num_conv_blocks=3,
        decoder_num_transformer_layers=1,
        decoder_hidden_dim=4,
        processor_num_layers=1,
        kernel=(5, 7, 7),
        num_heads=2,
    )
    h, w = 720, 1440
    validate_spatial_config(cfg, h, 6)
    mesh = _mesh(6)
    model = cfg.build()
    surface = jax.ShapeDtypeStruct((1, h, w, 4), jnp.float32)
    pressure = jax.ShapeDtypeStruct((1, 13, h, w, 2), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros(surface.shape, surface.dtype),
            jnp.zeros(pressure.shape, pressure.dtype),
            1,
        )
    )
    fn = spatial_forward_fn(cfg, mesh, axis="spatial")
    lowered = jax.jit(fn).lower(variables, surface, pressure)
    text = lowered.as_text()
    assert "collective-permute" in text or "collective_permute" in text
    assert "all-gather" not in text and "all_gather" not in text


def test_validation_rejects_bad_shard_counts():
    cfg = _cfg(blocks=3, kernel=(5, 7, 7))
    with pytest.raises(ValueError, match="not divisible"):
        validate_spatial_config(cfg, 720, 8)  # slab 90 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        validate_spatial_config(cfg, 700, 6)  # H % 6 != 0
    with pytest.raises(ValueError, match="smaller than"):
        validate_spatial_config(cfg, 720, 15)  # latent slab 6 < kh 7
    # supported production counts (0.25 deg, 3 conv blocks, kh=7)
    for n in (2, 3, 5, 6, 9, 10):
        validate_spatial_config(cfg, 720, n)
