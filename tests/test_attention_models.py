"""CaFA / WeatherMesh / Aurora / FengWu-GHR tests.

Mirrors reference tests/test_cafa.py, test_weathermesh.py, test_aurora.py,
test_fengwu_ghr.py: shape checks (incl. odd-size padding), NaN checks,
point-order invariance, kNN interpolation, LoRA zero-init.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_weather_tpu.models.aurora import (
    AuroraModel,
    EarthSystemLoss,
    PerceiverProcessor,
    ProcessorConfig,
    create_model,
)
from graph_weather_tpu.models.cafa import CaFAForecaster
from graph_weather_tpu.models.fengwu_ghr import (
    ImageMetaModel,
    MetaModel,
    WrapperImageModel,
    knn_interpolate,
    lora_init,
    lora_merge,
)
from graph_weather_tpu.models.weathermesh import WeatherMesh, WeatherMeshConfig
from graph_weather_tpu.ops.neighborhood_attention import neighborhood_attention_3d


class TestCaFA:
    def test_even_input(self):
        model = CaFAForecaster(
            input_channels=3, output_channels=2, model_dim=16,
            downsampling_factor=2, processor_depth=1, num_heads=2, dim_head=8,
        )
        x = jnp.zeros((1, 3, 16, 32))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(model.apply)(params, x)
        assert out.shape == (1, 2, 16, 32)

    def test_odd_input_padding(self):
        """Mirror of reference tests/test_cafa.py:68 (odd dims)."""
        model = CaFAForecaster(
            input_channels=2, output_channels=2, model_dim=16,
            downsampling_factor=2, processor_depth=1, num_heads=2, dim_head=8,
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 15, 31))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(model.apply)(params, x)
        assert out.shape == (1, 2, 15, 31)
        assert jnp.all(jnp.isfinite(out))


class TestWeatherMesh:
    @pytest.fixture(scope="class")
    def wm(self):
        cfg = WeatherMeshConfig(
            timesteps=[6], surface_channels=4, pressure_channels=3,
            pressure_levels=4, latent_dim=16, encoder_num_conv_blocks=2,
            encoder_num_transformer_layers=1, encoder_hidden_dim=4,
            decoder_num_conv_blocks=2, decoder_num_transformer_layers=1,
            decoder_hidden_dim=4, processor_num_layers=1, kernel=(3, 3, 3),
            num_heads=2,
        )
        model = cfg.build()
        surface = jnp.zeros((1, 16, 16, 4))
        pressure = jnp.zeros((1, 4, 16, 16, 3))
        params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), surface, pressure, 1))()
        return model, params

    def test_roundtrip_shapes(self, wm):
        model, params = wm
        surface = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
        pressure = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16, 16, 3))
        out = jax.jit(lambda p: model.apply(p, surface, pressure, 2))(params)
        assert out.surface.shape == (1, 16, 16, 4)
        assert out.pressure.shape == (1, 4, 16, 16, 3)
        assert jnp.all(jnp.isfinite(out.surface))
        assert jnp.all(jnp.isfinite(out.pressure))

    def test_config_json_roundtrip(self):
        cfg = WeatherMeshConfig(
            timesteps=[6, 1], surface_channels=8, pressure_channels=4,
            pressure_levels=5, latent_dim=32,
        )
        cfg2 = WeatherMeshConfig.from_json(cfg.to_json())
        assert cfg2 == cfg


class TestNeighborhoodAttention:
    def test_circular_longitude_wrap(self):
        """With circular_w, column 0 attends across the dateline."""
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(1, 1, 4, 8, 1, 4)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 1, 4, 8, 1, 4)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, 1, 4, 8, 1, 4)), jnp.float32)
        out_c = neighborhood_attention_3d(q, k, v, (1, 3, 3), circular_w=True)
        out_p = neighborhood_attention_3d(q, k, v, (1, 3, 3), circular_w=False)
        # interior columns identical, boundary columns differ
        np.testing.assert_allclose(
            np.asarray(out_c[..., :, 2:6, :, :]),
            np.asarray(out_p[..., :, 2:6, :, :]),
            atol=1e-6,
        )
        assert not np.allclose(np.asarray(out_c[..., 0, :, :]), np.asarray(out_p[..., 0, :, :]))


class TestNeighborhoodAttentionBruteForce:
    def test_matches_materialized_windows(self):
        """The online-softmax scan over window slots must equal explicit
        window materialization (clamped NATTEN semantics, with RPB)."""
        from graph_weather_tpu.ops.neighborhood_attention import _window_indices

        rng = np.random.default_rng(3)
        b, d, h, w, n, c = 1, 4, 5, 6, 2, 4
        kd, kh, kw = 3, 3, 3
        q = jnp.asarray(rng.normal(size=(b, d, h, w, n, c)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, d, h, w, n, c)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, d, h, w, n, c)), jnp.float32)
        rpb = jnp.asarray(
            rng.normal(size=(n, 2 * kd - 1, 2 * kh - 1, 2 * kw - 1)), jnp.float32
        )
        out = neighborhood_attention_3d(q, k, v, (kd, kh, kw), rpb=rpb)

        idx_d, rel_d = _window_indices(d, kd, False)
        idx_h, rel_h = _window_indices(h, kh, False)
        idx_w, rel_w = _window_indices(w, kw, False)
        ref = np.zeros((b, d, h, w, n, c), np.float32)
        qn, kn, vn, rn = map(np.asarray, (q, k, v, rpb))
        for di in range(d):
            for hi in range(h):
                for wi in range(w):
                    for ni in range(n):
                        logits, vals = [], []
                        for x in range(kd):
                            for y in range(kh):
                                for z in range(kw):
                                    kd_i, kh_i, kw_i = idx_d[di, x], idx_h[hi, y], idx_w[wi, z]
                                    sc = (qn[0, di, hi, wi, ni] @ kn[0, kd_i, kh_i, kw_i, ni]) / np.sqrt(c)
                                    sc += rn[ni, rel_d[di, x], rel_h[hi, y], rel_w[wi, z]]
                                    logits.append(sc)
                                    vals.append(vn[0, kd_i, kh_i, kw_i, ni])
                        a = np.exp(logits - np.max(logits))
                        a /= a.sum()
                        ref[0, di, hi, wi, ni] = (a[:, None] * np.stack(vals)).sum(0)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


class TestAurora:
    @pytest.fixture(scope="class")
    def aurora(self):
        model = AuroraModel(
            input_features=3, output_features=2, latent_dim=16, num_layers=1,
        )
        points = jnp.zeros((1, 20, 2))
        feats = jnp.zeros((1, 20, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), points, feats)
        return model, params

    def test_forward(self, aurora):
        model, params = aurora
        rng = np.random.default_rng(0)
        points = jnp.asarray(rng.uniform(-90, 90, (1, 20, 2)), jnp.float32)
        feats = jnp.asarray(rng.normal(size=(1, 20, 3)), jnp.float32)
        out = model.apply(params, points, feats)
        assert out.shape == (1, 20, 2)
        assert jnp.all(jnp.isfinite(out))

    def test_point_order_invariance(self, aurora):
        """Mirror of reference tests/test_aurora.py:396."""
        model, params = aurora
        rng = np.random.default_rng(1)
        points = rng.uniform(-90, 90, (1, 20, 2)).astype(np.float32)
        feats = rng.normal(size=(1, 20, 3)).astype(np.float32)
        perm = rng.permutation(20)
        out1 = model.apply(params, jnp.asarray(points), jnp.asarray(feats))
        out2 = model.apply(
            params, jnp.asarray(points[:, perm]), jnp.asarray(feats[:, perm])
        )
        np.testing.assert_allclose(
            np.asarray(out1[:, perm]), np.asarray(out2), atol=2e-5
        )

    def test_mask(self, aurora):
        model, params = aurora
        points = jnp.ones((1, 20, 2))
        feats = jnp.ones((1, 20, 3))
        mask = jnp.asarray(np.r_[np.ones(10), np.zeros(10)][None], jnp.float32)
        out = model.apply(params, points, feats, mask)
        assert np.allclose(np.asarray(out[0, 10:]), 0.0)

    def test_earth_system_loss(self):
        loss = EarthSystemLoss(0.5, 0.3, 0.2)
        rng = np.random.default_rng(0)
        points = jnp.asarray(rng.uniform(-90, 90, (1, 10, 2)), jnp.float32)
        pred = jnp.abs(jnp.asarray(rng.normal(size=(1, 10, 2)), jnp.float32))
        target = jnp.abs(jnp.asarray(rng.normal(size=(1, 10, 2)), jnp.float32))
        out = loss(pred, target, points)
        assert set(out) == {
            "total_loss", "mse_loss", "spatial_correlation_loss", "physical_loss",
        }
        assert jnp.isfinite(out["total_loss"])

    def test_create_model_factory(self):
        model = create_model("tiny", latent_dim=8, num_layers=1)
        assert isinstance(model, AuroraModel)
        with pytest.raises(ValueError):
            create_model("nonexistent")

    def test_perceiver_processor(self):
        proc = PerceiverProcessor(ProcessorConfig(input_dim=8, latent_dim=16, d_model=8))
        x = jnp.zeros((2, 10, 8))
        params = jax.jit(proc.init)(jax.random.PRNGKey(0), x)
        out = proc.apply(params, x)
        assert out.shape == (2, 16)


class TestFengWuGHR:
    def test_image_meta_model_roundtrip_shape(self):
        model = ImageMetaModel(
            image_size=(8, 8), patch_size=(2, 2), depth=1, heads=2,
            mlp_dim=16, channels=3, dim_head=8,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8))
        params = jax.jit(model.init)(jax.random.PRNGKey(1), x)
        out = jax.jit(model.apply)(params, x)
        assert out.shape == (2, 3, 8, 8)
        assert jnp.all(jnp.isfinite(out))

    def test_wrapper_image_model(self):
        model = WrapperImageModel(
            image_size=(4, 4), patch_size=(2, 2), depth=1, heads=2,
            mlp_dim=16, channels=2, dim_head=8, scale_factor=2,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8))
        params = jax.jit(model.init)(jax.random.PRNGKey(1), x)
        out = jax.jit(model.apply)(params, x)
        assert out.shape == (1, 2, 8, 8)

    def test_meta_model_interpolation(self):
        lat_lons = [
            (float(lat), float(lon))
            for lat in range(-80, 81, 20)
            for lon in range(0, 360, 40)
        ]
        model = MetaModel(
            lat_lons, image_size=(8, 8), patch_size=(2, 2), depth=1,
            heads=2, mlp_dim=16, channels=2, dim_head=8,
        )
        params = model.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, len(lat_lons), 2))
        out = model(params, x)
        assert out.shape == (2, len(lat_lons), 2)
        assert jnp.all(jnp.isfinite(out))

    def test_knn_interpolate_exact_at_sources(self):
        pos = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [2.0, 2.0]])
        x = jnp.asarray(np.array([[1.0], [2.0], [3.0], [4.0]]), jnp.float32)
        out = knn_interpolate(x, pos, pos, k=3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_lora_zero_at_init_then_changes(self):
        model = ImageMetaModel(
            image_size=(4, 4), patch_size=(2, 2), depth=1, heads=2,
            mlp_dim=8, channels=2, dim_head=4,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 4))
        params = jax.jit(model.init)(jax.random.PRNGKey(1), x)
        lora = lora_init(jax.random.PRNGKey(2), params, r=2)
        assert len(lora) > 0
        merged = lora_merge(params, lora)
        out0 = model.apply(params, x)
        out1 = model.apply(merged, x)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)
        # perturb B -> output changes
        lora2 = {k: (a, b + 0.1) for k, (a, b) in lora.items()}
        out2 = model.apply(lora_merge(params, lora2), x)
        assert not np.allclose(np.asarray(out0), np.asarray(out2))
