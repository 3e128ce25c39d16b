"""FiLM / StochasticDecomposition / PhysicalConstraint / Thermalizer tests.

Mirrors reference tests/test_film.py, tests/models/layers/
test_stochastic_decomposition.py, tests/test_model.py:374-464 (conservation),
tests/test_thermalizer.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_weather_tpu.nn.constraint import PhysicalConstraintLayer
from graph_weather_tpu.nn.film import FiLMApplier, FiLMGenerator, film_apply
from graph_weather_tpu.nn.stochastic import StochasticDecompositionLayer
from graph_weather_tpu.nn.thermalizer import (
    ThermalizerLayer,
    cosine_beta_schedule,
    infer_grid_dimensions,
)


class TestFiLM:
    def test_generator_and_applier(self):
        gen = FiLMGenerator(num_lead_times=4, hidden_dim=8, feature_dim=6)
        params = gen.init(jax.random.PRNGKey(0), 2, 1)
        gamma, beta = gen.apply(params, 3, 2)
        assert gamma.shape == (3, 6) and beta.shape == (3, 6)
        x = jnp.ones((3, 6, 5, 5))
        out = film_apply(x, gamma, beta)
        assert out.shape == x.shape
        np.testing.assert_allclose(
            np.asarray(out[:, :, 0, 0]), np.asarray(gamma + beta), atol=1e-6
        )

    def test_different_lead_times_differ(self):
        gen = FiLMGenerator(num_lead_times=4, hidden_dim=8, feature_dim=6)
        params = gen.init(jax.random.PRNGKey(0), 1, 0)
        g0, _ = gen.apply(params, 1, 0)
        g1, _ = gen.apply(params, 1, 3)
        assert not np.allclose(np.asarray(g0), np.asarray(g1))


class TestSDL:
    def test_zero_alpha_at_init_is_identity(self):
        sdl = StochasticDecompositionLayer(input_dim=4, latent_dim=3)
        x = jnp.ones((2, 4, 10))
        z = jnp.ones((2, 3))
        params = sdl.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x, z
        )
        out = sdl.apply(params, x, z, rngs={"noise": jax.random.PRNGKey(2)})
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_seeded_reproducibility(self):
        """Mirror of reference test_stochastic_decomposition.py:34-82."""
        sdl = StochasticDecompositionLayer(input_dim=4, latent_dim=3)
        x = jnp.ones((2, 4, 10))
        z = jnp.ones((2, 3))
        params = sdl.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x, z
        )
        # make alpha nonzero so noise actually flows
        params = jax.tree_util.tree_map(lambda p: p + 0.5, params)
        o1 = sdl.apply(params, x, z, rngs={"noise": jax.random.PRNGKey(7)})
        o2 = sdl.apply(params, x, z, rngs={"noise": jax.random.PRNGKey(7)})
        o3 = sdl.apply(params, x, z, rngs={"noise": jax.random.PRNGKey(8)})
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
        assert not np.allclose(np.asarray(o1), np.asarray(o3))

    def test_gradients_flow(self):
        sdl = StochasticDecompositionLayer(input_dim=4, latent_dim=3)
        x = jnp.ones((1, 4, 6))
        z = jnp.ones((1, 3))
        params = sdl.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x, z
        )

        def loss(p):
            return jnp.sum(
                sdl.apply(p, x, z, rngs={"noise": jax.random.PRNGKey(2)}) ** 2
            )

        grads = jax.grad(loss)(params)
        assert all(jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads))


class TestPhysicalConstraint:
    """Conservation: output grid mean == LR grid mean (reference
    tests/test_model.py:374-464)."""

    @pytest.mark.parametrize("ctype", ["additive", "multiplicative", "softmax"])
    def test_conservation_factor1(self, ctype):
        layer = PhysicalConstraintLayer(
            grid_shape=(6, 8), upsampling_factor=1, constraint_type=ctype
        )
        rng = np.random.default_rng(0)
        hr = jnp.asarray(rng.normal(size=(2, 3, 6, 8)), jnp.float32)
        lr = jnp.asarray(rng.normal(size=(2, 3, 6, 8)), jnp.float32)
        if ctype == "softmax":
            lr = jnp.abs(lr)
        out = layer(hr, lr)  # graph format [B, N, C]
        assert out.shape == (2, 48, 3)
        np.testing.assert_allclose(
            np.asarray(out.mean(axis=1)),
            np.asarray(lr.mean(axis=(2, 3))),
            rtol=2e-4,
            atol=2e-5,
        )

    def test_graph_format_input(self):
        layer = PhysicalConstraintLayer(
            grid_shape=(4, 4), upsampling_factor=1, constraint_type="additive"
        )
        hr = jnp.ones((1, 16, 2))
        lr = 2.0 * jnp.ones((1, 16, 2))
        out = layer(hr, lr)
        np.testing.assert_allclose(np.asarray(out.mean(axis=1))[0], [2.0, 2.0], atol=1e-6)

    def test_invalid_type_raises(self):
        with pytest.raises(ValueError):
            PhysicalConstraintLayer(grid_shape=(4, 4), constraint_type="bogus")


class TestThermalizer:
    def test_schedule_properties(self):
        betas = cosine_beta_schedule(100)
        assert betas.shape == (100,)
        assert np.all(betas >= 0) and np.all(betas <= 0.999)

    def test_infer_grid(self):
        assert infer_grid_dimensions(64) == (8, 8)
        assert infer_grid_dimensions(12) in [(3, 4), (4, 3)]

    def test_denoise_shapes(self):
        layer = ThermalizerLayer(input_dim=8, timesteps=50)
        x = jnp.ones((36, 8))  # 6x6 grid
        rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
        params = layer.init(rngs, x, 10)
        out = layer.apply(params, x, 10, rngs={"noise": jax.random.PRNGKey(2)})
        assert out.shape == x.shape
        assert jnp.all(jnp.isfinite(out))

    def test_small_grid_uses_simple_net(self):
        layer = ThermalizerLayer(input_dim=4, timesteps=10)
        x = jnp.ones((9, 4))  # 3x3 -> simple net path
        rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
        params = layer.init(rngs, x, 1)
        out = layer.apply(params, x, 1, rngs={"noise": jax.random.PRNGKey(2)})
        assert out.shape == x.shape


class TestMLPNorms:
    """All torch-resolvable norm names accepted by the reference MLP
    (reference models/layers/graph_net_block.py:50-59) must build and
    normalize; unknown names raise."""

    @pytest.mark.parametrize(
        "norm", ["LayerNorm", "RMSNorm", "GraphNorm", "BatchNorm1d",
                 "BatchNorm", "InstanceNorm1d", "InstanceNorm", None]
    )
    def test_all_names_build_and_run(self, norm):
        from graph_weather_tpu.nn.mlp import MLP

        mlp = MLP(out_dim=8, hidden_dim=16, hidden_layers=2, norm_type=norm)
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 10, 8))
        params = jax.jit(mlp.init)(jax.random.PRNGKey(1), x)
        y = jax.jit(mlp.apply)(params, x)
        assert y.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(y)))
        if norm in ("BatchNorm1d", "BatchNorm"):
            # per-feature standardization over all leading axes
            np.testing.assert_allclose(
                np.asarray(jnp.mean(y, axis=(0, 1))), 0.0, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(jnp.std(y, axis=(0, 1))), 1.0, atol=1e-2
            )
        if norm in ("InstanceNorm1d", "InstanceNorm"):
            # stats over the node axis per sample, no affine
            np.testing.assert_allclose(
                np.asarray(jnp.mean(y, axis=1)), 0.0, atol=1e-5
            )

    def test_unknown_norm_raises(self):
        from graph_weather_tpu.nn.mlp import make_norm

        with pytest.raises(ValueError, match="Unsupported norm_type"):
            make_norm("FancyNorm", 8)
