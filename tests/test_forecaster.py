"""GraphWeatherForecaster shape / NaN / gradient tests.

Mirrors the reference's unit-test strategy (reference tests/test_model.py:
shape asserts, NaN checks, end-to-end forward+loss+backward).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_weather_tpu import (
    GraphWeatherForecaster,
    GraphWeatherForecasterConfig,
    NormalizedMSELoss,
)


def _grid(spacing=10):
    return [
        (float(lat), float(lon))
        for lat in range(-90, 90, spacing)
        for lon in range(0, 360, spacing)
    ]


@pytest.fixture(scope="module")
def small_model():
    lat_lons = _grid(15)
    model = GraphWeatherForecaster(
        lat_lons, feature_dim=8, aux_dim=4, node_dim=32, edge_dim=32,
        num_blocks=2, hidden_dim_processor_node=32, hidden_dim_processor_edge=32,
        hidden_dim_decoder=16,
    )
    params = model.init(jax.random.PRNGKey(0))
    return model, params, lat_lons


def test_forward_shape_and_finite(small_model):
    model, params, lat_lons = small_model
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, len(lat_lons), 12))
    out = model.apply(params, feats)
    assert out.shape == (2, len(lat_lons), 8)
    assert jnp.all(jnp.isfinite(out))


def test_output_dim_subset(small_model):
    _, _, lat_lons = small_model
    model = GraphWeatherForecaster(
        lat_lons, feature_dim=8, aux_dim=4, output_dim=4, node_dim=16,
        edge_dim=16, num_blocks=1, hidden_dim_processor_node=16,
        hidden_dim_processor_edge=16, hidden_dim_decoder=8,
    )
    params = model.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, len(lat_lons), 12))
    out = model.apply(params, feats)
    assert out.shape == (1, len(lat_lons), 4)


def test_config_build():
    lat_lons = _grid(30)
    cfg = GraphWeatherForecasterConfig(
        lat_lons=lat_lons, feature_dim=4, aux_dim=2, node_dim=16, edge_dim=16,
        num_blocks=1, hidden_dim_processor_node=16, hidden_dim_processor_edge=16,
        hidden_dim_decoder=8,
    )
    model = cfg.build()
    params = model.init(jax.random.PRNGKey(0))
    feats = jnp.zeros((1, len(lat_lons), 6))
    out = model.apply(params, feats)
    assert out.shape == (1, len(lat_lons), 4)


def test_loss_and_gradients(small_model):
    model, params, lat_lons = small_model
    loss_fn_obj = NormalizedMSELoss(
        feature_variance=np.ones(8), lat_lons=lat_lons, normalize=True
    )
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, len(lat_lons), 12))
    target = jax.random.normal(jax.random.PRNGKey(3), (2, len(lat_lons), 8))

    def loss_fn(p):
        return loss_fn_obj(model.apply(p, feats), target)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert jnp.isfinite(loss)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
    # At least some gradient must be nonzero.
    assert any(jnp.any(g != 0) for g in leaves)


def test_remat_equivalence(small_model):
    """Checkpointed (remat) forward must equal the plain forward.

    Mirror of reference tests/models/test_gradient_checkpointing.py:120-205.
    """
    _, _, lat_lons = small_model
    kwargs = dict(
        feature_dim=4, aux_dim=2, node_dim=16, edge_dim=16, num_blocks=2,
        hidden_dim_processor_node=16, hidden_dim_processor_edge=16,
        hidden_dim_decoder=8,
    )
    m_plain = GraphWeatherForecaster(lat_lons, **kwargs)
    m_remat = GraphWeatherForecaster(lat_lons, use_checkpointing=True, **kwargs)
    params = m_plain.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, len(lat_lons), 6))
    out_plain = m_plain.apply(params, feats)
    out_remat = m_remat.apply(params, feats)
    np.testing.assert_allclose(out_plain, out_remat, atol=1e-6)

    def loss_plain(p):
        return jnp.sum(m_plain.apply(p, feats) ** 2)

    def loss_remat(p):
        return jnp.sum(m_remat.apply(p, feats) ** 2)

    g1 = jax.grad(loss_plain)(params)
    g2 = jax.grad(loss_remat)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5), g1, g2
    )


def test_normalized_mse_analytic_value():
    """When per-node error is exactly 1, loss == mean cos-lat weight.

    Mirror of reference tests/test_model.py:236-271.
    """
    lat_lons = _grid(30)
    loss_fn = NormalizedMSELoss(
        feature_variance=np.ones(4), lat_lons=lat_lons, normalize=True
    )
    pred = jnp.ones((1, len(lat_lons), 4))
    target = jnp.zeros((1, len(lat_lons), 4))
    loss = loss_fn(pred, target)
    unique_lats = sorted(set(lat for lat, _ in lat_lons))
    expected = np.mean(np.cos(np.deg2rad(unique_lats)))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-6)


def test_batch_consistency(small_model):
    """Batched forward equals per-sample forwards (vmap-free check)."""
    model, params, lat_lons = small_model
    feats = jax.random.normal(jax.random.PRNGKey(4), (3, len(lat_lons), 12))
    batched = model.apply(params, feats)
    for i in range(3):
        single = model.apply(params, feats[i : i + 1])
        np.testing.assert_allclose(batched[i], single[0], atol=2e-5)


def test_inference_fn_matches_training_forward(small_model):
    """Cached static-edge inference path == training forward exactly."""
    model, params, lat_lons = small_model
    feats = jax.random.normal(jax.random.PRNGKey(9), (1, len(lat_lons), 12))
    ref = model.apply(params, feats)
    cached = model.precompute_static(params)
    out = jax.jit(model.cached_forward_fn())(params, cached, feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("ctype", ["additive", "multiplicative"])
def test_constraint_end_to_end(ctype):
    """constraint_type wiring through the FULL model conserves the input's
    grid mean per channel (reference models/forecast.py:235-247)."""
    lat_lons = _grid(30)  # regular 6 x 12 grid
    model = GraphWeatherForecaster(
        lat_lons, feature_dim=4, aux_dim=2, node_dim=16, edge_dim=16,
        num_blocks=1, hidden_dim_processor_node=16,
        hidden_dim_processor_edge=16, hidden_dim_decoder=8,
        constraint_type=ctype,
    )
    assert model.grid_shape == (6, 12)
    params = model.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, len(lat_lons), 6))
    if ctype == "multiplicative":
        feats = jnp.abs(feats) + 0.5  # keep means away from the eps floor
    out = model.apply(params, feats)
    assert out.shape == (2, len(lat_lons), 4)
    # Conservation: mean over grid nodes of the output == mean of the input
    # state (upsampling_factor=1 => the LR reference is the input itself).
    np.testing.assert_allclose(
        np.asarray(out.mean(axis=1)),
        np.asarray(feats[..., :4].mean(axis=1)),
        atol=1e-4,
    )


def test_constraint_requires_regular_grid():
    lat_lons = _grid(30)[:-1]  # drop one point: no longer a full grid
    with pytest.raises(ValueError, match="regular"):
        GraphWeatherForecaster(
            lat_lons, feature_dim=4, aux_dim=2, node_dim=16, edge_dim=16,
            num_blocks=1, constraint_type="additive",
        )


def test_thermalizer_end_to_end():
    """use_thermalizer wiring: thermalizer params exist, forward is finite,
    and the output depends on the noise RNG (reference processor.py:126-127)."""
    lat_lons = _grid(30)
    model = GraphWeatherForecaster(
        lat_lons, feature_dim=4, aux_dim=2, node_dim=16, edge_dim=16,
        num_blocks=1, hidden_dim_processor_node=16,
        hidden_dim_processor_edge=16, hidden_dim_decoder=8,
        use_thermalizer=True,
    )
    params = model.init(jax.random.PRNGKey(0))
    from flax.traverse_util import flatten_dict

    paths = ["/".join(k) for k in flatten_dict(params["params"])]
    assert any("Thermalizer" in p for p in paths)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, len(lat_lons), 6))
    f1 = jax.jit(model.forward_fn(noise_rng=jax.random.PRNGKey(5)))
    f2 = jax.jit(model.forward_fn(noise_rng=jax.random.PRNGKey(6)))
    o1, o2 = f1(params, feats), f2(params, feats)
    assert jnp.all(jnp.isfinite(o1)) and jnp.all(jnp.isfinite(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    # A later diffusion timestep (more corruption) also changes the output.
    o3 = jax.jit(model.forward_fn(t=500, noise_rng=jax.random.PRNGKey(5)))(
        params, feats
    )
    assert not np.allclose(np.asarray(o1), np.asarray(o3))


def test_args_forward_fn_matches_forward_fn(small_model):
    """args_forward_fn (graphs as jit arguments) must be numerically
    identical to forward_fn (graphs as closure constants) — same module
    apply, different jit-boundary placement of the static graphs."""
    model, params, lat_lons = small_model
    feats = jax.random.normal(jax.random.PRNGKey(7), (2, len(lat_lons), 12))

    ref = jax.jit(model.forward_fn())(params, feats)
    fn = jax.jit(model.args_forward_fn())
    out = fn(params, model.graph_args(), feats)
    assert jnp.array_equal(ref, out)

    # bf16 policy path: graphs cast once in graph_args, same result as
    # the closure-constant bf16 path.
    ref16 = jax.jit(model.forward_fn(compute_dtype=jnp.bfloat16))(
        params, feats
    )
    fn16 = jax.jit(model.args_forward_fn(compute_dtype=jnp.bfloat16))
    out16 = fn16(params, model.graph_args(jnp.bfloat16), feats)
    assert jnp.array_equal(ref16, out16)
