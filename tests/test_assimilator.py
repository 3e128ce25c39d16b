"""GraphWeatherAssimilator tests (mirror of reference tests/test_model.py's
assimilator cases): irregular obs -> fixed analysis grid, shapes, NaNs,
gradients, and on-device Voronoi assignment correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_weather_tpu.models.analysis import (
    GraphWeatherAssimilator,
    GraphWeatherAssimilatorConfig,
)


def _out_grid():
    return [
        (float(a), float(b)) for a in range(-80, 81, 20) for b in range(0, 360, 30)
    ]


@pytest.fixture(scope="module")
def assim():
    out_ll = _out_grid()
    model = GraphWeatherAssimilator(
        out_ll, observation_dim=2, analysis_dim=6, node_dim=16, edge_dim=16,
        num_blocks=2, hidden_dim_processor_node=16, hidden_dim_processor_edge=16,
        hidden_dim_decoder=8,
    )
    params = model.init(jax.random.PRNGKey(0), num_obs=40)
    return model, params, out_ll


def _obs(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack(
        [
            rng.uniform(-90, 90, n),
            rng.uniform(0, 359.9, n),
            rng.uniform(0, 10, n),
        ],
        axis=1,
    ).astype(np.float32)


def test_forward_shape(assim):
    model, params, out_ll = assim
    obs = _obs(40)
    feats = jnp.asarray(np.random.default_rng(1).normal(size=(2, 40, 2)), jnp.float32)
    out = model(params, feats, jnp.asarray(obs))
    assert out.shape == (2, len(out_ll), 6)
    assert jnp.all(jnp.isfinite(out))


def test_different_obs_positions_change_output(assim):
    model, params, _ = assim
    feats = jnp.ones((1, 40, 2))
    out1 = model(params, feats, jnp.asarray(_obs(40, seed=1)))
    out2 = model(params, feats, jnp.asarray(_obs(40, seed=2)))
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_gradients_flow(assim):
    model, params, _ = assim
    obs = jnp.asarray(_obs(40))
    feats = jnp.ones((1, 40, 2))

    def loss(p):
        return jnp.mean(model.forward_fn()(p, feats, obs) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in leaves)


def test_device_voronoi_matches_host(assim):
    """On-device argmax-dot assignment == host kd-tree assignment."""
    model, _, _ = assim
    obs = _obs(200, seed=3)
    host_cells = model.mesh.latlng_to_cell(obs[:, 0], obs[:, 1])

    from graph_weather_tpu.models.analysis import latlon_to_xyz_jnp

    xyz = latlon_to_xyz_jnp(jnp.asarray(obs[:, 0]), jnp.asarray(obs[:, 1]))
    dev_cells = jnp.argmax(xyz @ model.cell_xyz.T, axis=-1)
    # fp32 ties at Voronoi boundaries are measure-zero for random points.
    assert (np.asarray(dev_cells) == host_cells).mean() > 0.995


def test_config_build():
    cfg = GraphWeatherAssimilatorConfig(
        output_lat_lons=_out_grid(), observation_dim=2, analysis_dim=4,
        node_dim=16, edge_dim=16, num_blocks=1, hidden_dim_processor_node=16,
        hidden_dim_processor_edge=16, hidden_dim_decoder=8,
    )
    model = cfg.build()
    params = model.init(jax.random.PRNGKey(0), num_obs=10)
    out = model(params, jnp.zeros((1, 10, 2)), jnp.zeros((10, 3)))
    assert out.shape == (1, len(_out_grid()), 4)
