"""GraphCast presets, RegionalForecaster, dynamic builder, stretched mesh,
SparseTransformer, AMSE loss, grid<->points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_weather_tpu.meshes.dynamic import DynamicGraphBuilder
from graph_weather_tpu.meshes.graphs import GraphBundle
from graph_weather_tpu.meshes.hexmesh import get_hexmesh
from graph_weather_tpu.meshes.stretched import build_variable_resolution_mesh
from graph_weather_tpu.models import (
    AMSENormalizedLoss,
    GraphCast,
    GraphCastConfig,
    RegionalForecaster,
    RegionalForecasterConfig,
)
from graph_weather_tpu.models.gencast.sparse_transformer import SparseTransformer
from graph_weather_tpu.models.grid_points import grid_to_points, points_to_grid
from graph_weather_tpu.nn.graph_blocks import DeviceGraph


def _region_points(n=40, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (float(a), float(b))
        for a, b in zip(rng.uniform(20, 60, n), rng.uniform(10, 80, n))
    ]


class TestStretchedMesh:
    def test_exact_cover(self):
        sm = build_variable_resolution_mesh((30, 50, 0, 30), 1, 2)
        c1, c2 = get_hexmesh(1), get_hexmesh(2)
        parents = c2.parent_cells(c1)
        lat, lon = c1.cell_latlon[:, 0], np.mod(c1.cell_latlon[:, 1], 360)
        inside = (lat >= 30) & (lat <= 50) & (lon >= 0) & (lon <= 30)
        expected = int((~inside).sum() + inside[parents].sum())
        assert sm.num_cells == expected
        assert set(np.unique(sm.cell_res)) == {1, 2}

    def test_fine_must_exceed_coarse(self):
        with pytest.raises(ValueError):
            build_variable_resolution_mesh((0, 10, 0, 10), 2, 2)

    def test_dateline_crossing_bbox(self):
        sm = build_variable_resolution_mesh((-10, 10, 350, 10), 1, 2)
        fine_lons = np.mod(sm.cell_latlon[sm.cell_res == 2, 1], 360)
        assert ((fine_lons >= 340) | (fine_lons <= 20)).all()


class TestDynamicBuilder:
    def test_graph_shapes_and_cache(self):
        ll = _region_points()
        b = DynamicGraphBuilder(2)
        enc, dec, lat_g, idx = b(ll)
        assert enc.n_edges == len(ll)
        assert lat_g.n_senders == len(idx)
        counts = np.bincount(dec.receivers, minlength=len(ll))
        assert np.all((counts >= 6) & (counts <= 7))
        # identity cache
        assert b(ll)[0] is enc
        # global ids are valid and sorted unique
        assert np.all(np.diff(idx) > 0)
        assert idx.max() < b.mesh.num_cells

    def test_latent_edges_within_region(self):
        ll = _region_points()
        b = DynamicGraphBuilder(2)
        _, _, lat_g, idx = b(ll)
        assert lat_g.senders.max() < len(idx)
        assert lat_g.receivers.max() < len(idx)
        self_loops = (lat_g.senders == lat_g.receivers).sum()
        assert self_loops == len(idx)


class TestGraphCast:
    def test_all_strategies_same_output(self):
        lls = [
            (float(a), float(b)) for a in range(-80, 81, 40) for b in range(0, 360, 60)
        ]
        gc = GraphCast(lls, input_dim=4, output_dim=4, hidden_dim=16, num_processor_blocks=2)
        params = gc.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, len(lls), 4))
        base = np.asarray(gc(params, x))
        for setter in (
            GraphCastConfig.full_checkpointing,
            GraphCastConfig.balanced_checkpointing,
            GraphCastConfig.processor_only_checkpointing,
            GraphCastConfig.fine_grained_checkpointing,
            GraphCastConfig.no_checkpointing,
        ):
            setter(gc)
            np.testing.assert_allclose(np.asarray(gc(params, x)), base, atol=1e-6)

    def test_invalid_strategy(self):
        lls = [(0.0, 0.0), (10.0, 10.0)]
        with pytest.raises(ValueError):
            GraphCast(lls, checkpoint_strategy="bogus")


class TestRegional:
    def test_forward_with_nudging(self):
        ll = _region_points()
        cfg = RegionalForecasterConfig(
            feature_dim=4, aux_dim=2, node_dim=16, edge_dim=16, num_blocks=2,
            hidden_dim_processor_node=16, hidden_dim_processor_edge=16,
            hidden_dim_decoder=8, enable_nudging=True,
        )
        rf = cfg.build()
        params = rf.init(jax.random.PRNGKey(0), ll)
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(2, len(ll), 6)), jnp.float32)
        gctx = jnp.asarray(rng.normal(size=(2, len(ll), 4)), jnp.float32)
        out = rf(params, feats, ll, gctx)
        assert out.shape == (2, len(ll), 4)
        assert jnp.all(jnp.isfinite(out))
        out2 = rf(params, feats, ll, None)
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    def test_movable_domain(self):
        """Same params work on a different region (recompiles per topology)."""
        cfg = RegionalForecasterConfig(
            feature_dim=2, aux_dim=1, node_dim=16, edge_dim=16, num_blocks=1,
            hidden_dim_processor_node=16, hidden_dim_processor_edge=16,
            hidden_dim_decoder=8,
        )
        rf = cfg.build()
        ll1 = _region_points(seed=1)
        ll2 = _region_points(seed=2)
        params = rf.init(jax.random.PRNGKey(0), ll1)
        out1 = rf(params, jnp.ones((1, len(ll1), 3)), ll1)
        out2 = rf(params, jnp.ones((1, len(ll2), 3)), ll2)
        assert out1.shape == out2.shape == (1, 40, 2)


class TestSparseTransformer:
    def test_forward(self):
        rng = np.random.default_rng(0)
        n = 12
        senders = np.repeat(np.arange(n, dtype=np.int32), 3)
        receivers = np.sort(rng.integers(0, n, n * 3).astype(np.int32))
        bundle = GraphBundle(
            senders=senders, receivers=receivers,
            edge_attr=np.zeros((n * 3, 0), np.float32), n_senders=n, n_receivers=n,
        )
        graph = DeviceGraph.from_bundle(bundle, use_csr=False)
        st = SparseTransformer(output_dim=16, num_heads=4)
        x = jnp.asarray(rng.normal(size=(2, n, 16)), jnp.float32)
        cond = jnp.asarray(rng.normal(size=(2, 1, 8)), jnp.float32)
        params = st.init(jax.random.PRNGKey(0), x, graph, cond)
        out = st.apply(params, x, graph, cond)
        assert out.shape == x.shape
        assert jnp.all(jnp.isfinite(out))


class TestAMSELoss:
    def test_zero_for_identical(self):
        loss = AMSENormalizedLoss(np.ones(2))
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 32))
        val = float(loss(x, x))
        assert abs(val) < 1e-4

    def test_positive_for_different(self):
        loss = AMSENormalizedLoss(np.ones(2))
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 32))
        y = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 16, 32))
        assert float(loss(x, y)) > 0.0

    def test_shape_validation(self):
        loss = AMSENormalizedLoss(np.ones(2))
        with pytest.raises(ValueError):
            loss(jnp.zeros((1, 2, 8, 16)), jnp.zeros((1, 2, 8, 8)))
        with pytest.raises(ValueError):
            loss(jnp.zeros((2, 8, 16)), jnp.zeros((2, 8, 16)))


class TestGridPoints:
    def test_roundtrip_smooth_field(self):
        lats = np.linspace(-80, 80, 17)
        lons = np.arange(0, 360, 20.0)
        lat_g, lon_g = np.meshgrid(lats, lons, indexing="ij")
        pts = np.stack([lat_g.reshape(-1), lon_g.reshape(-1)], 1)
        vals = jnp.asarray(
            np.sin(np.deg2rad(pts[:, 0:1])) * np.cos(np.deg2rad(pts[:, 1:2])),
            jnp.float32,
        )
        grid = points_to_grid(vals, pts, lats, lons, k=1)
        assert grid.shape == (17, 18, 1)
        back = grid_to_points(grid, lats, lons, pts, k=1)
        np.testing.assert_allclose(np.asarray(back), np.asarray(vals), atol=1e-5)
