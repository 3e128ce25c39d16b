"""GenCast tests: graphs, attention equivalence, denoiser, sampler, loss.

Mirrors the reference test strategy (tests/test_gencast.py): k-hop
equivalence, shape/NaN checks on denoiser and sampler, plus a dense-masked
attention equivalence test for the segment-softmax graph transformer (the
analogue of PyG TransformerConv parity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from graph_weather_tpu.meshes.graphs import GraphBundle
from graph_weather_tpu.models.gencast import (
    Denoiser,
    DenoiserConfig,
    Sampler,
    WeightedMSELoss,
    build_graphcast_graphs,
    sample_noise_level,
)
from graph_weather_tpu.models.gencast.graphs import khop_edges
from graph_weather_tpu.models.gencast.modules import GraphTransformerConv
from graph_weather_tpu.nn.graph_blocks import DeviceGraph

NLAT, NLON = 16, 32


def _grids():
    return np.arange(0, 360, 360 / NLON), np.linspace(-90, 90, NLAT)


@pytest.fixture(scope="module")
def graphs():
    grid_lon, grid_lat = _grids()
    return build_graphcast_graphs(grid_lon, grid_lat, splits=2, num_hops=2)


@pytest.fixture(scope="module")
def denoiser_and_params():
    grid_lon, grid_lat = _grids()
    den = Denoiser(
        grid_lon, grid_lat, input_features_dim=3, output_features_dim=2,
        hidden_dims=(16, 16), num_blocks=3, num_heads=4, splits=2, num_hops=2,
    )
    params = den.init(jax.random.PRNGKey(0))
    return den, params


class TestGraphs:
    def test_m2g_three_edges_per_point(self, graphs):
        counts = np.bincount(graphs.m2g.receivers)
        assert np.all(counts == 3)

    def test_g2m_covers_all_mesh_nodes(self, graphs):
        assert len(np.unique(graphs.g2m.receivers)) == graphs.g2m.n_receivers

    def test_edge_features_dim_and_range(self, graphs):
        for g in (graphs.g2m, graphs.mesh, graphs.m2g):
            assert g.edge_attr.shape[1] == 4
            assert np.all(np.abs(g.edge_attr) <= 1.0 + 1e-6)
        assert graphs.grid_node_feats.shape[1] == 3

    def test_khop_equals_sparse_power(self, graphs):
        """Mirror of reference tests/test_gencast.py:50-67 (TwoHop parity)."""
        s, r = graphs.mesh.senders, graphs.mesh.receivers
        n = graphs.mesh.n_senders
        ks, kr = khop_edges(s, r, n, 2)
        a = sp.csr_matrix((np.ones_like(s, bool), (s, r)), shape=(n, n))
        a2 = (a + a @ a).tolil()
        a2.setdiag(False)
        coo = a2.tocsr().tocoo()
        assert set(zip(ks.tolist(), kr.tolist())) == set(
            zip(coo.row.tolist(), coo.col.tolist())
        )

    def test_mesh_edges_bidirectional(self, graphs):
        pairs = set(zip(graphs.mesh.senders.tolist(), graphs.mesh.receivers.tolist()))
        assert all((b, a) in pairs for a, b in pairs)


class TestAttentionEquivalence:
    def test_segment_softmax_matches_dense_masked_attention(self):
        """Graph attention over edges == dense attention with adjacency mask."""
        rng = np.random.default_rng(0)
        n, f, h, c = 10, 8, 2, 4
        # random graph with at least one incoming edge per node
        senders, receivers = [], []
        for j in range(n):
            nbrs = rng.choice(n, size=3, replace=False)
            senders.extend(nbrs.tolist())
            receivers.extend([j] * 3)
        order = np.argsort(receivers, kind="stable")
        senders = np.asarray(senders, np.int32)[order]
        receivers = np.asarray(receivers, np.int32)[order]
        bundle = GraphBundle(
            senders=senders, receivers=receivers,
            edge_attr=np.zeros((len(senders), 0), np.float32),
            n_senders=n, n_receivers=n,
        )
        graph = DeviceGraph.from_bundle(bundle, use_csr=False)

        x = jnp.asarray(rng.normal(size=(1, n, f)), jnp.float32)
        conv = GraphTransformerConv(
            out_channels=c, num_heads=h, concat=True, beta=False,
            use_edge_features=False,
        )
        params = conv.init(jax.random.PRNGKey(0), x, graph)
        out = conv.apply(params, x, graph)

        # dense reference
        p = params["params"]
        def lin(name, v):
            return v @ p[name]["kernel"] + p[name]["bias"]
        q = lin("TorchLinear_0", x[0]).reshape(n, h, c)
        k = lin("TorchLinear_1", x[0]).reshape(n, h, c)
        v = lin("TorchLinear_2", x[0]).reshape(n, h, c)
        mask = np.zeros((n, n), bool)
        mask[receivers, senders] = True  # [dst, src]
        logits = jnp.einsum("ihc,jhc->hij", q, k) / np.sqrt(c)
        logits = jnp.where(jnp.asarray(mask)[None], logits, -jnp.inf)
        alpha = jax.nn.softmax(logits, axis=-1)
        dense = jnp.einsum("hij,jhc->ihc", alpha, v).reshape(n, h * c)
        dense = dense + lin("TorchLinear_3", x[0])
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(dense), atol=1e-5)


class TestBandedAttention:
    """Banded dense attention (ops/banded_attention.py) vs segment softmax."""

    def _random_banded_graph(self, rng, n=300, w=64, deg=6):
        senders, receivers = [], []
        for r in range(n):
            s = rng.integers(max(0, r - w), min(n, r + w + 1), size=deg)
            senders.extend(s.tolist())
            receivers.extend([r] * deg)
        pairs = np.unique(
            np.stack([np.asarray(receivers), np.asarray(senders)], 1), axis=0
        )  # dedupe: masks collapse parallel edges (khop graphs have none)
        return pairs[:, 1].astype(np.int32), pairs[:, 0].astype(np.int32)

    def test_matches_segment_softmax(self):
        from graph_weather_tpu.ops.banded_attention import (
            banded_graph_attention,
            build_band_masks,
        )
        from graph_weather_tpu.ops.segment_softmax import segment_softmax

        rng = np.random.default_rng(0)
        n, h, c, block, w = 300, 2, 8, 128, 64
        senders, receivers = self._random_banded_graph(rng, n=n, w=w)
        masks = jnp.asarray(build_band_masks(senders, receivers, n, block, w))

        q = jnp.asarray(rng.standard_normal((n, h, c)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((n, h, c)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((n, h, c)), jnp.float32)

        out_band = banded_graph_attention(q, k, v, masks, block, w)

        s_ids, r_ids = jnp.asarray(senders), jnp.asarray(receivers)
        logits = jnp.einsum(
            "ehc,ehc->eh", q[r_ids], k[s_ids]
        ) / np.sqrt(c)
        alpha = segment_softmax(logits, r_ids, n)
        msg = v[s_ids] * alpha[..., None]
        out_seg = jax.ops.segment_sum(
            msg.reshape(len(senders), h * c), r_ids, num_segments=n
        ).reshape(n, h, c)
        np.testing.assert_allclose(out_band, out_seg, atol=2e-5)

    def test_empty_receiver_rows_are_zero(self):
        from graph_weather_tpu.ops.banded_attention import (
            banded_graph_attention,
            build_band_masks,
        )

        senders = np.array([0, 1], np.int32)
        receivers = np.array([0, 0], np.int32)  # rows 1+ have no edges
        masks = jnp.asarray(build_band_masks(senders, receivers, 8, 8, 8))
        q = jnp.ones((8, 1, 4))
        out = banded_graph_attention(q, q, q, masks, 8, 8)
        assert jnp.all(out[1:] == 0.0)
        assert jnp.all(jnp.isfinite(out))

    def test_span_violation_raises(self):
        from graph_weather_tpu.ops.banded_attention import build_band_masks

        with pytest.raises(ValueError, match="span"):
            build_band_masks(
                np.array([0], np.int32), np.array([200], np.int32), 256, 64, 64
            )

    def test_denoiser_banded_matches_segment(self):
        grid_lon, grid_lat = _grids()
        kw = dict(
            grid_lon=grid_lon, grid_lat=grid_lat, input_features_dim=3,
            output_features_dim=2, hidden_dims=(16, 16), num_blocks=2,
            num_heads=2, splits=2, num_hops=3, use_edges_features=False,
        )
        d_seg = Denoiser(**kw)
        d_band = Denoiser(**kw, attention_impl="banded")
        assert d_band.khop.band_masks is not None

        params = d_seg.init(jax.random.PRNGKey(0))
        tgt = jax.random.normal(jax.random.PRNGKey(1), (1, NLON, NLAT, 2))
        prev = jax.random.normal(jax.random.PRNGKey(2), (1, NLON, NLAT, 6))
        sig = jnp.full((1, 1), 0.5)
        o_seg = d_seg.forward_fn()(params, tgt, prev, sig)
        o_band = d_band.forward_fn()(params, tgt, prev, sig)
        # f32 reduction-order noise through preconditioning; same numerics.
        np.testing.assert_allclose(o_seg, o_band, atol=1e-3)

    def test_denoiser_banded_flash_matches_segment(self):
        # Pallas interpret mode on CPU; tiny config to keep it fast.
        grid_lon, grid_lat = _grids()
        kw = dict(
            grid_lon=grid_lon, grid_lat=grid_lat, input_features_dim=3,
            output_features_dim=2, hidden_dims=(16, 16), num_blocks=1,
            num_heads=2, splits=2, num_hops=3, use_edges_features=False,
        )
        d_seg = Denoiser(**kw)
        d_fl = Denoiser(**kw, attention_impl="banded_flash")
        assert d_fl.khop.band_flash
        params = d_seg.init(jax.random.PRNGKey(0))
        tgt = jax.random.normal(jax.random.PRNGKey(1), (1, NLON, NLAT, 2))
        prev = jax.random.normal(jax.random.PRNGKey(2), (1, NLON, NLAT, 6))
        sig = jnp.full((1, 1), 0.5)
        o_seg = d_seg.forward_fn()(params, tgt, prev, sig)
        o_fl = d_fl.forward_fn()(params, tgt, prev, sig)
        np.testing.assert_allclose(o_seg, o_fl, atol=1e-3)

    def test_banded_requires_no_edge_features(self):
        grid_lon, grid_lat = _grids()
        with pytest.raises(ValueError, match="use_edges_features"):
            Denoiser(
                grid_lon, grid_lat, input_features_dim=3,
                output_features_dim=2, splits=2, num_hops=2,
                use_edges_features=True, attention_impl="banded",
            )


class TestDenoiser:
    def test_forward_shape_and_finite(self, denoiser_and_params):
        den, params = denoiser_and_params
        rng = np.random.default_rng(0)
        tgt = jnp.asarray(rng.normal(size=(2, NLON, NLAT, 2)), jnp.float32)
        prev = jnp.asarray(rng.normal(size=(2, NLON, NLAT, 6)), jnp.float32)
        noise = jnp.full((2, 1), 0.5)
        out = den(params, tgt, prev, noise)
        assert out.shape == (2, NLON, NLAT, 2)
        assert jnp.all(jnp.isfinite(out))

    def test_high_noise_ignores_target(self, denoiser_and_params):
        """c_skip -> 0 as sigma -> inf: output dominated by f_theta."""
        den, params = denoiser_and_params
        rng = np.random.default_rng(1)
        prev = jnp.asarray(rng.normal(size=(1, NLON, NLAT, 6)), jnp.float32)
        t1 = jnp.asarray(rng.normal(size=(1, NLON, NLAT, 2)), jnp.float32)
        noise_hi = jnp.full((1, 1), 1e4)
        out1 = den(params, t1, prev, noise_hi)
        out2 = den(params, 2.0 * t1, prev, noise_hi)
        # targets scaled by c_in ~ 1e-4 and skipped by c_skip ~ 1e-8.
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-2)

    def test_gradients(self, denoiser_and_params):
        den, params = denoiser_and_params
        loss_obj = WeightedMSELoss(grid_lat=_grids()[1])
        rng = np.random.default_rng(2)
        tgt = jnp.asarray(rng.normal(size=(1, NLON, NLAT, 2)), jnp.float32)
        prev = jnp.asarray(rng.normal(size=(1, NLON, NLAT, 6)), jnp.float32)
        noise = jnp.full((1, 1), 0.5)
        fwd = den.forward_fn()

        def loss(p):
            return loss_obj(fwd(p, tgt, prev, noise), noise, tgt)

        val, grads = jax.value_and_grad(loss)(params)
        assert jnp.isfinite(val)
        assert all(
            jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)
        )

    def test_config_build(self):
        grid_lon, grid_lat = _grids()
        cfg = DenoiserConfig(
            grid_lon=grid_lon, grid_lat=grid_lat, input_features_dim=2,
            output_features_dim=1, hidden_dims=(8, 8), num_blocks=2,
            num_heads=2, splits=2, num_hops=1,
        )
        den = cfg.build()
        params = den.init(jax.random.PRNGKey(0))
        out = den(
            params,
            jnp.zeros((1, NLON, NLAT, 1)),
            jnp.zeros((1, NLON, NLAT, 4)),
            jnp.ones((1, 1)),
        )
        assert out.shape == (1, NLON, NLAT, 1)


class _AnalyticDenoiser:
    """Fake denoiser handle with a closed-form data prediction.

    Exposes exactly the surface Sampler uses: forward_fn(compute_dtype),
    num_lon / num_lat / output_features_dim (for isotropic-noise shapes).
    """

    num_lon = 8
    num_lat = 4
    output_features_dim = 2

    def __init__(self, fn):
        self._fn = fn

    def forward_fn(self, compute_dtype=None):
        del compute_dtype

        def fwd(params, x, prev_inputs, sigma):
            del params, prev_inputs
            return self._fn(x, sigma[:, 0][:, None, None, None])

        return fwd


class TestSamplerNumerics:
    """DPMSolver++2S solver-math checks against closed-form ODE solutions.

    The probability-flow ODE is dx/dsigma = (x - D(x, sigma)) / sigma
    (Karras et al. 2022, eq. 1 with the denoiser parameterization the
    reference uses, models/gencast/sampler.py:110-128).
    """

    def _run(self, fn, num_steps, key=jax.random.PRNGKey(7)):
        den = _AnalyticDenoiser(fn)
        sampler = Sampler(S_churn=0.0, num_steps=num_steps)
        prev = jnp.zeros((2, den.num_lon, den.num_lat, 6))
        out = sampler.sample_fn(den)(None, key, prev)
        # Reconstruct the initial state x(sigma_max) the same way sample_fn
        # does (num_steps upfront key splits; keys[0] -> init noise).
        init_key = jax.random.split(key, sampler.num_steps)[0]
        x0 = sampler.sigmas()[0] * sampler._noise(init_key, den, 2)
        return np.asarray(out), np.asarray(x0), sampler

    def test_exact_for_constant_data_prediction(self):
        # D(x, sigma) = c: exponential-integrator steps are EXACT for any
        # num_steps -> x_out = c + (x0 - c) * sigma_min / sigma_max.
        c = 0.7
        out, x0, sampler = self._run(lambda x, s: jnp.full_like(x, c), num_steps=6)
        expected = c + (x0 - c) * sampler.sigma_min / sampler.sigma_max
        np.testing.assert_allclose(out, expected, rtol=0, atol=1e-5)

    def test_convergence_for_gaussian_optimal_denoiser(self):
        # Data ~ N(0, sd^2 I) has optimal denoiser D = x sd^2/(sigma^2+sd^2);
        # the ODE solution is x(s) = x0 sqrt((s^2+sd^2)/(smax^2+sd^2)).
        # A correct 2nd-order solver converges fast; a coefficient bug
        # would plateau at O(1) error.
        sd = 2.0
        fn = lambda x, s: x * (sd**2 / (s**2 + sd**2))  # noqa: E731
        errs = {}
        for n in (10, 40):
            out, x0, sampler = self._run(fn, num_steps=n)
            factor = np.sqrt(
                (sampler.sigma_min**2 + sd**2) / (sampler.sigma_max**2 + sd**2)
            )
            errs[n] = np.max(np.abs(out - x0 * factor))
        scale = np.max(np.abs(x0)) * factor
        assert errs[40] < 0.02 * scale, errs
        assert errs[40] < errs[10] / 4.0, errs


class TestSampler:
    def test_sample_shapes_and_stochasticity(self, denoiser_and_params):
        den, params = denoiser_and_params
        prev = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, NLON, NLAT, 6)), jnp.float32
        )
        sampler = Sampler(num_steps=4)
        s1 = sampler.sample(den, params, prev, key=jax.random.PRNGKey(1))
        s2 = sampler.sample(den, params, prev, key=jax.random.PRNGKey(2))
        assert s1.shape == (1, NLON, NLAT, 2)
        assert jnp.all(jnp.isfinite(s1))
        assert not np.allclose(np.asarray(s1), np.asarray(s2))


class TestARRollout:
    def test_default_update_shifts_window(self):
        from graph_weather_tpu.models.gencast.rollout import default_update_fn

        rng = np.random.default_rng(0)
        prev = jnp.asarray(rng.normal(size=(1, 4, 3, 6)), jnp.float32)  # F_in=3
        sample = jnp.asarray(rng.normal(size=(1, 4, 3, 2)), jnp.float32)
        nxt = default_update_fn(prev, sample)
        assert nxt.shape == prev.shape
        np.testing.assert_array_equal(np.asarray(nxt[..., :3]), np.asarray(prev[..., 3:]))
        np.testing.assert_allclose(
            np.asarray(nxt[..., 3:5]),
            np.asarray(prev[..., 3:5] + sample),
            rtol=1e-6,
        )
        np.testing.assert_array_equal(np.asarray(nxt[..., 5:]), np.asarray(prev[..., 5:]))

    def test_trajectory_shapes_and_stochasticity(self, denoiser_and_params):
        from graph_weather_tpu.models.gencast import Sampler, jit_ar_rollout

        den, params = denoiser_and_params
        prev = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, NLON, NLAT, 6)), jnp.float32
        )
        rollout = jit_ar_rollout(Sampler(num_steps=3), den, num_ar_steps=3)
        traj = rollout(params, jax.random.PRNGKey(0), prev)
        assert traj.shape == (3, 1, NLON, NLAT, 2)
        assert jnp.all(jnp.isfinite(traj))
        assert not np.allclose(np.asarray(traj[0]), np.asarray(traj[1]))
        final = jit_ar_rollout(
            Sampler(num_steps=3), den, num_ar_steps=2, collect=False
        )(params, jax.random.PRNGKey(0), prev)
        assert final.shape == prev.shape


class TestNoiseUtils:
    def test_noise_level_distribution_range(self):
        levels = sample_noise_level(jax.random.PRNGKey(0), (1000,))
        assert float(levels.min()) >= 0.02 - 1e-6
        assert float(levels.max()) <= 88.0 + 1e-4

    def test_weighted_loss_shape_validation(self):
        loss = WeightedMSELoss(grid_lat=_grids()[1])
        with pytest.raises(ValueError):
            loss(jnp.zeros((1, 4, NLAT, 2)), jnp.ones((2, 1)), jnp.zeros((1, 4, NLAT, 2)))
        with pytest.raises(ValueError):
            loss(jnp.zeros((1, 4, 3, 2)), jnp.ones((1, 1)), jnp.zeros((1, 4, 3, 2)))


class TestComputeDtype:
    def test_bf16_forward_close_to_f32(self, denoiser_and_params):
        den, params = denoiser_and_params
        rng = np.random.default_rng(5)
        tgt = jnp.asarray(rng.normal(size=(1, NLON, NLAT, 2)), jnp.float32)
        prev = jnp.asarray(rng.normal(size=(1, NLON, NLAT, 6)), jnp.float32)
        noise = jnp.full((1, 1), 0.5)
        o32 = den.forward_fn()(params, tgt, prev, noise)
        o16 = den.forward_fn(compute_dtype=jnp.bfloat16)(params, tgt, prev, noise)
        assert o16.dtype == jnp.float32
        # bf16 noise compounds through the attention stack; require the
        # bulk statistics to agree (measured 1e-3 mean at realistic scale)
        assert float(jnp.abs(o32 - o16).mean()) < 0.02
        assert float(jnp.abs(o32 - o16).max()) < 0.5


class TestGraphCache:
    def test_roundtrip_identical(self, tmp_path, monkeypatch):
        """Cached graphs load bit-identical to a fresh build."""
        monkeypatch.setenv("GRAPH_WEATHER_TPU_CACHE_DIR", str(tmp_path))
        monkeypatch.setenv("GRAPH_WEATHER_TPU_GRAPH_CACHE", "1")
        from graph_weather_tpu.models.gencast.graphs import build_graphcast_graphs

        kw = dict(splits=2, num_hops=2, add_edge_features_to_khop=False,
                  spatial_sort="rcb")
        lon, lat = np.arange(0, 360, 30.0), np.linspace(-90, 90, 7)
        fresh = build_graphcast_graphs(lon, lat, **kw)
        assert len(list(tmp_path.iterdir())) == 1  # one cache entry written
        cached = build_graphcast_graphs(lon, lat, **kw)
        for name in ("g2m", "mesh", "m2g", "khop"):
            a, b = getattr(fresh, name), getattr(cached, name)
            np.testing.assert_array_equal(a.senders, b.senders)
            np.testing.assert_array_equal(a.receivers, b.receivers)
            np.testing.assert_array_equal(a.edge_attr, b.edge_attr)
            assert (a.n_senders, a.n_receivers) == (b.n_senders, b.n_receivers)
        np.testing.assert_array_equal(fresh.grid_node_feats, cached.grid_node_feats)
        np.testing.assert_array_equal(fresh.mesh_vertices, cached.mesh_vertices)
        # different args -> different entry, not a stale hit
        other = build_graphcast_graphs(lon, lat, splits=2, num_hops=1,
                                       add_edge_features_to_khop=False)
        assert other.khop.n_edges != fresh.khop.n_edges
        assert len(list(tmp_path.iterdir())) == 2

    def test_cache_disabled(self, tmp_path, monkeypatch):
        monkeypatch.setenv("GRAPH_WEATHER_TPU_CACHE_DIR", str(tmp_path))
        monkeypatch.setenv("GRAPH_WEATHER_TPU_GRAPH_CACHE", "0")
        from graph_weather_tpu.models.gencast.graphs import build_graphcast_graphs

        build_graphcast_graphs(np.arange(0, 360, 45.0), np.linspace(-90, 90, 5),
                               splits=2)
        assert list(tmp_path.iterdir()) == []
