"""Multi-device tests on the virtual 8-device CPU mesh (a capability the
reference lacks entirely — its distribution is hidden inside Lightning/
DeepSpeed, SURVEY section 2.8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_weather_tpu import GraphWeatherForecaster, NormalizedMSELoss
from graph_weather_tpu.parallel import (
    make_mesh,
    node_sharded_forward,
    shard_batch,
    sharding_for_tree,
)
from graph_weather_tpu.train import make_optimizer, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _small_model():
    lat_lons = [
        (float(a), float(b)) for a in range(-80, 81, 20) for b in range(0, 360, 24)
    ]
    model = GraphWeatherForecaster(
        lat_lons, feature_dim=8, aux_dim=4, node_dim=32, edge_dim=32,
        num_blocks=2, hidden_dim_processor_node=32, hidden_dim_processor_edge=32,
        hidden_dim_decoder=16,
    )
    return model, lat_lons


def test_mesh_shape():
    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["model"] == 8


def test_fsdp_param_sharding_covers_large_leaves():
    model, _ = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    shardings = sharding_for_tree(params, mesh)
    leaves = jax.tree_util.tree_leaves(shardings)
    from jax.sharding import PartitionSpec as P

    assert any(s.spec != P() for s in leaves)  # something actually sharded


def test_spatial_sharding_matches_replicated():
    model, lat_lons = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, len(lat_lons), 12))
    ref = model.apply(params, x)
    mesh = make_mesh(8)
    fn = jax.jit(node_sharded_forward(model.forward_fn(), mesh))
    out = fn(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_sharded_train_step_runs_and_matches_single_device():
    model, lat_lons = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    loss_obj = NormalizedMSELoss(np.ones(8), lat_lons, normalize=True)
    opt = make_optimizer(learning_rate=1e-3)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, len(lat_lons), 12))
    y = jax.random.normal(jax.random.PRNGKey(2), (4, len(lat_lons), 8))

    # single-device reference
    step_ref = jax.jit(make_train_step(model.forward_fn(), loss_obj, opt))
    p_ref, _, loss_ref = step_ref(params, opt.init(params), x, y)

    # 8-device DP + FSDP + spatial
    mesh = make_mesh(8)
    fwd = node_sharded_forward(model.forward_fn(), mesh)
    sp = sharding_for_tree(params, mesh)
    params_s = jax.device_put(params, sp)
    opt_state = opt.init(params_s)
    opt_state = jax.device_put(opt_state, sharding_for_tree(opt_state, mesh))
    xs, ys = shard_batch((x, y), mesh)
    step = jax.jit(make_train_step(fwd, loss_obj, opt))
    p_new, _, loss = step(params_s, opt_state, xs, ys)

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        p_new, p_ref,
    )


def test_halo_processor_matches_unsharded():
    """Explicit shard_map halo exchange == unsharded Processor (fp32)."""
    from graph_weather_tpu.meshes.graphs import build_latent_graph
    from graph_weather_tpu.models.layers import Processor
    from graph_weather_tpu.nn.graph_blocks import DeviceGraph
    from graph_weather_tpu.parallel.halo import (
        make_halo_processor,
        partition_latent_graph,
        shard_edge_feats,
    )

    bundle = build_latent_graph(resolution=1)
    proc = Processor(
        node_dim=16, edge_dim=16, num_blocks=2,
        hidden_dim_processor_node=16, hidden_dim_processor_edge=16,
    )
    g = DeviceGraph.from_bundle(bundle)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, bundle.n_receivers, 16)), jnp.float32)
    efull = jnp.asarray(rng.normal(size=(bundle.n_edges, 16)), jnp.float32)
    params = proc.init(jax.random.PRNGKey(0), x, efull, g)
    ref = proc.apply(params, x, efull, g)

    mesh = make_mesh(8, data_axis=1)
    part = partition_latent_graph(bundle, 8)
    ef = shard_edge_feats(part, bundle, np.asarray(efull))
    halo = make_halo_processor(
        part, mesh, node_dim=16, edge_dim=16, num_blocks=2,
        hidden_dim_node=16, hidden_dim_edge=16,
    )
    out = jax.jit(halo)(params["params"]["GraphProcessor_0"], x, ef)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_spatial_forecaster_forward_matches_unsharded():
    """Explicit shard_map grid-node sharding == unsharded forward.

    _small_model's 135-node grid is NOT divisible by the model axis (4), so
    this also exercises the padding path."""
    model, lat_lons = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, len(lat_lons), 12))
    ref = model.apply(params, x)
    mesh = make_mesh(8)
    fn = jax.jit(model.spatial_forward_fn(mesh))
    out = fn(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_spatial_forecaster_grads_match_unsharded():
    model, lat_lons = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, len(lat_lons), 12))
    mesh = make_mesh(8)
    fwd_s = model.spatial_forward_fn(mesh)
    fwd_u = model.forward_fn()

    def loss_u(p):
        return jnp.mean(fwd_u(p, x) ** 2)

    def loss_s(p):
        return jnp.mean(fwd_s(p, x) ** 2)

    gu = jax.jit(jax.grad(loss_u))(params)
    gs = jax.jit(jax.grad(loss_s))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        gu, gs,
    )


def test_spatial_forecaster_midscale_10deg_res2():
    """Mid scale: full 10-degree global grid (648 nodes) against the
    DEFAULT res-2 hex mesh (5,882 cells) — mesh nodes outnumber grid nodes,
    stressing the halo partition rather than the toy graphs."""
    lat_lons = [
        (float(a), float(b))
        for a in np.arange(-90.0, 90.0, 10.0)
        for b in np.arange(0.0, 360.0, 10.0)
    ]
    model = GraphWeatherForecaster(
        lat_lons, feature_dim=8, aux_dim=4, node_dim=32, edge_dim=32,
        num_blocks=3, hidden_dim_processor_node=32,
        hidden_dim_processor_edge=32, hidden_dim_decoder=16,
    )
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, len(lat_lons), 12))
    ref = model.apply(params, x)
    mesh = make_mesh(8)
    out = jax.jit(model.spatial_forward_fn(mesh))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_spatial_forecaster_train_step_matches_single_device():
    model, lat_lons = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    loss_obj = NormalizedMSELoss(np.ones(8), lat_lons, normalize=True)
    opt = make_optimizer(learning_rate=1e-3)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, len(lat_lons), 12))
    y = jax.random.normal(jax.random.PRNGKey(2), (4, len(lat_lons), 8))

    step_ref = jax.jit(make_train_step(model.forward_fn(), loss_obj, opt))
    p_ref, _, loss_ref = step_ref(params, opt.init(params), x, y)

    mesh = make_mesh(8)
    fwd = model.spatial_forward_fn(mesh)
    xs, ys = shard_batch((x, y), mesh)
    step = jax.jit(make_train_step(fwd, loss_obj, opt))
    p_new, _, loss = step(params, opt.init(params), xs, ys)

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        p_new, p_ref,
    )


def test_spatial_forecaster_res3_mesh_matches_unsharded():
    """The 0.25-degree configuration's latent mesh (H3 resolution 3,
    41,162 cells / 288,122 latent edges) through the sharded path: 5-degree
    grid to keep CPU runtime sane, resolution-3 mesh as at production
    scale. Exact-match against the unsharded forward."""
    lat_lons = [
        (float(a), float(b))
        for a in np.arange(-90.0, 90.0, 5.0)
        for b in np.arange(0.0, 360.0, 5.0)
    ]
    model = GraphWeatherForecaster(
        lat_lons, feature_dim=4, aux_dim=2, resolution=3, node_dim=16,
        edge_dim=16, num_blocks=2, hidden_dim_processor_node=16,
        hidden_dim_processor_edge=16, hidden_dim_decoder=8,
    )
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, len(lat_lons), 6))
    ref = model.apply(params, x)
    mesh = make_mesh(8)
    out = jax.jit(model.spatial_forward_fn(mesh))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestShardedEnsemble:
    def test_fgn_ensemble_matches_unsharded_vmap(self):
        from graph_weather_tpu.models.fgn import FunctionalGenerativeNetwork
        from graph_weather_tpu.parallel import sharded_fgn_ensemble

        glon = np.arange(0, 360, 360 / 16)
        glat = np.linspace(-90, 90, 8)
        fgn = FunctionalGenerativeNetwork(
            glon, glat, input_features_dim=2, output_features_dim=1,
            noise_dimension=3, hidden_dims=(8, 8), num_blocks=1, num_heads=2,
            splits=1, num_hops=1,
        )
        params = fgn.init(jax.random.PRNGKey(0))
        state = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 16, 8, 2)), jnp.float32
        )
        keys = jax.random.split(jax.random.PRNGKey(1), 8)
        mesh = make_mesh(8)
        sharded = sharded_fgn_ensemble(fgn, mesh)
        out = sharded(params, state, keys)
        assert out.shape == (8, 1, 16, 8, 1)
        # reference: plain vmap over the same member fn and keys
        member = fgn.member_fn()

        def one(k):
            z = jax.random.normal(k, (1, 3))
            return member(params, state, z)

        ref = jax.vmap(one)(keys)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5
        )
        # members land sharded over the mesh, not replicated
        assert not out.sharding.is_fully_replicated

    def test_sampler_ensemble_shapes_and_spread(self):
        from graph_weather_tpu.models.gencast import Denoiser, Sampler
        from graph_weather_tpu.parallel import sharded_sampler_ensemble

        glon = np.arange(0, 360, 360 / 16)
        glat = np.linspace(-90, 90, 8)
        den = Denoiser(
            glon, glat, input_features_dim=2, output_features_dim=2,
            hidden_dims=(8, 8), num_blocks=1, num_heads=2, splits=1,
            num_hops=1,
        )
        params = den.init(jax.random.PRNGKey(0))
        prev = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 16, 8, 4)), jnp.float32
        )
        keys = jax.random.split(jax.random.PRNGKey(2), 8)
        mesh = make_mesh(8)
        ens_fn = sharded_sampler_ensemble(Sampler(num_steps=3), den, mesh)
        ens = ens_fn(params, prev, keys)
        assert ens.shape == (8, 1, 16, 8, 2)
        assert bool(jnp.all(jnp.isfinite(ens)))
        # distinct keys -> distinct members
        assert not np.allclose(np.asarray(ens[0]), np.asarray(ens[1]))


class TestBlockShardedDenoiser:
    def test_matches_unsharded_forward(self):
        """Processor sharded by cluster blocks over the 'model' axis must
        reproduce the unsharded Denoiser forward (same params)."""
        from graph_weather_tpu.models.gencast import Denoiser
        from graph_weather_tpu.parallel import (
            make_block_sharded_denoiser_fwd,
            make_mesh,
        )

        glon = np.arange(0, 360, 360 / 32)
        glat = np.linspace(-90, 90, 16)
        den = Denoiser(
            glon, glat, input_features_dim=3, output_features_dim=2,
            hidden_dims=(16, 16), num_blocks=2, num_heads=2, splits=2,
            num_hops=2, use_edges_features=False,
            attention_impl="clustered_flash",
        )
        params = den.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(7)
        tgt = jnp.asarray(rng.normal(size=(1, 32, 16, 2)), jnp.float32)
        prev = jnp.asarray(rng.normal(size=(1, 32, 16, 6)), jnp.float32)
        noise = jnp.full((1, 1), 0.5)
        ref = den.forward_fn()(params, tgt, prev, noise)

        mesh = make_mesh(8, data_axis=2)  # model axis = 4
        fwd = make_block_sharded_denoiser_fwd(den, mesh)
        out = fwd(params, tgt, prev, noise)
        # Same params, same graph; differences are pure f32 reassociation
        # between the two XLA programs — the same ~4e-4 drift bound the
        # clustered-vs-segment tests use through conditioned-norm blocks.
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-3
        )
        assert np.abs(np.asarray(out) - np.asarray(ref)).mean() < 1e-4


class TestProductionDimCompileOnly:
    """AOT lower (SPMD program construction) of the production-scale
    sharded programs on the 8-device virtual mesh, asserting the expected
    ICI collectives appear. Compile-only: full execution at these dims
    false-fails on the shared-core CPU mesh (40 s rendezvous timeout,
    NOTES.md), but the lowering pins the sharded program structure.
    """

    def _collectives(self, text):
        return {
            name
            for name in ("all-gather", "all_gather", "all-reduce",
                         "all_reduce", "collective-permute",
                         "collective_permute")
            if name in text
        }

    def test_quarter_degree_sharded_forecaster_lowers(self):
        """0.25-deg grid (720 x 1440 = 1,036,800 nodes, res-3 mesh) 8-way
        grid-node-sharded forward: the v5p-8 north-star program."""
        from graph_weather_tpu.parallel import make_mesh, make_spatial_forward

        lat_lons = [
            (float(a), float(b))
            for a in np.arange(-90.0, 90.0, 0.25)
            for b in np.arange(0.0, 360.0, 0.25)
        ]
        model = GraphWeatherForecaster(
            lat_lons, feature_dim=78, aux_dim=24, resolution=3
        )
        mesh = make_mesh(8, data_axis=1)
        fn = make_spatial_forward(model, mesh, compute_dtype=jnp.bfloat16)
        params = jax.eval_shape(
            lambda r: model.module.init(
                r,
                jnp.zeros((1, model.num_grid_nodes, 102)),
                model.g2m, model.latent, model.m2g,
            ),
            jax.random.PRNGKey(0),
        )
        lowered = jax.jit(fn).lower(
            params,
            jax.ShapeDtypeStruct((1, len(lat_lons), 102), jnp.float32),
        )
        found = self._collectives(lowered.as_text())
        # encoder psum (all-reduce) + processor/decoder all-gathers
        assert any("gather" in f for f in found), found
        assert any("reduce" in f for f in found), found

    def test_splits6_block_sharded_denoiser_lowers(self):
        """GenCast production scale (splits 6, 40,962 mesh nodes): the
        block-sharded processor's per-layer all-gather must appear."""
        from graph_weather_tpu.models.gencast import Denoiser
        from graph_weather_tpu.parallel import make_mesh
        from graph_weather_tpu.parallel.gencast_spatial import (
            make_block_sharded_denoiser_fwd,
        )

        den = Denoiser(
            grid_lon=np.arange(0.0, 360.0, 360.0 / 128),
            grid_lat=np.linspace(-90.0, 90.0, 64),
            input_features_dim=89,
            output_features_dim=83,
            hidden_dims=(512, 512),
            num_blocks=16,
            num_heads=4,
            splits=6,
            num_hops=6,
            use_edges_features=False,
            attention_impl="clustered_flash",
        )
        mesh = make_mesh(8, data_axis=1)
        fwd = make_block_sharded_denoiser_fwd(den, mesh)
        params = jax.eval_shape(
            lambda r: den.module.init(
                r,
                jnp.zeros((1, 128 * 64, 83)),
                jnp.zeros((1, 128 * 64, 2 * 89)),
                jnp.ones((1, 1)),
                den.grid_node_feats,
                den.mesh_node_feats,
                den.g2m, den.khop, den.m2g,
            ),
            jax.random.PRNGKey(0),
        )
        lowered = jax.jit(fwd).lower(
            params,
            jax.ShapeDtypeStruct((1, 128, 64, 83), jnp.float32),
            jax.ShapeDtypeStruct((1, 128, 64, 2 * 89), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )
        found = self._collectives(lowered.as_text())
        assert any("gather" in f for f in found), found

    def test_quarter_degree_sharded_train_step_lowers(self):
        """0.25-deg TRAIN step (fwd+bwd+AdamW through the grid-node-sharded
        forward): the sharded-training extension of the v5p-8 north star.
        Asserts the SPMD program carries both gathers (processor halo /
        decoder) and reductions (gradient psum across the model axis)."""
        from graph_weather_tpu.parallel import make_mesh, make_spatial_forward
        from graph_weather_tpu.train import make_optimizer, make_train_step

        lat_lons = [
            (float(a), float(b))
            for a in np.arange(-90.0, 90.0, 0.25)
            for b in np.arange(0.0, 360.0, 0.25)
        ]
        model = GraphWeatherForecaster(
            lat_lons, feature_dim=78, aux_dim=24, resolution=3
        )
        mesh = make_mesh(8, data_axis=1)
        fwd = make_spatial_forward(model, mesh, compute_dtype=jnp.bfloat16)
        loss_obj = NormalizedMSELoss(np.ones(78), lat_lons, normalize=True)
        opt = make_optimizer(learning_rate=1e-4)
        step = make_train_step(fwd, loss_obj, opt)

        params = jax.eval_shape(
            lambda r: model.module.init(
                r,
                jnp.zeros((1, model.num_grid_nodes, 102)),
                model.g2m, model.latent, model.m2g,
            ),
            jax.random.PRNGKey(0),
        )
        opt_state = jax.eval_shape(opt.init, params)
        lowered = jax.jit(step).lower(
            params,
            opt_state,
            jax.ShapeDtypeStruct((1, len(lat_lons), 102), jnp.float32),
            jax.ShapeDtypeStruct((1, len(lat_lons), 78), jnp.float32),
        )
        found = self._collectives(lowered.as_text())
        assert any("gather" in f for f in found), found
        assert any("reduce" in f for f in found), found


class TestAttentionFamiliesDP:
    """DP exact-match for the attention model families (WeatherMesh, CaFA,
    Aurora, FengWu-GHR, Regional): batch sharded over the "data" axis,
    params replicated — outputs must equal the unsharded forward. (The
    graph families' sharded coverage lives above; reference-side
    distribution is hidden inside Lightning, SURVEY §2.8.)"""

    def _mesh(self):
        return make_mesh(8, data_axis=4)

    def _check(self, fn, params, *batch):
        ref = jax.jit(fn)(params, *batch)
        mesh = self._mesh()
        sharded = shard_batch(tuple(batch), mesh)
        out = jax.jit(fn)(params, *sharded)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            ref, out,
        )

    def test_weathermesh_dp(self):
        from graph_weather_tpu.models.weathermesh import WeatherMeshConfig

        cfg = WeatherMeshConfig(
            timesteps=[6], surface_channels=4, pressure_channels=3,
            pressure_levels=4, latent_dim=16, encoder_num_conv_blocks=2,
            encoder_num_transformer_layers=1, encoder_hidden_dim=4,
            decoder_num_conv_blocks=2, decoder_num_transformer_layers=1,
            decoder_hidden_dim=4, processor_num_layers=1, kernel=(3, 3, 3),
            num_heads=2,
        )
        model = cfg.build()
        surface = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 4))
        pressure = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 16, 16, 3))
        params = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), surface, pressure, 1)
        )()
        fn = lambda p, s, pr: model.apply(p, s, pr, 1)
        # Ground truth = stacked per-sample forwards: the DP-sharded program
        # computes exactly these (each device holds whole samples), while a
        # batch-4 UNSHARDED forward drifts ~5e-4 from per-sample through
        # XLA's batched-conv reassociation — so that's the wrong oracle.
        refs = [
            jax.jit(fn)(params, surface[i : i + 1], pressure[i : i + 1])
            for i in range(4)
        ]
        ref = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *refs
        )
        mesh = self._mesh()
        s_s, p_s = shard_batch((surface, pressure), mesh)
        out = jax.jit(fn)(params, s_s, p_s)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            ),
            ref, out,
        )

    def test_cafa_dp(self):
        from graph_weather_tpu.models.cafa import CaFAForecaster

        model = CaFAForecaster(
            input_channels=3, output_channels=2, model_dim=16,
            downsampling_factor=2, processor_depth=1, num_heads=2, dim_head=8,
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 16, 32))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        self._check(model.apply, params, x)

    def test_aurora_dp(self):
        from graph_weather_tpu.models.aurora import AuroraModel

        model = AuroraModel(
            input_features=3, output_features=2, latent_dim=16, num_layers=1,
        )
        rng = np.random.default_rng(0)
        points = jnp.asarray(rng.uniform(-90, 90, (4, 20, 2)), jnp.float32)
        feats = jnp.asarray(rng.normal(size=(4, 20, 3)), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), points, feats)
        self._check(model.apply, params, points, feats)

    def test_fengwu_dp(self):
        from graph_weather_tpu.models.fengwu_ghr import ImageMetaModel

        model = ImageMetaModel(
            image_size=(8, 8), patch_size=(2, 2), depth=1, heads=2,
            mlp_dim=16, channels=3, dim_head=8,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 8, 8))
        params = jax.jit(model.init)(jax.random.PRNGKey(1), x)
        self._check(model.apply, params, x)

    def test_regional_dp(self):
        from graph_weather_tpu.models.regional import RegionalForecasterConfig

        rng = np.random.default_rng(0)
        ll = [
            (float(a), float(b))
            for a, b in zip(rng.uniform(20, 60, 40), rng.uniform(10, 80, 40))
        ]
        cfg = RegionalForecasterConfig(
            feature_dim=4, aux_dim=2, node_dim=16, edge_dim=16, num_blocks=1,
            hidden_dim_processor_node=16, hidden_dim_processor_edge=16,
            hidden_dim_decoder=8,
        )
        rf = cfg.build()
        params = rf.init(jax.random.PRNGKey(0), ll, batch_size=4)
        feats = jnp.asarray(rng.normal(size=(4, len(ll), 6)), jnp.float32)
        ref = rf(params, feats, ll)
        mesh = self._mesh()
        (feats_s,) = shard_batch((feats,), mesh)
        out = rf(params, feats_s, ll)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)
