"""Weight-conversion parity vs committed PyTorch-reference goldens.

tests/goldens/*.npz are produced by parity/generate_goldens.py, which runs
the actual reference implementation (reference models/forecast.py:61) on
graphs built from THIS framework's hex mesh (parity/ref_shims.py), so the
comparison isolates the numerical math: same topology, same weights
(converted by scripts/convert_torch.py), reference torch vs our JAX.

No torch needed here — the goldens carry the state_dict as numpy arrays.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_weather_tpu import GraphWeatherForecaster
from graph_weather_tpu.convert import convert_forecaster

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "forecaster_small.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden not generated")
def test_forecaster_matches_torch_reference_golden():
    data = np.load(GOLDEN)
    (lat_step, lon_step, feature_dim, aux_dim, node_dim, edge_dim,
     num_blocks, hid_node, hid_edge, hid_dec) = data["__config__"]
    lat_lons = [
        (float(a), float(b))
        for a in np.arange(-90.0, 90.0, lat_step)
        for b in np.arange(0.0, 360.0, lon_step)
    ]
    model = GraphWeatherForecaster(
        lat_lons,
        feature_dim=int(feature_dim),
        aux_dim=int(aux_dim),
        node_dim=int(node_dim),
        edge_dim=int(edge_dim),
        num_blocks=int(num_blocks),
        hidden_dim_processor_node=int(hid_node),
        hidden_dim_processor_edge=int(hid_edge),
        hidden_dim_decoder=int(hid_dec),
        # Reproduce the reference's latent-graph ordering quirk (see
        # models/forecast.py:reversal_conjugated_latent).
        latent_graph_order="reference",
    )

    sd = {k: data[k] for k in data.files if not k.startswith("__")}
    params = jax.tree_util.tree_map(
        np.asarray, convert_forecaster(sd, num_blocks=int(num_blocks))
    )
    # Converted tree must be structurally identical to a fresh init.
    ref_tree = jax.tree_util.tree_structure(model.init(jax.random.PRNGKey(0)))
    assert jax.tree_util.tree_structure(params) == ref_tree

    out = np.asarray(model.apply(params, data["__input__"]))
    expected = data["__output__"]
    assert out.shape == expected.shape
    # Per-variable parity at f32 tolerance (BASELINE.md target).
    err = np.abs(out - expected)
    per_var_rmse = np.sqrt(((out - expected) ** 2).mean(axis=(0, 1)))
    assert per_var_rmse.max() < 1e-5, per_var_rmse
    assert err.max() < 1e-4, err.max()


GRAPHCAST_GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "graphcast_small.npz"
)


@pytest.mark.skipif(
    not os.path.exists(GRAPHCAST_GOLDEN), reason="golden not generated"
)
def test_graphcast_matches_torch_reference_golden():
    """GraphCast parity (reference models/graphcast/model.py:21): the same
    encode-process-decode weights as the forecaster path (convert_forecaster
    applies — identical encoder./processor./decoder. key layout) under the
    uniform-hidden-dim GraphCast wrapper. Checkpointing presets are
    numerically transparent so 'none' covers them."""
    from graph_weather_tpu.models import GraphCast

    data = np.load(GRAPHCAST_GOLDEN)
    (lat_step, lon_step, input_dim, output_dim, hidden_dim,
     num_blocks, hidden_layers) = data["__config__"]
    lat_lons = [
        (float(a), float(b))
        for a in np.arange(-90.0, 90.0, lat_step)
        for b in np.arange(0.0, 360.0, lon_step)
    ]
    model = GraphCast(
        lat_lons,
        input_dim=int(input_dim),
        output_dim=int(output_dim),
        hidden_dim=int(hidden_dim),
        num_processor_blocks=int(num_blocks),
        hidden_layers=int(hidden_layers),
        latent_graph_order="reference",
        # The reference leaves Decoder.output_edge_dim at its 256 default.
        decoder_edge_dim=256,
    )
    sd = {k: data[k] for k in data.files if not k.startswith("__")}
    params = jax.tree_util.tree_map(
        np.asarray, convert_forecaster(sd, num_blocks=int(num_blocks))
    )
    ref_tree = jax.tree_util.tree_structure(model.init(jax.random.PRNGKey(0)))
    assert jax.tree_util.tree_structure(params) == ref_tree

    out = np.asarray(model.apply(params, data["__input__"]))
    expected = data["__output__"]
    assert out.shape == expected.shape
    per_var_rmse = np.sqrt(((out - expected) ** 2).mean(axis=(0, 1)))
    assert per_var_rmse.max() < 1e-5, per_var_rmse
    assert np.abs(out - expected).max() < 1e-4


GENCAST_GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "gencast_small.npz"
)


@pytest.mark.skipif(
    not os.path.exists(GENCAST_GOLDEN), reason="golden not generated"
)
def test_gencast_denoiser_matches_torch_reference_golden():
    """Full GenCast Denoiser parity: converted weights, reference-oriented
    icosphere geometry (mesh_orientation='graphcast'), identical grid.
    Mesh vertex ORDER differs between the implementations, which is
    immaterial: no per-vertex parameters, permutation-equivariant mesh."""
    from graph_weather_tpu.models.gencast import Denoiser
    from graph_weather_tpu.convert import convert_denoiser

    data = np.load(GENCAST_GOLDEN)
    (nlon, nlat, f_in, f_out, hid, n_hidden, num_blocks, num_heads,
     splits, num_hops, use_edges) = data["__config__"]
    den = Denoiser(
        grid_lon=data["__grid_lon__"],
        grid_lat=data["__grid_lat__"],
        input_features_dim=int(f_in),
        output_features_dim=int(f_out),
        hidden_dims=(int(hid),) * int(n_hidden),
        num_blocks=int(num_blocks),
        num_heads=int(num_heads),
        splits=int(splits),
        num_hops=int(num_hops),
        use_edges_features=bool(use_edges),
        mesh_orientation="graphcast",
        # The reference flattens data lon-major against its lat-major
        # graphs (denoiser.py:318-319) — reproduce that net function.
        node_layout="reference",
    )
    sd = {k: data[k] for k in data.files if not k.startswith("__")}
    params = convert_denoiser(
        sd, num_blocks=int(num_blocks), mlp_hidden_dims=int(n_hidden)
    )
    ref_tree = jax.tree_util.tree_structure(den.init(jax.random.PRNGKey(0)))
    assert jax.tree_util.tree_structure(params) == ref_tree

    out = np.asarray(
        den.forward_fn()(
            params, data["__corrupted__"], data["__prev__"], data["__noise__"]
        )
    )
    expected = data["__output__"]
    assert out.shape == expected.shape
    per_var_rmse = np.sqrt(((out - expected) ** 2).mean(axis=(0, 1, 2)))
    assert per_var_rmse.max() < 1e-5, per_var_rmse


@pytest.mark.skipif(
    not os.path.exists(GENCAST_GOLDEN), reason="golden not generated"
)
def test_denoiser_from_pretrained_local_dir(tmp_path):
    """from_pretrained on a reference-format checkpoint directory
    (config.json + model.safetensors, the PyTorchModelHubMixin layout the
    reference publishes, e.g. openclimatefix/gencast-128x64) reproduces
    the reference golden output."""
    safetensors = pytest.importorskip("safetensors.numpy")
    import json

    from graph_weather_tpu.models.gencast import Denoiser

    data = np.load(GENCAST_GOLDEN)
    (nlon, nlat, f_in, f_out, hid, n_hidden, num_blocks, num_heads,
     splits, num_hops, use_edges) = data["__config__"]
    cfg = {
        "grid_lon": data["__grid_lon__"].tolist(),
        "grid_lat": data["__grid_lat__"].tolist(),
        "input_features_dim": int(f_in),
        "output_features_dim": int(f_out),
        "hidden_dims": [int(hid)] * int(n_hidden),
        "num_blocks": int(num_blocks),
        "num_heads": int(num_heads),
        "splits": int(splits),
        "num_hops": int(num_hops),
        "use_edges_features": bool(use_edges),
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    sd = {k: data[k] for k in data.files if not k.startswith("__")}
    safetensors.save_file(sd, str(tmp_path / "model.safetensors"))

    den, params = Denoiser.from_pretrained(str(tmp_path))
    out = np.asarray(
        den.forward_fn()(
            params, data["__corrupted__"], data["__prev__"], data["__noise__"]
        )
    )
    per_var_rmse = np.sqrt(
        ((out - data["__output__"]) ** 2).mean(axis=(0, 1, 2))
    )
    assert per_var_rmse.max() < 1e-5, per_var_rmse


class TestForecasterHub:
    """Hub-format save/load for the forecaster family (reference
    models/forecast.py:61 PyTorchModelHubMixin + train/run.py:531-543)."""

    def _tiny_model(self):
        lat_lons = [
            (float(a), float(b))
            for a in np.arange(-90.0, 90.0, 30.0)
            for b in np.arange(0.0, 360.0, 45.0)
        ]
        return GraphWeatherForecaster(
            lat_lons, feature_dim=4, aux_dim=2, node_dim=16, edge_dim=16,
            num_blocks=2, hidden_dim_processor_node=16,
            hidden_dim_processor_edge=16, hidden_dim_decoder=8,
        )

    def test_native_roundtrip(self, tmp_path):
        pytest.importorskip("safetensors.numpy")
        model = self._tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        model.save_pretrained(str(tmp_path / "ckpt"), params)

        model2, params2 = GraphWeatherForecaster.from_pretrained(
            str(tmp_path / "ckpt")
        )
        assert model2.lat_lons == model.lat_lons
        assert jax.tree_util.tree_structure(
            params2
        ) == jax.tree_util.tree_structure(params)
        x = jax.random.normal(
            jax.random.PRNGKey(1), (1, model.num_grid_nodes, 6)
        )
        np.testing.assert_array_equal(
            np.asarray(model.apply(params, x)),
            np.asarray(model2.apply(params2, x)),
        )

    def test_push_to_hub_uploads_hub_layout(self, monkeypatch):
        """push_to_hub (reference train/run.py:531-543) serializes the
        hub directory and uploads it; the network client is mocked — we
        assert the folder handed to upload_folder has the loadable
        layout."""
        pytest.importorskip("safetensors.numpy")
        import huggingface_hub

        calls = {}

        class FakeApi:
            def __init__(self, token=None):
                calls["token"] = token

            def create_repo(self, repo_id, private=True, exist_ok=False):
                calls["create"] = (repo_id, private, exist_ok)

            def upload_folder(self, repo_id, folder_path, commit_message):
                calls["upload"] = (repo_id, commit_message)
                calls["files"] = sorted(os.listdir(folder_path))
                # Load back from the staged folder to prove it is a
                # valid checkpoint, not just two file names.
                _, params2 = GraphWeatherForecaster.from_pretrained(
                    folder_path
                )
                calls["n_leaves"] = len(jax.tree_util.tree_leaves(params2))
                return "https://hub/fake/commit"

        monkeypatch.setattr(huggingface_hub, "HfApi", FakeApi)
        model = self._tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        url = model.push_to_hub(
            "graph-weather-forecaster-2.0deg", params,
            organization="openclimatefix", commit_message="Add model",
        )
        assert url == "https://hub/fake/commit"
        assert calls["create"] == (
            "openclimatefix/graph-weather-forecaster-2.0deg", True, True
        )
        assert calls["upload"] == (
            "openclimatefix/graph-weather-forecaster-2.0deg", "Add model"
        )
        assert calls["files"] == ["config.json", "model.safetensors"]
        assert calls["n_leaves"] == len(jax.tree_util.tree_leaves(params))

    @pytest.mark.skipif(
        not os.path.exists(GOLDEN), reason="golden not generated"
    )
    def test_reference_checkpoint_load(self, tmp_path):
        """A reference-format hub directory (PyTorchModelHubMixin layout:
        config.json of constructor kwargs + torch state_dict safetensors)
        loads through from_pretrained and reproduces the golden output."""
        safetensors = pytest.importorskip("safetensors.numpy")
        import json

        data = np.load(GOLDEN)
        (lat_step, lon_step, feature_dim, aux_dim, node_dim, edge_dim,
         num_blocks, hid_node, hid_edge, hid_dec) = data["__config__"]
        lat_lons = [
            [float(a), float(b)]
            for a in np.arange(-90.0, 90.0, lat_step)
            for b in np.arange(0.0, 360.0, lon_step)
        ]
        cfg = {
            "lat_lons": lat_lons,
            "feature_dim": int(feature_dim),
            "aux_dim": int(aux_dim),
            "node_dim": int(node_dim),
            "edge_dim": int(edge_dim),
            "num_blocks": int(num_blocks),
            "hidden_dim_processor_node": int(hid_node),
            "hidden_dim_processor_edge": int(hid_edge),
            "hidden_dim_decoder": int(hid_dec),
        }
        (tmp_path / "config.json").write_text(json.dumps(cfg))
        sd = {k: data[k] for k in data.files if not k.startswith("__")}
        safetensors.save_file(sd, str(tmp_path / "model.safetensors"))

        model, params = GraphWeatherForecaster.from_pretrained(str(tmp_path))
        out = np.asarray(model.apply(params, data["__input__"]))
        per_var_rmse = np.sqrt(
            ((out - data["__output__"]) ** 2).mean(axis=(0, 1))
        )
        assert per_var_rmse.max() < 1e-5, per_var_rmse


def _golden(name):
    return os.path.join(os.path.dirname(__file__), "goldens", name)


def _sd(data):
    return {k: data[k] for k in data.files if not k.startswith("__")}


@pytest.mark.skipif(
    not os.path.exists(_golden("fgn_small.npz")), reason="golden not generated"
)
def test_fgn_matches_torch_reference_golden():
    """FGN parity (reference models/fgn/model.py:60): converted weights,
    fixed noise vector driven through member_fn."""
    from graph_weather_tpu.convert import convert_fgn
    from graph_weather_tpu.models.fgn import FunctionalGenerativeNetwork

    data = np.load(_golden("fgn_small.npz"))
    (nlon, nlat, f_in, f_out, zdim, hid, num_blocks, num_heads, splits,
     num_hops, use_edges) = data["__config__"]
    fgn = FunctionalGenerativeNetwork(
        grid_lon=data["__grid_lon__"],
        grid_lat=data["__grid_lat__"],
        input_features_dim=int(f_in),
        output_features_dim=int(f_out),
        noise_dimension=int(zdim),
        hidden_dims=(int(hid),) * 2,
        num_blocks=int(num_blocks),
        num_heads=int(num_heads),
        splits=int(splits),
        num_hops=int(num_hops),
        use_edges_features=bool(use_edges),
        mesh_orientation="graphcast",
        node_layout="reference",
    )
    params = convert_fgn(
        _sd(data), num_blocks=int(num_blocks), mlp_hidden_dims=2,
        use_edges_features=bool(use_edges),
    )
    ref_tree = jax.tree_util.tree_structure(fgn.init(jax.random.PRNGKey(0)))
    assert jax.tree_util.tree_structure(params) == ref_tree

    # Golden prev/output are [B, N] node-major (lon-major flattening).
    prev = data["__prev__"].reshape(2, int(nlon), int(nlat), int(f_in))
    out = np.asarray(
        jax.jit(fgn.member_fn())(params, prev, data["__noise__"])
    ).reshape(2, -1, int(f_out))
    expected = data["__output__"]
    per_var_rmse = np.sqrt(((out - expected) ** 2).mean(axis=(0, 1)))
    assert per_var_rmse.max() < 1e-5, per_var_rmse


@pytest.mark.skipif(
    not os.path.exists(_golden("genda_small.npz")),
    reason="golden not generated",
)
def test_genda_matches_torch_reference_golden():
    """GenDA parity (reference models/genda/model.py:66): sensor-mask/value
    conditioning channels + Karras preconditioning."""
    from graph_weather_tpu.convert import convert_genda
    from graph_weather_tpu.models.genda import GenDA

    data = np.load(_golden("genda_small.npz"))
    (nlon, nlat, f_in, f_out, hid, num_blocks, num_heads, splits, num_hops,
     use_edges, cdim) = data["__config__"]
    model = GenDA(
        grid_lon=data["__grid_lon__"],
        grid_lat=data["__grid_lat__"],
        input_features_dim=int(f_in),
        output_features_dim=int(f_out),
        hidden_dims=(int(hid),) * 2,
        num_blocks=int(num_blocks),
        num_heads=int(num_heads),
        splits=int(splits),
        num_hops=int(num_hops),
        use_edges_features=bool(use_edges),
        conditioning_dim=int(cdim),
        mesh_orientation="graphcast",
        node_layout="reference",
    )
    params = convert_genda(
        _sd(data), num_blocks=int(num_blocks), mlp_hidden_dims=2
    )
    ref_tree = jax.tree_util.tree_structure(model.init(jax.random.PRNGKey(0)))
    assert jax.tree_util.tree_structure(params) == ref_tree

    out = np.asarray(
        model.apply(
            params,
            data["__corrupted__"],
            data["__prev__"],
            data["__noise__"],
            sensor_mask=data["__mask__"],
            sensor_values=data["__values__"],
        )
    )
    expected = data["__output__"]
    per_var_rmse = np.sqrt(((out - expected) ** 2).mean(axis=(0, 1, 2)))
    # 3e-5: the Karras preconditioning's c_out amplification on top of the
    # usual f32 op-reordering noise (observed 1.46e-5; an order-of-
    # magnitude margin below would indicate a real wiring bug).
    assert per_var_rmse.max() < 3e-5, per_var_rmse


@pytest.mark.skipif(
    not os.path.exists(_golden("cafa_small.npz")),
    reason="golden not generated",
)
def test_cafa_matches_torch_reference_golden():
    """CaFA parity (reference models/cafa/model.py:10) incl. odd-height
    pad/crop and the ConvTranspose kernel-mirror mapping."""
    from graph_weather_tpu.convert import convert_cafa
    from graph_weather_tpu.models.cafa import CaFAForecaster

    data = np.load(_golden("cafa_small.npz"))
    (c_in, c_out, dim, down, depth, heads, dim_head, ff) = data["__config__"]
    model = CaFAForecaster(
        input_channels=int(c_in),
        output_channels=int(c_out),
        model_dim=int(dim),
        downsampling_factor=int(down),
        processor_depth=int(depth),
        num_heads=int(heads),
        dim_head=int(dim_head),
        feedforward_multiplier=int(ff),
    )
    params = convert_cafa(_sd(data), processor_depth=int(depth))
    x = jnp.asarray(data["__input__"])
    ref_tree = jax.tree_util.tree_structure(
        jax.jit(model.init)(jax.random.PRNGKey(0), x)
    )
    assert jax.tree_util.tree_structure(params) == ref_tree

    out = np.asarray(jax.jit(model.apply)(params, x))
    expected = data["__output__"]
    assert out.shape == expected.shape
    per_var_rmse = np.sqrt(((out - expected) ** 2).mean(axis=(0, 2, 3)))
    assert per_var_rmse.max() < 1e-5, per_var_rmse


@pytest.mark.skipif(
    not os.path.exists(_golden("aurora_small.npz")),
    reason="golden not generated",
)
def test_aurora_matches_torch_reference_golden():
    """Aurora point-cloud model parity (reference models/aurora/model.py:187),
    masked and unmasked."""
    from graph_weather_tpu.convert import convert_aurora
    from graph_weather_tpu.models.aurora import AuroraModel

    data = np.load(_golden("aurora_small.npz"))
    f_in, f_out, latent, layers = data["__config__"]
    model = AuroraModel(
        input_features=int(f_in),
        output_features=int(f_out),
        latent_dim=int(latent),
        num_layers=int(layers),
    )
    params = convert_aurora(_sd(data), num_layers=int(layers))
    pts = jnp.asarray(data["__points__"])
    feats = jnp.asarray(data["__features__"])
    ref_tree = jax.tree_util.tree_structure(
        jax.jit(model.init)(jax.random.PRNGKey(0), pts, feats)
    )
    assert jax.tree_util.tree_structure(params) == ref_tree

    out = np.asarray(jax.jit(model.apply)(params, pts, feats))
    per_var_rmse = np.sqrt(
        ((out - data["__output__"]) ** 2).mean(axis=(0, 1))
    )
    assert per_var_rmse.max() < 1e-5, per_var_rmse

    out_m = np.asarray(
        jax.jit(model.apply)(params, pts, feats, jnp.asarray(data["__mask__"]))
    )
    per_var_rmse = np.sqrt(
        ((out_m - data["__output_masked__"]) ** 2).mean(axis=(0, 1))
    )
    assert per_var_rmse.max() < 1e-5, per_var_rmse


@pytest.mark.skipif(
    not os.path.exists(_golden("assimilator_small.npz")),
    reason="golden not generated",
)
def test_assimilator_matches_torch_reference_golden():
    """Assimilator parity (reference models/analysis.py:52): Voronoi obs
    assignment == the reference's shimmed latlng_to_cell; reversal-
    conjugated latent graph reproduces the reference's H3 row ordering."""
    from graph_weather_tpu.convert import convert_assimilator
    from graph_weather_tpu.models.analysis import GraphWeatherAssimilator

    data = np.load(_golden("assimilator_small.npz"))
    (lat_step, lon_step, obs_dim, analysis_dim, node_dim, edge_dim,
     num_blocks, hidden, hid_dec, resolution) = data["__config__"]
    lat_lons = [
        (float(a), float(b))
        for a in np.arange(-90.0, 90.0, lat_step)
        for b in np.arange(0.0, 360.0, lon_step)
    ]
    model = GraphWeatherAssimilator(
        output_lat_lons=lat_lons,
        resolution=int(resolution),
        observation_dim=int(obs_dim),
        analysis_dim=int(analysis_dim),
        node_dim=int(node_dim),
        edge_dim=int(edge_dim),
        num_blocks=int(num_blocks),
        hidden_dim_processor_node=int(hidden),
        hidden_dim_processor_edge=int(hidden),
        hidden_dim_decoder=int(hid_dec),
        latent_graph_order="reference",
    )
    params = convert_assimilator(_sd(data), num_blocks=int(num_blocks))
    n_obs = data["__obs_llh__"].shape[0]
    ref_tree = jax.tree_util.tree_structure(
        model.init(jax.random.PRNGKey(0), num_obs=n_obs)
    )
    assert jax.tree_util.tree_structure(params) == ref_tree

    out = np.asarray(
        model.apply(params, data["__features__"], data["__obs_llh__"])
    )
    expected = data["__output__"].reshape(out.shape)
    per_var_rmse = np.sqrt(((out - expected) ** 2).mean(axis=(0, 1)))
    assert per_var_rmse.max() < 1e-5, per_var_rmse


@pytest.mark.skipif(
    not os.path.exists(_golden("regional_small.npz")),
    reason="golden not generated",
)
def test_regional_matches_torch_reference_golden():
    """RegionalForecaster parity (reference regional_forecast.py:133),
    plain and with boundary nudging."""
    from graph_weather_tpu.convert import convert_regional
    from graph_weather_tpu.models.regional import (
        RegionalForecaster,
        RegionalForecasterConfig,
    )

    data = np.load(_golden("regional_small.npz"))
    (resolution, feature_dim, aux_dim, node_dim, edge_dim, num_blocks,
     hidden, hid_dec, nudging, nudge_hid) = data["__config__"]
    lat_lons = [tuple(p) for p in data["__lat_lons__"]]
    model = RegionalForecaster(
        RegionalForecasterConfig(
            resolution=int(resolution),
            feature_dim=int(feature_dim),
            aux_dim=int(aux_dim),
            node_dim=int(node_dim),
            edge_dim=int(edge_dim),
            num_blocks=int(num_blocks),
            hidden_dim_processor_node=int(hidden),
            hidden_dim_processor_edge=int(hidden),
            hidden_dim_decoder=int(hid_dec),
            enable_nudging=bool(nudging),
            nudging_hidden_dim=int(nudge_hid),
        )
    )
    params = convert_regional(
        _sd(data), num_blocks=int(num_blocks), enable_nudging=bool(nudging)
    )
    ref_tree = jax.tree_util.tree_structure(
        model.init(jax.random.PRNGKey(0), lat_lons)
    )
    assert jax.tree_util.tree_structure(params) == ref_tree

    out = np.asarray(model.apply(params, data["__features__"], lat_lons))
    per_var_rmse = np.sqrt(
        ((out - data["__output__"]) ** 2).mean(axis=(0, 1))
    )
    assert per_var_rmse.max() < 1e-5, per_var_rmse

    out_n = np.asarray(
        model.apply(
            params,
            data["__features__"],
            lat_lons,
            global_context=data["__global_context__"],
        )
    )
    per_var_rmse = np.sqrt(
        ((out_n - data["__output_nudged__"]) ** 2).mean(axis=(0, 1))
    )
    assert per_var_rmse.max() < 1e-5, per_var_rmse


@pytest.mark.skipif(
    not os.path.exists(_golden("fengwu_small.npz")),
    reason="golden not generated",
)
def test_fengwu_ghr_matches_torch_reference_golden():
    """FengWu-GHR parity: MetaModel (reference fengwu_ghr/layers.py:265)
    and WrapperMetaModel (:311, scaled resolution + cross-window res
    attention with base weights grafted in). Integer lat_lons make the
    reference's long-truncated positions exact; both sides build the same
    scipy-kd-tree kNN assignment."""
    from graph_weather_tpu.convert import (
        convert_fengwu_image_meta,
        convert_fengwu_wrapper,
    )
    from graph_weather_tpu.models.fengwu_ghr import MetaModel, WrapperMetaModel

    data = np.load(_golden("fengwu_small.npz"))
    (ih, iw, ph, pw, depth, heads, mlp_dim, channels, dim_head,
     scale) = (int(v) for v in data["__config__"])
    lat_lons = [tuple(map(float, p)) for p in data["__lat_lons__"]]
    model = MetaModel(
        lat_lons,
        image_size=(ih, iw),
        patch_size=(ph, pw),
        depth=depth,
        heads=heads,
        mlp_dim=mlp_dim,
        channels=channels,
        dim_head=dim_head,
    )
    imm_sd = {
        k[len("imm.image_meta_model."):]: data[k]
        for k in data.files
        if k.startswith("imm.image_meta_model.")
    }
    params = jax.tree_util.tree_map(
        np.asarray, convert_fengwu_image_meta(imm_sd, depth)
    )
    ref_tree = jax.tree_util.tree_structure(model.init(jax.random.PRNGKey(0)))
    assert jax.tree_util.tree_structure(params) == ref_tree

    out = np.asarray(model.apply(params, data["__input__"]))
    expected = data["__output__"]
    assert out.shape == expected.shape
    per_var_rmse = np.sqrt(((out - expected) ** 2).mean(axis=(0, 1)))
    assert per_var_rmse.max() < 1e-5, per_var_rmse

    wrapper = WrapperMetaModel(lat_lons, model, scale)
    wrap_sd = {
        k[len("wrap."):]: data[k] for k in data.files if k.startswith("wrap.")
    }
    wparams = jax.tree_util.tree_map(
        np.asarray, convert_fengwu_wrapper(wrap_sd, depth)
    )
    ref_tree = jax.tree_util.tree_structure(
        wrapper.init(jax.random.PRNGKey(0))
    )
    assert jax.tree_util.tree_structure(wparams) == ref_tree

    out_w = np.asarray(wrapper.apply(wparams, data["__input__"]))
    expected_w = data["__output_wrapper__"]
    assert out_w.shape == expected_w.shape
    per_var_rmse = np.sqrt(((out_w - expected_w) ** 2).mean(axis=(0, 1)))
    assert per_var_rmse.max() < 1e-5, per_var_rmse


@pytest.mark.skipif(
    not os.path.exists(_golden("weathermesh_small.npz")),
    reason="golden not generated",
)
def test_weathermesh_matches_torch_reference_golden():
    """WeatherMesh parity (reference weathermesh/weathermesh2.py:68) with
    norm='batch' (inference-mode BatchNorm on converted running stats) and
    the pure-torch natten shim as the reference oracle. Covers encoder
    conv paths + NATTEN layers + per-timestep processors + decoder."""
    from graph_weather_tpu.convert import convert_weathermesh
    from graph_weather_tpu.models.weathermesh import WeatherMesh

    data = np.load(_golden("weathermesh_small.npz"))
    (c2, c3, levels, latent_dim, hidden_dim, ncb, ntl, pnl, n_proc,
     kd, kh, kw, heads, steps) = (int(v) for v in data["__config__"])
    model = WeatherMesh(
        timesteps=list(range(n_proc)),
        surface_channels=c2,
        pressure_channels=c3,
        pressure_levels=levels,
        latent_dim=latent_dim,
        encoder_num_conv_blocks=ncb,
        encoder_num_transformer_layers=ntl,
        encoder_hidden_dim=hidden_dim,
        decoder_num_conv_blocks=ncb,
        decoder_num_transformer_layers=ntl,
        decoder_hidden_dim=hidden_dim,
        processor_num_layers=pnl,
        kernel=(kd, kh, kw),
        num_heads=heads,
        norm="batch",
    )
    sd = {k: data[k] for k in data.files if not k.startswith("__")}
    variables = jax.tree_util.tree_map(
        np.asarray,
        convert_weathermesh(
            sd,
            num_processors=n_proc,
            processor_num_layers=pnl,
            encoder_num_conv_blocks=ncb,
            encoder_num_transformer_layers=ntl,
            decoder_num_conv_blocks=ncb,
            decoder_num_transformer_layers=ntl,
        ),
    )
    # channels-last inputs for our model
    surface = np.transpose(data["__surface__"], (0, 2, 3, 1))
    pressure = np.transpose(data["__pressure__"], (0, 2, 3, 4, 1))

    ref_vars = jax.jit(model.init, static_argnums=3)(
        jax.random.PRNGKey(0), jnp.asarray(surface), jnp.asarray(pressure),
        steps,
    )
    assert jax.tree_util.tree_structure(variables) == (
        jax.tree_util.tree_structure(ref_vars)
    )

    out = jax.jit(model.apply, static_argnums=3)(
        variables, jnp.asarray(surface), jnp.asarray(pressure), steps
    )
    out_surface = np.transpose(np.asarray(out.surface), (0, 3, 1, 2))
    out_pressure = np.transpose(np.asarray(out.pressure), (0, 4, 1, 2, 3))
    exp_s = data["__output_surface__"]
    exp_p = data["__output_pressure__"]
    assert out_surface.shape == exp_s.shape
    assert out_pressure.shape == exp_p.shape
    rmse_s = np.sqrt(((out_surface - exp_s) ** 2).mean(axis=(0, 2, 3)))
    rmse_p = np.sqrt(((out_pressure - exp_p) ** 2).mean(axis=(0, 2, 3, 4)))
    assert rmse_s.max() < 1e-5, rmse_s
    assert rmse_p.max() < 1e-5, rmse_p


SAMPLER_TRAJ_GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "sampler_traj_small.npz"
)


@pytest.mark.skipif(
    not os.path.exists(SAMPLER_TRAJ_GOLDEN), reason="golden not generated"
)
def test_sampler_trajectory_matches_torch_reference_golden():
    """Full multi-step sampler parity (reference models/gencast/sampler.py:
    63-130): replay the reference run's per-step noise draws through
    sample_fn_injected (the SAME trajectory production sample_fn runs) on
    converted weights — checks the DPMSolver++2S math (churn gating, noise
    inflation, sigma schedule, midpoint + final Euler steps), not just a
    single denoiser eval."""
    from graph_weather_tpu.convert import convert_denoiser
    from graph_weather_tpu.models.gencast import Denoiser, Sampler

    data = np.load(SAMPLER_TRAJ_GOLDEN)
    (nlon, nlat, f_in, f_out, hid, n_hidden, num_blocks, num_heads,
     splits, num_hops, use_edges) = data["__config__"]
    num_steps = int(data["__num_steps__"][0])
    den = Denoiser(
        grid_lon=data["__grid_lon__"],
        grid_lat=data["__grid_lat__"],
        input_features_dim=int(f_in),
        output_features_dim=int(f_out),
        hidden_dims=(int(hid),) * int(n_hidden),
        num_blocks=int(num_blocks),
        num_heads=int(num_heads),
        splits=int(splits),
        num_hops=int(num_hops),
        use_edges_features=bool(use_edges),
        mesh_orientation="graphcast",
        node_layout="reference",
    )
    sd = {k: data[k] for k in data.files if not k.startswith("__")}
    params = convert_denoiser(
        sd, num_blocks=int(num_blocks), mlp_hidden_dims=int(n_hidden)
    )

    noises = jnp.asarray(data["__noises__"])[:, None]  # [S, 1, lon, lat, F]
    sampler = Sampler(num_steps=num_steps)
    fn = jax.jit(sampler.sample_fn_injected(den))
    out = np.asarray(
        fn(params, jnp.asarray(data["__prev__"]), noises[0], noises[1:])
    )
    expected = data["__output__"]
    assert out.shape == expected.shape
    rmse = np.sqrt(((out - expected) ** 2).mean())
    assert rmse < 1e-4, rmse


@pytest.mark.skipif(
    not os.path.exists(_golden("constraint_small.npz")),
    reason="golden not generated",
)
def test_constraint_matches_torch_reference_golden():
    """PhysicalConstraintLayer parity (reference models/layers/
    constraint_layer.py:12-188): all three constraint types, graph-format
    inputs at upsampling_factor=1 (the forecaster wiring) and grid-format
    inputs at factor 2 (pooled/kron block path). Deterministic layer —
    exact value comparison."""
    from graph_weather_tpu.nn.constraint import PhysicalConstraintLayer

    data = np.load(_golden("constraint_small.npz"))
    h, w = (int(v) for v in data["__grid_shape__"])
    hr1 = jnp.asarray(data["__hr_graph__"])
    lr1 = jnp.asarray(data["__lr_graph__"])
    hr2 = jnp.asarray(data["__hr_grid__"])
    lr2 = jnp.asarray(data["__lr_grid__"])
    for ctype in ("additive", "multiplicative", "softmax"):
        layer = PhysicalConstraintLayer(
            grid_shape=(h, w), upsampling_factor=1, constraint_type=ctype
        )
        out = np.asarray(layer(hr1, lr1))
        np.testing.assert_allclose(
            out, data[f"f1_{ctype}"], rtol=1e-5, atol=1e-6,
            err_msg=f"f1_{ctype}",
        )
        layer = PhysicalConstraintLayer(
            grid_shape=(h, w), upsampling_factor=2, constraint_type=ctype
        )
        out = np.asarray(layer(hr2, lr2))
        np.testing.assert_allclose(
            out, data[f"f2_{ctype}"], rtol=1e-5, atol=1e-6,
            err_msg=f"f2_{ctype}",
        )


@pytest.mark.parametrize("tag", ["unet", "simple"])
def test_thermalizer_matches_torch_reference_golden(tag):
    """ThermalizerLayer parity (reference models/layers/thermalizer.py:
    20-265) via injected-noise replay: the reference's recorded
    torch.randn draw is fed through the `noise` argument, so the one-step
    denoise (cosine schedule at t=10, AdaptiveUNet score model with +2
    positional channels) must reproduce the torch output exactly.
    Covers both the full UNet path (16x16) and simple_net (4x4)."""
    path = _golden(f"thermalizer_{tag}_small.npz")
    if not os.path.exists(path):
        pytest.skip("golden not generated")
    from graph_weather_tpu.convert import convert_thermalizer
    from graph_weather_tpu.nn.thermalizer import ThermalizerLayer

    data = np.load(path)
    hgt, wid, feats, t = (int(v) for v in data["__meta__"])
    params = convert_thermalizer(dict(data), simple=(tag == "simple"))
    layer = ThermalizerLayer(input_dim=feats, timesteps=1000)
    x = jnp.asarray(data["__input__"])
    # torch noise is [B, C, H, W]; ours is channels-last [B, H, W, C]
    noise = jnp.transpose(jnp.asarray(data["__noise__"]), (0, 2, 3, 1))
    out = layer.apply(
        params, x, t, height=hgt, width=wid, batch=1, noise=noise
    )
    expected = data["__output__"]
    assert out.shape == expected.shape
    rmse = float(np.sqrt(((np.asarray(out) - expected) ** 2).mean()))
    assert rmse < 1e-5, rmse
