"""Generate golden activations from the PyTorch reference (via ref_shims).

Runs the reference GraphWeatherForecaster on the SAME graphs the TPU
framework builds (the h3 shim is backed by graph_weather_tpu's hex mesh,
so both sides see identical topology) and saves (state_dict, input,
output) to tests/goldens/*.npz. The committed goldens let CI assert
per-variable output parity WITHOUT torch or the reference installed.

The reference net function has one ordering quirk this harness preserves
(see scripts/convert_torch.py docstring): its processor runs on the
latent graph indexed in ascending sorted-cell order while node rows are
REVERSED — the parity test reproduces it by conjugating our latent graph
with the reversal permutation.

Usage:  python parity/generate_goldens.py [--out tests/goldens]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORECASTER_SMALL = dict(
    lat_step=30.0,
    lon_step=30.0,
    feature_dim=4,
    aux_dim=2,
    node_dim=16,
    edge_dim=16,
    num_blocks=2,
    hidden_dim_processor_node=16,
    hidden_dim_processor_edge=16,
    hidden_layers_processor_node=2,
    hidden_layers_processor_edge=2,
    hidden_dim_decoder=8,
    hidden_layers_decoder=2,
)


def generate_forecaster(out_dir: str, cfg=FORECASTER_SMALL) -> str:
    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    from graph_weather import GraphWeatherForecaster as RefForecaster

    torch.manual_seed(0)
    lat_lons = [
        (float(a), float(b))
        for a in np.arange(-90.0, 90.0, cfg["lat_step"])
        for b in np.arange(0.0, 360.0, cfg["lon_step"])
    ]
    model = RefForecaster(
        lat_lons,
        feature_dim=cfg["feature_dim"],
        aux_dim=cfg["aux_dim"],
        node_dim=cfg["node_dim"],
        edge_dim=cfg["edge_dim"],
        num_blocks=cfg["num_blocks"],
        hidden_dim_processor_node=cfg["hidden_dim_processor_node"],
        hidden_dim_processor_edge=cfg["hidden_dim_processor_edge"],
        hidden_layers_processor_node=cfg["hidden_layers_processor_node"],
        hidden_layers_processor_edge=cfg["hidden_layers_processor_edge"],
        hidden_dim_decoder=cfg["hidden_dim_decoder"],
        hidden_layers_decoder=cfg["hidden_layers_decoder"],
    )
    model.eval()
    # Nonzero h3_nodes: the zero-init default would mask gather/order bugs.
    with torch.no_grad():
        for p in [model.encoder.h3_nodes]:
            p.copy_(torch.randn_like(p) * 0.5)

    rng = np.random.default_rng(42)
    x = rng.standard_normal(
        (2, len(lat_lons), cfg["feature_dim"] + cfg["aux_dim"])
    ).astype(np.float32)
    with torch.no_grad():
        y = model(torch.tensor(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "forecaster_small.npz")
    np.savez_compressed(
        path,
        __input__=x,
        __output__=y,
        __config__=np.array(
            [
                cfg["lat_step"], cfg["lon_step"], cfg["feature_dim"],
                cfg["aux_dim"], cfg["node_dim"], cfg["edge_dim"],
                cfg["num_blocks"], cfg["hidden_dim_processor_node"],
                cfg["hidden_dim_processor_edge"], cfg["hidden_dim_decoder"],
            ],
            dtype=np.float64,
        ),
        **sd,
    )
    print(f"wrote {path}: output mean {y.mean():+.6f} std {y.std():.6f}")
    return path


GENCAST_SMALL = dict(
    nlon=32,
    nlat=16,
    input_features_dim=3,
    output_features_dim=2,
    hidden_dims=[16, 16],
    num_blocks=3,
    num_heads=2,
    splits=2,
    num_hops=2,
    use_edges_features=True,
)


def generate_gencast(out_dir: str, cfg=GENCAST_SMALL) -> str:
    """Golden for the GenCast Denoiser (reference gencast/denoiser.py:66).

    Built on the reference's own icosphere geometry; the parity test runs
    our Denoiser with mesh_orientation="graphcast" so both sides' graphs
    are geometrically identical (vertex order may differ — GenCast has no
    per-vertex parameters and is permutation-equivariant over mesh nodes).
    """
    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    from graph_weather.models.gencast.denoiser import Denoiser as RefDenoiser

    torch.manual_seed(0)
    # Deterministic jitter keeps every grid point strictly inside a mesh
    # triangle: exactly-regular grids put points ON triangle edges, where
    # containing-triangle tie-breaking legitimately differs between the
    # two implementations (8/512 points on the 32x16 grid).
    jrng = np.random.default_rng(123)
    grid_lon = np.sort(
        np.arange(0.0, 360.0, 360.0 / cfg["nlon"])
        + jrng.uniform(0.05, 0.45, cfg["nlon"])
    )
    grid_lat = np.sort(
        np.linspace(-89.0, 89.0, cfg["nlat"])
        + jrng.uniform(-0.45, 0.45, cfg["nlat"])
    )
    model = RefDenoiser(
        grid_lon=grid_lon,
        grid_lat=grid_lat,
        input_features_dim=cfg["input_features_dim"],
        output_features_dim=cfg["output_features_dim"],
        hidden_dims=list(cfg["hidden_dims"]),
        num_blocks=cfg["num_blocks"],
        num_heads=cfg["num_heads"],
        splits=cfg["splits"],
        num_hops=cfg["num_hops"],
        use_edges_features=cfg["use_edges_features"],
    )
    model.eval()
    rng = np.random.default_rng(42)
    shape = (2, cfg["nlon"], cfg["nlat"])
    corrupted = rng.standard_normal(
        shape + (cfg["output_features_dim"],)
    ).astype(np.float32)
    prev = rng.standard_normal(
        shape + (2 * cfg["input_features_dim"],)
    ).astype(np.float32)
    noise = np.array([[0.5], [1.5]], dtype=np.float32)
    with torch.no_grad():
        y = model(
            torch.tensor(corrupted), torch.tensor(prev), torch.tensor(noise)
        ).numpy()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "gencast_small.npz")
    np.savez_compressed(
        path,
        __corrupted__=corrupted,
        __prev__=prev,
        __noise__=noise,
        __output__=y,
        __grid_lon__=grid_lon,
        __grid_lat__=grid_lat,
        __config__=np.array(
            [
                cfg["nlon"], cfg["nlat"], cfg["input_features_dim"],
                cfg["output_features_dim"], cfg["hidden_dims"][0],
                len(cfg["hidden_dims"]), cfg["num_blocks"], cfg["num_heads"],
                cfg["splits"], cfg["num_hops"],
                float(cfg["use_edges_features"]),
            ],
            dtype=np.float64,
        ),
        **sd,
    )
    print(f"wrote {path}: output mean {y.mean():+.6f} std {y.std():.6f}")
    return path


def _jittered_grid(nlon, nlat, seed=123):
    """Grid with deterministic jitter (see generate_gencast docstring)."""
    jrng = np.random.default_rng(seed)
    grid_lon = np.sort(
        np.arange(0.0, 360.0, 360.0 / nlon) + jrng.uniform(0.05, 0.45, nlon)
    )
    grid_lat = np.sort(
        np.linspace(-89.0, 89.0, nlat) + jrng.uniform(-0.45, 0.45, nlat)
    )
    return grid_lon, grid_lat


def _state_dict_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


FGN_SMALL = dict(
    nlon=32, nlat=16, input_features_dim=3, output_features_dim=2,
    noise_dimension=8, hidden_dims=[16, 16], num_blocks=3, num_heads=2,
    splits=2, num_hops=2, use_edges_features=True,
)


def generate_fgn(out_dir: str, cfg=FGN_SMALL) -> str:
    """Golden for FGN (reference models/fgn/model.py:60).

    The reference `forward` draws a fresh torch.randn noise vector per
    ensemble member (model.py:336-341); the golden drives the SAME
    internal pipeline (_run_encoder -> _run_processor -> _run_decoder)
    with a FIXED noise vector so the comparison is deterministic.
    """
    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    from graph_weather.models.fgn.model import FunctionalGenerativeNetwork

    torch.manual_seed(0)
    grid_lon, grid_lat = _jittered_grid(cfg["nlon"], cfg["nlat"])
    model = FunctionalGenerativeNetwork(
        grid_lon=grid_lon,
        grid_lat=grid_lat,
        input_features_dim=cfg["input_features_dim"],
        output_features_dim=cfg["output_features_dim"],
        noise_dimension=cfg["noise_dimension"],
        hidden_dims=list(cfg["hidden_dims"]),
        num_blocks=cfg["num_blocks"],
        num_heads=cfg["num_heads"],
        splits=cfg["splits"],
        num_hops=cfg["num_hops"],
        use_edges_features=cfg["use_edges_features"],
    )
    model.eval()
    rng = np.random.default_rng(42)
    prev = rng.standard_normal(
        (2, cfg["nlon"] * cfg["nlat"], cfg["input_features_dim"])
    ).astype(np.float32)
    noise = rng.standard_normal((2, cfg["noise_dimension"])).astype(np.float32)
    with torch.no_grad():
        lg, lm = model._run_encoder(torch.tensor(prev))
        lm = model._run_processor(lm, noise_vectors=torch.tensor(noise))
        y = model._run_decoder(lm, lg).numpy()

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "fgn_small.npz")
    np.savez_compressed(
        path,
        __prev__=prev,
        __noise__=noise,
        __output__=y,
        __grid_lon__=grid_lon,
        __grid_lat__=grid_lat,
        __config__=np.array(
            [
                cfg["nlon"], cfg["nlat"], cfg["input_features_dim"],
                cfg["output_features_dim"], cfg["noise_dimension"],
                cfg["hidden_dims"][0], cfg["num_blocks"], cfg["num_heads"],
                cfg["splits"], cfg["num_hops"],
                float(cfg["use_edges_features"]),
            ],
            dtype=np.float64,
        ),
        **_state_dict_np(model),
    )
    print(f"wrote {path}: output mean {y.mean():+.6f} std {y.std():.6f}")
    return path


GENDA_SMALL = dict(
    nlon=32, nlat=16, input_features_dim=3, output_features_dim=2,
    hidden_dims=[16, 16], num_blocks=3, num_heads=2, splits=2, num_hops=2,
    use_edges_features=True, conditioning_dim=2,
)


def generate_genda(out_dir: str, cfg=GENDA_SMALL) -> str:
    """Golden for GenDA (reference models/genda/model.py:66) with sensor
    conditioning channels active (eval mode: no conditioning dropout)."""
    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    from graph_weather.models.genda.model import GenDA

    torch.manual_seed(0)
    grid_lon, grid_lat = _jittered_grid(cfg["nlon"], cfg["nlat"])
    model = GenDA(
        grid_lon=grid_lon,
        grid_lat=grid_lat,
        input_features_dim=cfg["input_features_dim"],
        output_features_dim=cfg["output_features_dim"],
        hidden_dims=list(cfg["hidden_dims"]),
        num_blocks=cfg["num_blocks"],
        num_heads=cfg["num_heads"],
        splits=cfg["splits"],
        num_hops=cfg["num_hops"],
        use_edges_features=cfg["use_edges_features"],
        conditioning_dim=cfg["conditioning_dim"],
    )
    model.eval()
    rng = np.random.default_rng(42)
    shape = (2, cfg["nlon"], cfg["nlat"])
    corrupted = rng.standard_normal(
        shape + (cfg["output_features_dim"],)
    ).astype(np.float32)
    prev = rng.standard_normal(
        shape + (2 * cfg["input_features_dim"],)
    ).astype(np.float32)
    noise = np.array([[0.5], [1.5]], dtype=np.float32)
    mask = (rng.uniform(size=shape + (1,)) < 0.3).astype(np.float32)
    values = (rng.standard_normal(shape + (1,)) * mask).astype(np.float32)
    with torch.no_grad():
        y = model(
            torch.tensor(corrupted),
            torch.tensor(prev),
            torch.tensor(noise),
            sensor_mask=torch.tensor(mask),
            sensor_values=torch.tensor(values),
        ).numpy()

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "genda_small.npz")
    np.savez_compressed(
        path,
        __corrupted__=corrupted,
        __prev__=prev,
        __noise__=noise,
        __mask__=mask,
        __values__=values,
        __output__=y,
        __grid_lon__=grid_lon,
        __grid_lat__=grid_lat,
        __config__=np.array(
            [
                cfg["nlon"], cfg["nlat"], cfg["input_features_dim"],
                cfg["output_features_dim"], cfg["hidden_dims"][0],
                cfg["num_blocks"], cfg["num_heads"], cfg["splits"],
                cfg["num_hops"], float(cfg["use_edges_features"]),
                cfg["conditioning_dim"],
            ],
            dtype=np.float64,
        ),
        **_state_dict_np(model),
    )
    print(f"wrote {path}: output mean {y.mean():+.6f} std {y.std():.6f}")
    return path


CAFA_SMALL = dict(
    input_channels=3, output_channels=2, model_dim=32, downsampling_factor=2,
    processor_depth=2, num_heads=2, dim_head=16, feedforward_multiplier=4,
    height=17, width=32,
)


def generate_cafa(out_dir: str, cfg=CAFA_SMALL) -> str:
    """Golden for CaFA (reference models/cafa/model.py:10); odd height
    exercises the pad/crop path (model.py:74-93)."""
    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    from graph_weather.models.cafa.model import CaFAForecaster

    torch.manual_seed(0)
    model = CaFAForecaster(
        input_channels=cfg["input_channels"],
        output_channels=cfg["output_channels"],
        model_dim=cfg["model_dim"],
        downsampling_factor=cfg["downsampling_factor"],
        processor_depth=cfg["processor_depth"],
        num_heads=cfg["num_heads"],
        dim_head=cfg["dim_head"],
        feedforward_multiplier=cfg["feedforward_multiplier"],
    )
    model.eval()
    rng = np.random.default_rng(42)
    x = rng.standard_normal(
        (2, cfg["input_channels"], cfg["height"], cfg["width"])
    ).astype(np.float32)
    with torch.no_grad():
        y = model(torch.tensor(x)).numpy()

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "cafa_small.npz")
    np.savez_compressed(
        path,
        __input__=x,
        __output__=y,
        __config__=np.array(
            [
                cfg["input_channels"], cfg["output_channels"], cfg["model_dim"],
                cfg["downsampling_factor"], cfg["processor_depth"],
                cfg["num_heads"], cfg["dim_head"],
                cfg["feedforward_multiplier"],
            ],
            dtype=np.float64,
        ),
        **_state_dict_np(model),
    )
    print(f"wrote {path}: output mean {y.mean():+.6f} std {y.std():.6f}")
    return path


AURORA_SMALL = dict(
    input_features=4, output_features=3, latent_dim=32, num_layers=2,
    num_points=64,
)


def generate_aurora(out_dir: str, cfg=AURORA_SMALL) -> str:
    """Golden for AuroraModel (reference models/aurora/model.py:187),
    masked and unmasked."""
    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    from graph_weather.models.aurora.model import AuroraModel

    torch.manual_seed(0)
    model = AuroraModel(
        input_features=cfg["input_features"],
        output_features=cfg["output_features"],
        latent_dim=cfg["latent_dim"],
        num_layers=cfg["num_layers"],
    )
    model.eval()
    rng = np.random.default_rng(42)
    n = cfg["num_points"]
    points = np.stack(
        [rng.uniform(-180, 180, (2, n)), rng.uniform(-90, 90, (2, n))], axis=-1
    ).astype(np.float32)
    feats = rng.standard_normal((2, n, cfg["input_features"])).astype(np.float32)
    mask = (rng.uniform(size=(2, n)) < 0.8).astype(np.float32)
    with torch.no_grad():
        y = model(torch.tensor(points), torch.tensor(feats)).numpy()
        y_masked = model(
            torch.tensor(points), torch.tensor(feats), mask=torch.tensor(mask)
        ).numpy()

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "aurora_small.npz")
    np.savez_compressed(
        path,
        __points__=points,
        __features__=feats,
        __mask__=mask,
        __output__=y,
        __output_masked__=y_masked,
        __config__=np.array(
            [
                cfg["input_features"], cfg["output_features"],
                cfg["latent_dim"], cfg["num_layers"],
            ],
            dtype=np.float64,
        ),
        **_state_dict_np(model),
    )
    print(f"wrote {path}: output mean {y.mean():+.6f} std {y.std():.6f}")
    return path


ASSIM_SMALL = dict(
    lat_step=30.0, lon_step=45.0, observation_dim=2, analysis_dim=4,
    node_dim=16, edge_dim=16, num_blocks=2, hidden=16, hidden_dim_decoder=8,
    num_obs=32, resolution=2,
)


def generate_assimilator(out_dir: str, cfg=ASSIM_SMALL) -> str:
    """Golden for GraphWeatherAssimilator (reference models/analysis.py:52).

    Obs positions are random (seeded); the h3 shim's latlng_to_cell is the
    same Voronoi nearest-center assignment our on-device argmax computes,
    so both sides build the identical obs->mesh graph.
    """
    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    from graph_weather.models.analysis import GraphWeatherAssimilator

    torch.manual_seed(0)
    lat_lons = [
        (float(a), float(b))
        for a in np.arange(-90.0, 90.0, cfg["lat_step"])
        for b in np.arange(0.0, 360.0, cfg["lon_step"])
    ]
    model = GraphWeatherAssimilator(
        output_lat_lons=lat_lons,
        resolution=cfg["resolution"],
        observation_dim=cfg["observation_dim"],
        analysis_dim=cfg["analysis_dim"],
        node_dim=cfg["node_dim"],
        edge_dim=cfg["edge_dim"],
        num_blocks=cfg["num_blocks"],
        hidden_dim_processor_node=cfg["hidden"],
        hidden_dim_processor_edge=cfg["hidden"],
        hidden_dim_decoder=cfg["hidden_dim_decoder"],
    )
    model.eval()
    rng = np.random.default_rng(42)
    n_obs = cfg["num_obs"]
    obs_llh = np.stack(
        [
            rng.uniform(-85.0, 85.0, n_obs),
            rng.uniform(0.0, 360.0, n_obs),
            rng.uniform(0.0, 5000.0, n_obs),
        ],
        axis=-1,
    ).astype(np.float32)
    feats = rng.standard_normal((1, n_obs, cfg["observation_dim"])).astype(
        np.float32
    )
    with torch.no_grad():
        y = model(torch.tensor(feats), torch.tensor(obs_llh)).numpy()

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "assimilator_small.npz")
    np.savez_compressed(
        path,
        __features__=feats,
        __obs_llh__=obs_llh,
        __output__=y,
        __config__=np.array(
            [
                cfg["lat_step"], cfg["lon_step"], cfg["observation_dim"],
                cfg["analysis_dim"], cfg["node_dim"], cfg["edge_dim"],
                cfg["num_blocks"], cfg["hidden"], cfg["hidden_dim_decoder"],
                cfg["resolution"],
            ],
            dtype=np.float64,
        ),
        **_state_dict_np(model),
    )
    print(f"wrote {path}: output shape {y.shape} mean {y.mean():+.6f}")
    return path


REGIONAL_SMALL = dict(
    resolution=2, feature_dim=3, aux_dim=1, node_dim=16, edge_dim=16,
    num_blocks=2, hidden=16, hidden_dim_decoder=8, enable_nudging=True,
    nudging_hidden_dim=8,
)


def generate_regional(out_dir: str, cfg=REGIONAL_SMALL) -> str:
    """Golden for RegionalForecaster (reference regional_forecast.py:133)
    with boundary nudging enabled (global_context supplied)."""
    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    from graph_weather.models.regional_forecast import (
        RegionalForecaster,
        RegionalForecasterConfig,
    )

    torch.manual_seed(0)
    # A regional patch over Europe (jittered so no point sits on a cell
    # boundary).
    jrng = np.random.default_rng(7)
    lat_lons = [
        (float(a + jrng.uniform(0.05, 0.4)), float(b + jrng.uniform(0.05, 0.4)))
        for a in np.arange(35.0, 65.0, 5.0)
        for b in np.arange(0.0, 30.0, 5.0)
    ]
    model = RegionalForecaster(
        RegionalForecasterConfig(
            resolution=cfg["resolution"],
            feature_dim=cfg["feature_dim"],
            aux_dim=cfg["aux_dim"],
            node_dim=cfg["node_dim"],
            edge_dim=cfg["edge_dim"],
            num_blocks=cfg["num_blocks"],
            hidden_dim_processor_node=cfg["hidden"],
            hidden_dim_processor_edge=cfg["hidden"],
            hidden_dim_decoder=cfg["hidden_dim_decoder"],
            enable_nudging=cfg["enable_nudging"],
            nudging_hidden_dim=cfg["nudging_hidden_dim"],
        )
    )
    model.eval()
    # Nonzero embeddings: zero-init would mask gather/order bugs.
    with torch.no_grad():
        model.h3_embeddings.copy_(torch.randn_like(model.h3_embeddings) * 0.5)
    rng = np.random.default_rng(42)
    feats = rng.standard_normal(
        (2, len(lat_lons), cfg["feature_dim"] + cfg["aux_dim"])
    ).astype(np.float32)
    glob = rng.standard_normal(
        (2, len(lat_lons), cfg["feature_dim"])
    ).astype(np.float32)
    with torch.no_grad():
        y = model(torch.tensor(feats), lat_lons).numpy()
        y_nudged = model(
            torch.tensor(feats), lat_lons, global_context=torch.tensor(glob)
        ).numpy()

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "regional_small.npz")
    np.savez_compressed(
        path,
        __features__=feats,
        __global_context__=glob,
        __lat_lons__=np.asarray(lat_lons, dtype=np.float64),
        __output__=y,
        __output_nudged__=y_nudged,
        __config__=np.array(
            [
                cfg["resolution"], cfg["feature_dim"], cfg["aux_dim"],
                cfg["node_dim"], cfg["edge_dim"], cfg["num_blocks"],
                cfg["hidden"], cfg["hidden_dim_decoder"],
                float(cfg["enable_nudging"]), cfg["nudging_hidden_dim"],
            ],
            dtype=np.float64,
        ),
        **_state_dict_np(model),
    )
    print(f"wrote {path}: output mean {y.mean():+.6f} std {y.std():.6f}")
    return path


GRAPHCAST_SMALL = dict(
    lat_step=30.0,
    lon_step=30.0,
    input_dim=4,
    output_dim=4,
    hidden_dim=16,
    num_processor_blocks=2,
    hidden_layers=2,
)


def generate_graphcast(out_dir: str, cfg=GRAPHCAST_SMALL) -> str:
    """Golden for GraphCast (reference models/graphcast/model.py:21) —
    same encode-process-decode stack as the forecaster but with a uniform
    hidden dim and the hierarchical-checkpointing handle. Checkpointing is
    numerically transparent, so one golden covers all presets."""
    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    from graph_weather.models.graphcast import GraphCast as RefGraphCast

    torch.manual_seed(0)
    lat_lons = [
        (float(a), float(b))
        for a in np.arange(-90.0, 90.0, cfg["lat_step"])
        for b in np.arange(0.0, 360.0, cfg["lon_step"])
    ]
    model = RefGraphCast(
        lat_lons,
        input_dim=cfg["input_dim"],
        output_dim=cfg["output_dim"],
        hidden_dim=cfg["hidden_dim"],
        num_processor_blocks=cfg["num_processor_blocks"],
        hidden_layers=cfg["hidden_layers"],
    )
    model.eval()
    # Nonzero h3_nodes: the zero-init default would mask gather/order bugs.
    with torch.no_grad():
        model.encoder.h3_nodes.copy_(
            torch.randn_like(model.encoder.h3_nodes) * 0.5
        )

    rng = np.random.default_rng(42)
    x = rng.standard_normal(
        (2, len(lat_lons), cfg["input_dim"])
    ).astype(np.float32)
    with torch.no_grad():
        y = model(torch.tensor(x)).numpy()

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "graphcast_small.npz")
    np.savez_compressed(
        path,
        __input__=x,
        __output__=y,
        __config__=np.array(
            [
                cfg["lat_step"], cfg["lon_step"], cfg["input_dim"],
                cfg["output_dim"], cfg["hidden_dim"],
                cfg["num_processor_blocks"], cfg["hidden_layers"],
            ],
            dtype=np.float64,
        ),
        **_state_dict_np(model),
    )
    print(f"wrote {path}: output mean {y.mean():+.6f} std {y.std():.6f}")
    return path


FENGWU_SMALL = dict(
    image_size=(8, 16),
    patch_size=(2, 2),
    depth=2,
    heads=2,
    mlp_dim=24,
    channels=3,
    dim_head=8,
    scale_factor=2,
)


def generate_fengwu(out_dir: str, cfg=FENGWU_SMALL) -> str:
    """Goldens for FengWu-GHR MetaModel (reference fengwu_ghr/layers.py:265)
    and WrapperMetaModel (:311). lat_lons are integer-valued because the
    reference truncates positions to torch.long (layers.py:281); both sides
    then build identical scipy-kd-tree kNN assignments."""
    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    from graph_weather.models.fengwu_ghr.layers import (
        MetaModel as RefMetaModel,
        WrapperMetaModel as RefWrapperMetaModel,
    )

    torch.manual_seed(0)
    lat_lons = [
        (float(a), float(b))
        for a in range(-90, 90, 15)
        for b in range(0, 360, 15)
    ]
    model = RefMetaModel(
        lat_lons,
        image_size=cfg["image_size"],
        patch_size=cfg["patch_size"],
        depth=cfg["depth"],
        heads=cfg["heads"],
        mlp_dim=cfg["mlp_dim"],
        channels=cfg["channels"],
        dim_head=cfg["dim_head"],
    )
    model.eval()
    rng = np.random.default_rng(42)
    x = rng.standard_normal(
        (2, len(lat_lons), cfg["channels"])
    ).astype(np.float32)
    with torch.no_grad():
        y = model(torch.tensor(x)).numpy()

    wrapper = RefWrapperMetaModel(lat_lons, model, cfg["scale_factor"])
    wrapper.eval()
    with torch.no_grad():
        y_wrap = wrapper(torch.tensor(x)).numpy()

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "fengwu_small.npz")
    np.savez_compressed(
        path,
        __input__=x,
        __output__=y,
        __output_wrapper__=y_wrap,
        __lat_lons__=np.asarray(lat_lons, dtype=np.float64),
        __config__=np.array(
            [
                cfg["image_size"][0], cfg["image_size"][1],
                cfg["patch_size"][0], cfg["patch_size"][1],
                cfg["depth"], cfg["heads"], cfg["mlp_dim"],
                cfg["channels"], cfg["dim_head"], cfg["scale_factor"],
            ],
            dtype=np.float64,
        ),
        **{f"imm.{k}": v for k, v in _state_dict_np(model).items()},
        **{f"wrap.{k}": v for k, v in _state_dict_np(wrapper).items()},
    )
    print(f"wrote {path}: output mean {y.mean():+.6f} std {y.std():.6f}")
    return path


WEATHERMESH_SMALL = dict(
    surface_channels=3,
    pressure_channels=2,
    pressure_levels=3,
    latent_dim=8,
    hidden_dim=4,
    num_conv_blocks=2,
    num_transformer_layers=1,
    processor_num_layers=2,
    num_processors=2,
    kernel=(3, 3, 3),
    num_heads=2,
    hw=16,
    forecast_steps=1,
)


def generate_weathermesh(out_dir: str, cfg=WEATHERMESH_SMALL) -> str:
    """Golden for WeatherMesh (reference weathermesh/weathermesh2.py:68).

    natten comes from the pure-torch shim (ref_shims._make_natten, NATTEN
    clamped-window + rpb semantics). BatchNorm running stats are warmed
    with a few train-mode forwards so the eval-mode stats are nontrivial;
    rpb params are randomized (zero-init would mask the bias path). The
    reference keeps processors in a plain Python list, so their params are
    saved under synthetic 'processors.{p}.' keys."""
    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    from graph_weather.models.weathermesh.weathermesh2 import (
        WeatherMesh as RefWeatherMesh,
    )

    torch.manual_seed(0)
    timesteps = list(range(cfg["num_processors"]))
    model = RefWeatherMesh(
        encoder=None,
        processors=None,
        decoder=None,
        timesteps=timesteps,
        surface_channels=cfg["surface_channels"],
        pressure_channels=cfg["pressure_channels"],
        pressure_levels=cfg["pressure_levels"],
        latent_dim=cfg["latent_dim"],
        encoder_num_conv_blocks=cfg["num_conv_blocks"],
        encoder_num_transformer_layers=cfg["num_transformer_layers"],
        encoder_hidden_dim=cfg["hidden_dim"],
        decoder_num_conv_blocks=cfg["num_conv_blocks"],
        decoder_num_transformer_layers=cfg["num_transformer_layers"],
        decoder_hidden_dim=cfg["hidden_dim"],
        processor_num_layers=cfg["processor_num_layers"],
        kernel=cfg["kernel"],
        num_heads=cfg["num_heads"],
    )
    # Randomize every rpb (zero-init would make the bias path untested).
    with torch.no_grad():
        for mod in [model.encoder, model.decoder, *model.processors]:
            for name, p in mod.named_parameters():
                if name.endswith("rpb"):
                    p.copy_(torch.randn_like(p) * 0.1)

    hw = cfg["hw"]
    rng = np.random.default_rng(42)
    surface = rng.standard_normal(
        (2, cfg["surface_channels"], hw, hw)
    ).astype(np.float32)
    pressure = rng.standard_normal(
        (2, cfg["pressure_channels"], cfg["pressure_levels"], hw, hw)
    ).astype(np.float32)

    # Warm BatchNorm running stats away from (0, 1).
    model.train()
    with torch.no_grad():
        for i in range(3):
            r = np.random.default_rng(100 + i)
            model(
                torch.tensor(
                    (r.standard_normal(surface.shape) * 1.5 + 0.3).astype(
                        np.float32
                    )
                ),
                torch.tensor(
                    (r.standard_normal(pressure.shape) * 0.8 - 0.2).astype(
                        np.float32
                    )
                ),
                forecast_steps=1,
            )
    model.eval()
    with torch.no_grad():
        out = model(
            torch.tensor(surface),
            torch.tensor(pressure),
            forecast_steps=cfg["forecast_steps"],
        )
    y_surface = out.surface.numpy()
    y_pressure = out.pressure.numpy()

    sd = _state_dict_np(model)
    for p_i, proc in enumerate(model.processors):
        for k, v in proc.state_dict().items():
            sd[f"processors.{p_i}.{k}"] = v.detach().numpy()

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "weathermesh_small.npz")
    np.savez_compressed(
        path,
        __surface__=surface,
        __pressure__=pressure,
        __output_surface__=y_surface,
        __output_pressure__=y_pressure,
        __config__=np.array(
            [
                cfg["surface_channels"], cfg["pressure_channels"],
                cfg["pressure_levels"], cfg["latent_dim"], cfg["hidden_dim"],
                cfg["num_conv_blocks"], cfg["num_transformer_layers"],
                cfg["processor_num_layers"], cfg["num_processors"],
                cfg["kernel"][0], cfg["kernel"][1], cfg["kernel"][2],
                cfg["num_heads"], cfg["forecast_steps"],
            ],
            dtype=np.float64,
        ),
        **sd,
    )
    print(
        f"wrote {path}: surface mean {y_surface.mean():+.6f} "
        f"std {y_surface.std():.6f}"
    )
    return path


def generate_sampler_traj(out_dir: str, cfg=GENCAST_SMALL, num_steps=8) -> str:
    """Trajectory golden for the full DPMSolver++2S sampler (reference
    models/gencast/sampler.py:63-130): run the reference Sampler.sample on
    the reference Denoiser with the per-step isotropic noise draws RECORDED
    (monkeypatched generator), so the JAX sampler can replay the identical
    noise through sample_fn_injected and match the multi-step output."""
    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    from graph_weather.models.gencast.denoiser import Denoiser as RefDenoiser
    from graph_weather.models.gencast import sampler as ref_sampler_mod

    torch.manual_seed(0)
    jrng = np.random.default_rng(123)
    grid_lon = np.sort(
        np.arange(0.0, 360.0, 360.0 / cfg["nlon"])
        + jrng.uniform(0.05, 0.45, cfg["nlon"])
    )
    grid_lat = np.sort(
        np.linspace(-89.0, 89.0, cfg["nlat"])
        + jrng.uniform(-0.45, 0.45, cfg["nlat"])
    )
    model = RefDenoiser(
        grid_lon=grid_lon,
        grid_lat=grid_lat,
        input_features_dim=cfg["input_features_dim"],
        output_features_dim=cfg["output_features_dim"],
        hidden_dims=list(cfg["hidden_dims"]),
        num_blocks=cfg["num_blocks"],
        num_heads=cfg["num_heads"],
        splits=cfg["splits"],
        num_hops=cfg["num_hops"],
        use_edges_features=cfg["use_edges_features"],
    )
    model.eval()

    # Pre-draw every per-step noise (flat normal; the isotropy of the
    # draws is irrelevant to SOLVER parity) and replay them in order.
    rng = np.random.default_rng(7)
    draws = [
        rng.standard_normal(
            (cfg["nlon"], cfg["nlat"], cfg["output_features_dim"])
        ).astype(np.float32)
        for _ in range(num_steps)
    ]
    it = iter(list(draws))
    orig = ref_sampler_mod.generate_isotropic_noise
    ref_sampler_mod.generate_isotropic_noise = (
        lambda num_lon, num_lat, num_samples=1, **kw: next(it)
    )
    try:
        sampler = ref_sampler_mod.Sampler(num_steps=num_steps)
        prev = rng.standard_normal(
            (1, cfg["nlon"], cfg["nlat"], 2 * cfg["input_features_dim"])
        ).astype(np.float32)
        with torch.no_grad():
            out = sampler.sample(model, torch.tensor(prev)).numpy()
    finally:
        ref_sampler_mod.generate_isotropic_noise = orig

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "sampler_traj_small.npz")
    np.savez_compressed(
        path,
        __prev__=prev,
        __noises__=np.stack(draws),
        __output__=out,
        __num_steps__=np.array([num_steps]),
        __grid_lon__=grid_lon,
        __grid_lat__=grid_lat,
        __config__=np.array(
            [
                cfg["nlon"], cfg["nlat"], cfg["input_features_dim"],
                cfg["output_features_dim"], cfg["hidden_dims"][0],
                len(cfg["hidden_dims"]), cfg["num_blocks"], cfg["num_heads"],
                cfg["splits"], cfg["num_hops"],
                float(cfg["use_edges_features"]),
            ],
            dtype=np.float64,
        ),
        **sd,
    )
    print(f"wrote {path}: sample mean {out.mean():+.6f} std {out.std():.6f}")
    return path


def generate_constraint(out_dir: str) -> str:
    """Golden for PhysicalConstraintLayer (reference models/layers/
    constraint_layer.py:12-188). Deterministic — no weights. Covers:
    all three constraint types with graph-format inputs at
    upsampling_factor=1 (exactly the GraphWeatherForecaster wiring,
    reference forecast.py:169-176,234-247) and grid-format inputs at
    upsampling_factor=2 (the pooled/kron block path)."""
    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    from graph_weather.models.layers.constraint_layer import (
        PhysicalConstraintLayer as RefConstraint,
    )

    class _Shim:
        """Row-major grid <-> graph mapping (the reference forecaster's
        node_to_grid enumerates lat-major rows, forecast.py:194-214)."""

        def __init__(self, grid_shape):
            self.grid_shape = grid_shape

        def graph_to_grid(self, g):
            b, n, c = g.shape
            h, w = self.grid_shape
            if n == h * w:
                return g.reshape(b, h, w, c).permute(0, 3, 1, 2)
            # low-res graph: infer (h/f, w/f) with the same aspect
            f = int(round((h * w / n) ** 0.5))
            return g.reshape(b, h // f, w // f, c).permute(0, 3, 1, 2)

        def grid_to_graph(self, t):
            b, c, h, w = t.shape
            return t.permute(0, 2, 3, 1).reshape(b, h * w, c)

    rng = np.random.default_rng(7)
    h, w, c, b = 6, 8, 3, 2
    out: dict = {}
    # factor 1, graph format (forecaster wiring)
    hr1 = rng.standard_normal((b, h * w, c)).astype(np.float32)
    lr1 = rng.standard_normal((b, h * w, c)).astype(np.float32)
    shim = _Shim((h, w))
    for ctype in ("additive", "multiplicative", "softmax"):
        layer = RefConstraint(
            shim, (h, w), upsampling_factor=1, constraint_type=ctype
        )
        with torch.no_grad():
            y = layer(torch.tensor(hr1), torch.tensor(lr1))
        out[f"f1_{ctype}"] = y.numpy()
    # factor 2, grid format (block pooling / kron expansion)
    hr2 = rng.standard_normal((b, c, h, w)).astype(np.float32)
    lr2 = rng.standard_normal((b, c, h // 2, w // 2)).astype(np.float32)
    for ctype in ("additive", "multiplicative", "softmax"):
        layer = RefConstraint(
            shim, (h, w), upsampling_factor=2, constraint_type=ctype
        )
        with torch.no_grad():
            y = layer(torch.tensor(hr2), torch.tensor(lr2))
        out[f"f2_{ctype}"] = y.numpy()

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "constraint_small.npz")
    np.savez_compressed(
        path,
        __hr_graph__=hr1, __lr_graph__=lr1,
        __hr_grid__=hr2, __lr_grid__=lr2,
        __grid_shape__=np.array([h, w]),
        **out,
    )
    print(f"wrote {path}: {sorted(out)}")
    return path


def generate_thermalizer(out_dir: str) -> str:
    """Golden for ThermalizerLayer (reference models/layers/
    thermalizer.py:20-265) via injected-noise replay: the reference's
    torch.randn_like draw is recorded (monkeypatched) and saved so the
    JAX side can replay the exact same diffusion noise. Two cases:
    16x16 (full UNet path) and 4x4 (simple_net path)."""
    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    from graph_weather.models.layers.thermalizer import (
        ThermalizerLayer as RefThermalizer,
    )

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for tag, (hgt, wid) in (("unet", (16, 16)), ("simple", (4, 4))):
        torch.manual_seed(0)
        feats = 8
        layer = RefThermalizer(input_dim=feats, timesteps=1000)
        layer.eval()
        rng = np.random.default_rng(11)
        x = rng.standard_normal((hgt * wid, feats)).astype(np.float32)
        noise = rng.standard_normal((1, feats, hgt, wid)).astype(np.float32)

        real_randn_like = torch.randn_like

        def fake_randn_like(t, noise=noise):
            assert tuple(t.shape) == noise.shape, (t.shape, noise.shape)
            return torch.tensor(noise)

        torch.randn_like = fake_randn_like
        try:
            with torch.no_grad():
                y = layer(
                    torch.tensor(x), t=10, height=hgt, width=wid, batch=1
                )
        finally:
            torch.randn_like = real_randn_like

        sd = _state_dict_np(layer)
        path = os.path.join(out_dir, f"thermalizer_{tag}_small.npz")
        np.savez_compressed(
            path,
            __input__=x,
            __noise__=noise,
            __output__=y.numpy(),
            __meta__=np.array([hgt, wid, feats, 10]),
            **sd,
        )
        print(
            f"wrote {path}: out mean {y.numpy().mean():+.6f} "
            f"std {y.numpy().std():.6f}"
        )
        paths.append(path)
    return paths[0]


GENERATORS = {
    "forecaster": generate_forecaster,
    "graphcast": generate_graphcast,
    "fengwu_ghr": generate_fengwu,
    "weathermesh": generate_weathermesh,
    "gencast": generate_gencast,
    "sampler_traj": generate_sampler_traj,
    "fgn": generate_fgn,
    "genda": generate_genda,
    "cafa": generate_cafa,
    "aurora": generate_aurora,
    "assimilator": generate_assimilator,
    "regional": generate_regional,
    "constraint": generate_constraint,
    "thermalizer": generate_thermalizer,
}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/goldens")
    p.add_argument(
        "--only", default=None, help="comma-separated generator names"
    )
    args = p.parse_args()
    names = args.only.split(",") if args.only else list(GENERATORS)
    for name in names:
        GENERATORS[name](args.out)
