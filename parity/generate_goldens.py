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


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/goldens")
    args = p.parse_args()
    generate_forecaster(args.out)
    generate_gencast(args.out)
