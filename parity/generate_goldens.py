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


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/goldens")
    args = p.parse_args()
    generate_forecaster(args.out)
