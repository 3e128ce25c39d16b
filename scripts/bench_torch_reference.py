"""Time the PyTorch reference GraphWeatherForecaster on CPU (in-image).

The driver's BASELINE.json first target line is "forecast steps/sec at
1 deg >> PyTorch reference"; this script produces the reference side of
that comparison with the ACTUAL reference model (run through
parity/ref_shims like the parity goldens) on the identical quickstart
config the TPU headline metric uses: 1 deg global grid (64,800 nodes),
feature_dim 78 + aux 24, 256-d, 9 blocks, fwd + NormalizedMSELoss.

    python scripts/bench_torch_reference.py [--spacing 1.0 --iters 3]

Reference: graph_weather/models/forecast.py:61 (model),
tests/test_model.py quickstart usage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spacing", type=float, default=1.0)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    args = p.parse_args()

    # The image's torch initializes dynamo trace rules lazily and trips on
    # the shimmed xarray (`xarray.__spec__ is None`) inside opt.step();
    # the eager reference model never needs dynamo.
    os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")

    from parity import ref_shims

    ref_shims.install()
    ref_shims.add_reference_to_path()
    import torch

    # Give the reference every available core (the image defaults to 1).
    torch.set_num_threads(os.cpu_count() or 1)

    from graph_weather import GraphWeatherForecaster
    from graph_weather.models.losses import NormalizedMSELoss

    lats = np.arange(-90.0, 90.0, args.spacing)
    lons = np.arange(0.0, 360.0, args.spacing)
    lat_lons = [(float(a), float(b)) for a in lats for b in lons]
    t0 = time.time()
    model = GraphWeatherForecaster(lat_lons, feature_dim=78, aux_dim=24)
    model.eval()
    build_s = time.time() - t0
    loss_fn = NormalizedMSELoss(
        lat_lons=lat_lons, feature_variance=torch.ones(78), normalize=True
    )

    x = torch.randn(1, len(lat_lons), 102)
    y = torch.randn(1, len(lat_lons), 78)

    with torch.no_grad():
        for _ in range(args.warmup):
            loss_fn(model(x), y)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            loss = loss_fn(model(x), y)
        dt = (time.perf_counter() - t0) / args.iters

    print(
        json.dumps(
            {
                "metric": "torch_reference_fwd_loss_steps_per_sec_1deg",
                "value": round(1.0 / dt, 4),
                "unit": "steps/sec",
                "detail": {
                    "step_ms": round(dt * 1000.0, 1),
                    "grid_nodes": len(lat_lons),
                    "build_s": round(build_s, 1),
                    "threads": torch.get_num_threads(),
                    "device": "cpu (torch, reference impl)",
                    "loss": float(loss),
                },
            }
        )
    )

    # Train step (fwd + bwd + AdamW), the reference-side counterpart of
    # forecast_train_step_ms_1deg.
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    for _ in range(args.warmup):
        opt.zero_grad()
        loss_fn(model(x), y).backward()
        opt.step()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        opt.zero_grad()
        loss = loss_fn(model(x), y)
        loss.backward()
        opt.step()
    dt = (time.perf_counter() - t0) / args.iters
    print(
        json.dumps(
            {
                "metric": "torch_reference_train_step_ms_1deg",
                "value": round(dt * 1000.0, 1),
                "unit": "ms",
                "detail": {
                    "grid_nodes": len(lat_lons),
                    "optimizer": "adamw",
                    "threads": torch.get_num_threads(),
                    "device": "cpu (torch, reference impl)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
