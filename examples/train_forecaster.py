"""Train GraphWeatherForecaster (analogue of reference train/run.py and
train/pl_graph_weather.py, unified on the framework Trainer).

Runs out of the box on synthetic data; point `--store` at a zarr analysis
store for real data (requires optional xarray/zarr).

    python examples/train_forecaster.py --steps 200 --spacing 5.0
"""

from __future__ import annotations

import argparse
import os
import sys

# Allow `python examples/<name>.py` from an uninstalled checkout: the
# interpreter puts examples/ (the script dir) on sys.path, not the repo
# root, so add the parent directory when the package isn't installed.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import logging

import jax
import numpy as np

from graph_weather_tpu import GraphWeatherForecaster, NormalizedMSELoss
from graph_weather_tpu.data import AnalysisDataset, FieldStore
from graph_weather_tpu.train import Trainer, TrainerConfig


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--store", default=None, help="zarr path (default: synthetic)")
    parser.add_argument("--spacing", type=float, default=5.0)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--shard", action="store_true", help="DP+FSDP over all devices")
    parser.add_argument(
        "--multihost", action="store_true",
        help="jax.distributed.initialize (run the same script on every host)",
    )
    parser.add_argument("--wandb", default=None, metavar="PROJECT",
                        help="log metrics to this wandb project")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    if args.store:
        store = FieldStore.from_zarr(args.store)
    else:
        nlon = int(360 / args.spacing)
        nlat = int(180 / args.spacing)
        store = FieldStore.synthetic(
            num_times=64, num_lon=nlon, num_lat=nlat,
            atmospheric=(), single=("2m_temperature", "10m_u_component_of_wind"),
            static=(),
        )
    ds = AnalysisDataset(store, features=["2m_temperature", "10m_u_component_of_wind"])
    feature_dim = 2
    aux_dim = ds[0][0].shape[-1] - feature_dim
    lat_lons = [tuple(p) for p in ds.lat_lons]

    model = GraphWeatherForecaster(
        lat_lons, feature_dim=feature_dim, aux_dim=aux_dim
    )
    params = model.init(jax.random.PRNGKey(0))
    loss = NormalizedMSELoss(np.ones(feature_dim), lat_lons, normalize=True)

    def batches():
        while True:
            for start in range(0, len(ds) - args.batch, args.batch):
                xs, ys = zip(*(ds[start + i] for i in range(args.batch)))
                yield np.stack(xs), np.stack(ys)

    metrics_hook = None
    if args.wandb:
        from graph_weather_tpu.train.wandb_hook import make_wandb_hook

        metrics_hook = make_wandb_hook(
            project=args.wandb,
            config={"spacing": args.spacing, "batch": args.batch, "lr": args.lr},
        )

    trainer = Trainer(
        model.forward_fn(),
        loss,
        TrainerConfig(
            peak_lr=args.lr,
            warmup_steps=min(100, args.steps // 10 + 1),
            total_steps=args.steps,
            bf16_compute=args.bf16,
            checkpoint_dir=args.ckpt,
            log_every=10,
            shard=args.shard,
            multihost=args.multihost,
        ),
        metrics_hook=metrics_hook,
    )
    trainer.fit(params, batches(), num_steps=args.steps)


if __name__ == "__main__":
    main()
