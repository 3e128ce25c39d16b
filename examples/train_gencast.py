"""Train the GenCast denoiser (analogue of reference models/gencast/train.py:
AdamW wd=0.1 betas 0.9/0.95, cosine schedule with 1k warmup, periodic
sampling at epoch boundaries).

Runs on synthetic data by default; point --store at an ERA5 zarr for real
training.

    python examples/train_gencast.py --steps 100
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
import jax.numpy as jnp
import numpy as np

from graph_weather_tpu.data import FieldStore, GenCastDataset
from graph_weather_tpu.models.gencast import Denoiser, Sampler, WeightedMSELoss
from graph_weather_tpu.train import Trainer, TrainerConfig

ATMOSPHERIC = ["temperature"]
SINGLE = ["2m_temperature"]
STATIC = ["land_sea_mask"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--store", default=None)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--hidden", type=int, default=64)
    parser.add_argument("--blocks", type=int, default=4)
    parser.add_argument("--splits", type=int, default=3)
    parser.add_argument("--hops", type=int, default=3)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--sample-every", type=int, default=0)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    store = (
        FieldStore.from_zarr(args.store)
        if args.store
        else FieldStore.synthetic(
            num_times=32, num_lon=64, num_lat=32,
            atmospheric=tuple(ATMOSPHERIC), single=tuple(SINGLE),
            static=tuple(STATIC),
        )
    )
    ds = GenCastDataset(store, ATMOSPHERIC, SINGLE, STATIC, max_year=2100)

    denoiser = Denoiser(
        ds.grid_lon, ds.grid_lat,
        input_features_dim=ds.input_features_dim,
        output_features_dim=ds.output_features_dim,
        hidden_dims=(args.hidden, args.hidden),
        num_blocks=args.blocks, num_heads=4,
        splits=args.splits, num_hops=args.hops,
        # Fastest processor backend (clustered flash: dense masked
        # attention of each compact receiver block against its gathered
        # neighbor union); drops per-edge features like the reference's
        # sparse mode. Use the default attention_impl="segment" if you
        # need edge features.
        use_edges_features=False,
        attention_impl="clustered_flash",
    )
    params = denoiser.init(jax.random.PRNGKey(0))
    loss = WeightedMSELoss(
        grid_lat=ds.grid_lat,
        pressure_levels=ds.pressure_levels,
        num_atmospheric_features=len(ATMOSPHERIC),
        single_features_weights=np.full(len(SINGLE), 0.1, np.float32),
    )
    fwd = denoiser.forward_fn()

    def forward(p, corrupted, prev, noise):
        return fwd(p, corrupted, prev, noise)

    def loss_fn(pred, pack):
        noise, residuals = pack
        return loss(pred, noise, residuals)

    def batches():
        while True:
            for start in range(0, len(ds) - args.batch, args.batch):
                c, pv, n, r = zip(*(ds[start + i] for i in range(args.batch)))
                c, pv, n, r = map(np.stack, (c, pv, n, r))
                yield c, pv, n, (n, r)

    trainer = Trainer(
        forward,
        loss_fn,
        TrainerConfig(
            peak_lr=1e-3, warmup_steps=min(1000, args.steps // 10 + 1),
            total_steps=args.steps, weight_decay=0.1, b1=0.9, b2=0.95,
            checkpoint_dir=args.ckpt, log_every=10,
        ),
    )
    params, _, _ = trainer.fit(params, batches(), num_steps=args.steps)

    if args.sample_every:
        sample = Sampler(num_steps=20).sample(
            denoiser, params, jnp.asarray(ds[0][1][None]), key=jax.random.PRNGKey(0)
        )
        print("sample stats:", float(sample.mean()), float(sample.std()))


if __name__ == "__main__":
    main()
