"""Train FengWu-GHR (MetaModel) on ERA5/IFS-style analyses, with optional
LoRA fine-tuning of extra rollout steps.

Analogue of reference train/era5.py (FengWu-GHR MetaModel on ARCO-ERA5,
Lightning 16-mixed, NaN-skip) and train/lora.py (base model + one
LoRAModule per extra rollout step, trained jointly on t..t+k), unified on
the framework Trainer + nn/lora.py functional LoRA.

Runs out of the box on synthetic data; point `--store` at a zarr analysis
store for real data (requires optional xarray/zarr).

    python examples/train_fengwu_ghr.py --steps 100
    python examples/train_fengwu_ghr.py --steps 100 --lora-steps 2 --lora-iters 50
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

from graph_weather_tpu.data import FieldStore
from graph_weather_tpu.data.ifs_dataloader import IFSAnalysisDataset
from graph_weather_tpu.models.fengwu_ghr import MetaModel
from graph_weather_tpu.nn.lora import lora_init, lora_merge
from graph_weather_tpu.train import Trainer, TrainerConfig, make_optimizer

log = logging.getLogger("fengwu_ghr")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--store", default=None, help="zarr path (default: synthetic)")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--image-size", type=int, nargs=2, default=(16, 32))
    parser.add_argument("--patch-size", type=int, nargs=2, default=(4, 4))
    parser.add_argument("--depth", type=int, default=4)
    parser.add_argument("--heads", type=int, default=4)
    parser.add_argument("--mlp-dim", type=int, default=128)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument(
        "--lora-steps", type=int, default=0,
        help="after base training, fine-tune a LoRA adapter per extra "
        "autoregressive step (reference train/lora.py)",
    )
    parser.add_argument("--lora-rank", type=int, default=4)
    parser.add_argument("--lora-iters", type=int, default=50)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    if args.store:
        store = FieldStore.from_zarr(args.store)
    else:
        store = FieldStore.synthetic(
            num_times=48, num_lon=32, num_lat=16,
            atmospheric=("temperature",), levels=(500.0, 850.0),
            single=("2m_temperature",), static=(),
        )
    features = ["temperature", "2m_temperature"]
    ds = IFSAnalysisDataset(
        store, features=features, start_year=2016, end_year=2022,
        mean={f: 0.0 for f in features}, std={f: 1.0 for f in features},
    )
    x0, _ = ds[0]
    channels = x0.shape[-1]
    # IFSAnalysisDataset flattens (longitude, latitude) lon-major.
    lat_lons = [
        (float(la), float(lo))
        for lo in store.coords["longitude"]
        for la in store.coords["latitude"]
    ]

    model = MetaModel(
        lat_lons,
        image_size=tuple(args.image_size),
        patch_size=tuple(args.patch_size),
        depth=args.depth,
        heads=args.heads,
        mlp_dim=args.mlp_dim,
        channels=channels,
    )
    params = model.init(jax.random.PRNGKey(0))
    fwd = model.forward_fn()

    def loss(pred, target):
        return jnp.mean((pred - target) ** 2)

    def batches():
        while True:
            for start in range(0, len(ds) - args.batch, args.batch):
                xs, ys = zip(*(ds[start + i] for i in range(args.batch)))
                yield np.stack(xs), np.stack(ys)

    trainer = Trainer(
        fwd,
        loss,
        TrainerConfig(
            peak_lr=args.lr,
            warmup_steps=min(100, args.steps // 10 + 1),
            total_steps=args.steps,
            bf16_compute=args.bf16,
            checkpoint_dir=args.ckpt,
            log_every=10,
        ),
    )
    params = trainer.fit(params, batches(), num_steps=args.steps)
    log.info("base training done (%d steps)", args.steps)

    adapters = None
    if args.lora_steps > 0:
        adapters = train_lora_rollout(args, model, params, ds, loss_fn=loss)
    return params, adapters


def train_lora_rollout(args, model, params, ds, loss_fn):
    """Multi-step rollout fine-tuning: the base model predicts step t+1;
    each extra step k applies the base params merged with that step's LoRA
    factors — jointly trained on the summed per-step loss while the base
    stays frozen (reference train/lora.py:16-163)."""
    fwd = model.forward_fn()
    rng = jax.random.PRNGKey(1)
    adapters = [
        lora_init(jax.random.fold_in(rng, k), params, r=args.lora_rank)
        for k in range(args.lora_steps)
    ]
    optimizer = make_optimizer(learning_rate=args.lr)
    opt_state = optimizer.init(adapters)

    def rollout_loss(adapters, x, targets):
        pred = fwd(params, x)  # base step: frozen params
        total = loss_fn(pred, targets[0])
        for k in range(args.lora_steps):
            pred = fwd(lora_merge(params, adapters[k]), pred)
            total = total + loss_fn(pred, targets[k + 1])
        return total / (args.lora_steps + 1)

    @jax.jit
    def step(adapters, opt_state, x, targets):
        import optax

        val, grads = jax.value_and_grad(rollout_loss)(adapters, x, targets)
        updates, opt_state = optimizer.update(grads, opt_state, adapters)
        return optax.apply_updates(adapters, updates), opt_state, val

    horizon = args.lora_steps + 1
    it = 0
    while it < args.lora_iters:
        for start in range(0, len(ds) - horizon):
            x = ds[start][0][None]
            targets = [ds[start + k][1][None] for k in range(horizon)]
            adapters, opt_state, val = step(adapters, opt_state, x, targets)
            it += 1
            if it % 10 == 0:
                log.info("lora step %d loss %.5f", it, float(val))
            if it >= args.lora_iters:
                break
    log.info("LoRA rollout fine-tuning done (%d adapters)", args.lora_steps)
    return adapters


if __name__ == "__main__":
    main()
