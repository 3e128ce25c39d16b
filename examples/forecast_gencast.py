"""Multi-day GenCast ensemble forecast via the autoregressive rollout.

The whole trajectory — every diffusion sampling step of every forecast
step — compiles into ONE XLA program (models/gencast/rollout.py), unlike
the reference's host loop around the sampler
(reference models/gencast/sampler.py:90-128 per step).

    python examples/forecast_gencast.py                   # tiny demo config
    python examples/forecast_gencast.py --production      # 128x64, splits 6
    python examples/forecast_gencast.py --ckpt path/      # restored weights
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
import time

import jax
import jax.numpy as jnp
import numpy as np

from graph_weather_tpu.models.gencast import Denoiser, Sampler, jit_ar_rollout


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--production", action="store_true",
                        help="GenCast 128x64 / 512-d / 16-block / splits-6 scale")
    parser.add_argument("--ar-steps", type=int, default=3,
                        help="autoregressive forecast steps (12h each)")
    parser.add_argument("--sample-steps", type=int, default=8,
                        help="diffusion solver steps per forecast step")
    parser.add_argument("--ensemble", type=int, default=2)
    parser.add_argument("--ckpt", default=None,
                        help="orbax checkpoint dir with trained params")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("forecast")

    if args.production:
        nlon, nlat, hid, blocks, splits, hops = 128, 64, 512, 16, 6, 6
        f_in, f_out = 89, 83
    else:
        nlon, nlat, hid, blocks, splits, hops = 32, 16, 32, 2, 2, 2
        f_in, f_out = 8, 6
    den = Denoiser(
        grid_lon=np.arange(0.0, 360.0, 360.0 / nlon),
        grid_lat=np.linspace(-90.0, 90.0, nlat),
        input_features_dim=f_in,
        output_features_dim=f_out,
        hidden_dims=(hid, hid),
        num_blocks=blocks,
        num_heads=4,
        splits=splits,
        num_hops=hops,
        use_edges_features=False,
        attention_impl="clustered_flash",
    )
    if args.ckpt:
        from graph_weather_tpu.train import restore_checkpoint

        params = restore_checkpoint(args.ckpt, den.init(jax.random.PRNGKey(0)))
        log.info("restored params from %s", args.ckpt)
    else:
        params = den.init(jax.random.PRNGKey(0))
        log.info("random init (pass --ckpt for a trained model)")

    rollout = jit_ar_rollout(
        Sampler(num_steps=args.sample_steps),
        den,
        num_ar_steps=args.ar_steps,
        compute_dtype=jnp.bfloat16,
    )

    prev = jax.random.normal(jax.random.PRNGKey(1), (1, nlon, nlat, 2 * f_in))
    keys = jax.random.split(jax.random.PRNGKey(2), args.ensemble)

    t0 = time.time()
    member0 = jax.block_until_ready(rollout(params, keys[0], prev))
    log.info("compiled + first member in %.1f s", time.time() - t0)

    t0 = time.time()
    # Ensemble = lax.map over member keys (sequential members inside one
    # program). NOT vmap: vmapping the rollout routes the clustered flash
    # kernel through the Pallas batching rule, which broadcasts the
    # batch-shared mask/ids operands per member (~2x slower per sample and
    # tens of MB of duplicated masks at production scale).
    ens = jax.block_until_ready(
        jax.jit(lambda ks: jax.lax.map(lambda k: rollout(params, k, prev), ks))(keys)
    )
    log.info(
        "ensemble %s members x %s AR steps (%s solver steps each): "
        "%.2f s, trajectory shape %s",
        args.ensemble, args.ar_steps, args.sample_steps,
        time.time() - t0, tuple(ens.shape),
    )
    log.info("member spread (std over ensemble, mean): %.4f",
             float(jnp.std(ens, axis=0).mean()))
    assert bool(jnp.all(jnp.isfinite(ens))) and not np.allclose(
        np.asarray(member0), np.asarray(ens[1 % args.ensemble, 0])
    )
    log.info("OK")


if __name__ == "__main__":
    main()
