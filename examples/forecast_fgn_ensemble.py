"""Multi-day FGN ensemble forecast via the autoregressive rollout.

FGN semantics (arXiv:2506.10772; reference models/fgn/README.md): each
ensemble member IS one functional perturbation — its noise vector is
sampled once and held FIXED across every autoregressive step, which is
what makes member trajectories jointly consistent. Here the whole
[B, E, T, lon, lat, F] trajectory — every member, every step — compiles
into ONE XLA program (models/fgn/model.py ensemble_rollout_fn), unlike
the reference's Python ensemble loop (reference models/fgn/model.py:338).

    python examples/forecast_fgn_ensemble.py               # tiny demo config
    python examples/forecast_fgn_ensemble.py --production  # 768-d, 24 blocks, splits 6
    python examples/forecast_fgn_ensemble.py --ckpt path/  # restored weights
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

from graph_weather_tpu.models.fgn import FunctionalGenerativeNetwork


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--production", action="store_true",
                        help="reference FGN scale: 768-d, 24 blocks, splits 6")
    parser.add_argument("--steps", type=int, default=4,
                        help="autoregressive forecast steps")
    parser.add_argument("--ensemble", type=int, default=2)
    parser.add_argument("--ckpt", default=None,
                        help="orbax checkpoint dir with trained params")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("forecast_fgn")

    if args.production:
        nlon, nlat, hid, blocks, splits, hops = 128, 64, 768, 24, 6, 6
        feats, zdim = 83, 32
    else:
        nlon, nlat, hid, blocks, splits, hops = 32, 16, 32, 2, 2, 2
        feats, zdim = 6, 8
    # Autoregression feeds the output back in, so input == output features.
    fgn = FunctionalGenerativeNetwork(
        grid_lon=np.arange(0.0, 360.0, 360.0 / nlon),
        grid_lat=np.linspace(-90.0, 90.0, nlat),
        input_features_dim=feats,
        output_features_dim=feats,
        noise_dimension=zdim,
        hidden_dims=(hid, hid),
        num_blocks=blocks,
        splits=splits,
        num_hops=hops,
        use_edges_features=False,
        attention_impl="clustered_flash",
    )
    if args.ckpt:
        from graph_weather_tpu.train import restore_checkpoint

        params = restore_checkpoint(args.ckpt, fgn.init(jax.random.PRNGKey(0)))
        log.info("restored params from %s", args.ckpt)
    else:
        params = fgn.init(jax.random.PRNGKey(0))
        log.info("random init (pass --ckpt for a trained model)")

    # member_chunk=1 runs members sequentially inside the program: at the
    # reference scale an 8-member vmap's gather workspace exceeds one
    # v5e's HBM, and member-vmap anti-scales in the gather memory system
    # even when it fits (measured, scripts/probe_fgn_ensemble.py). On a
    # multi-chip mesh shard the member axis instead (parallel/ensemble.py).
    rollout = jax.jit(fgn.ensemble_rollout_fn(
        num_ensemble=args.ensemble,
        num_steps=args.steps,
        compute_dtype=jnp.bfloat16,
        member_chunk=1 if args.production else None,
    ))

    prev = jax.random.normal(jax.random.PRNGKey(1), (1, nlon, nlat, feats))

    t0 = time.time()
    traj = jax.block_until_ready(rollout(params, prev, jax.random.PRNGKey(2)))
    log.info("compiled + first trajectory in %.1f s", time.time() - t0)

    t0 = time.time()
    traj = jax.block_until_ready(rollout(params, prev, jax.random.PRNGKey(3)))
    dt = time.time() - t0
    log.info(
        "ensemble trajectory %s in %.3f s (%.1f ms per member-step)",
        traj.shape, dt, dt / (args.ensemble * args.steps) * 1e3,
    )
    mean = jnp.mean(traj[:, :, -1], axis=1)
    spread = jnp.std(traj[:, :, -1], axis=1)
    log.info(
        "final-step ensemble mean |x|=%.4f, spread=%.4f",
        float(jnp.mean(jnp.abs(mean))), float(jnp.mean(spread)),
    )


if __name__ == "__main__":
    main()
