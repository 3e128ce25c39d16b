"""Measure GenCast denoiser TRAIN step (fwd+bwd+AdamW) per attention impl.

VERDICT r1 item 4: the flash forward's old VJP recomputed through the XLA
banded path (~2x fwd cost); the hand-written flash backward should make
the banded_flash train step faster than the XLA-banded one.

    python scripts/bench_attention_train.py --splits 5 --hops 4
    python scripts/bench_attention_train.py --splits 6 --hops 6 --impls banded_flash
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
    p.add_argument("--splits", type=int, default=5)
    p.add_argument("--hops", type=int, default=4)
    p.add_argument("--impls", default="banded,banded_flash")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--fwd-only", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from graph_weather_tpu.models.gencast import Denoiser
    from graph_weather_tpu.train import make_optimizer, make_train_step

    nlon, nlat, hid, blocks = 128, 64, 512, 16
    f_in, f_out = 89, 83

    for impl in args.impls.split(","):
        t0 = time.time()
        den = Denoiser(
            grid_lon=np.arange(0.0, 360.0, 360.0 / nlon),
            grid_lat=np.linspace(-90.0, 90.0, nlat),
            input_features_dim=f_in,
            output_features_dim=f_out,
            hidden_dims=(hid, hid),
            num_blocks=blocks,
            num_heads=4,
            splits=args.splits,
            num_hops=args.hops,
            use_edges_features=False,
            attention_impl=impl,
        )
        build_s = time.time() - t0
        params = den.init(jax.random.PRNGKey(0))

        corrupted = jax.random.normal(jax.random.PRNGKey(1), (1, nlon, nlat, f_out))
        prev = jax.random.normal(jax.random.PRNGKey(2), (1, nlon, nlat, 2 * f_in))
        noise = jnp.full((1, 1), 1.0)
        target = jax.random.normal(jax.random.PRNGKey(3), (1, nlon, nlat, f_out))

        fwd32 = den.forward_fn(compute_dtype=jnp.bfloat16)

        def fetch(x):
            return float(np.asarray(jax.device_get(x)).ravel()[0])

        # Chained-scan timing with a fresh seed per dispatch and a host
        # fetch — see bench.py:_time_ms for the axon timing rules.
        result = {"impl": impl, "splits": args.splits, "build_s": round(build_s, 1)}
        if args.fwd_only:
            @jax.jit
            def scan_fwd(seed, params, corrupted, prev, noise):
                def body(c, _):
                    out = fwd32(
                        params, corrupted.at[0, 0, 0, 0].set(c), prev, noise
                    )
                    return jnp.mean(out).astype(jnp.float32), ()

                return jax.lax.scan(body, seed, None, length=args.iters)[0]

            t0 = time.time()
            fetch(scan_fwd(jnp.float32(0.0), params, corrupted, prev, noise))
            result["compile_s"] = round(time.time() - t0, 1)
            t0 = time.perf_counter()
            fetch(scan_fwd(jnp.float32(1.0), params, corrupted, prev, noise))
            result["fwd_ms"] = round(
                (time.perf_counter() - t0) / args.iters * 1000, 2
            )
        else:
            optimizer = make_optimizer(learning_rate=1e-4)
            opt_state = optimizer.init(params)

            def loss_fn(pred, tgt):
                return jnp.mean((pred - tgt) ** 2)

            step = make_train_step(fwd32, loss_fn, optimizer)

            @jax.jit
            def scan_train(seed, params, opt_state, corrupted, prev, noise, target):
                def body(carry, _):
                    p, o, s = carry
                    p, o, loss = step(
                        p, o, corrupted.at[0, 0, 0, 0].set(s), prev, noise, target
                    )
                    return (p, o, loss.astype(jnp.float32)), ()

                (p, o, s), _ = jax.lax.scan(
                    body, (params, opt_state, seed), None, length=args.iters
                )
                return s

            t0 = time.time()
            fetch(scan_train(
                jnp.float32(0.0), params, opt_state, corrupted, prev, noise, target
            ))
            result["compile_s"] = round(time.time() - t0, 1)
            t0 = time.perf_counter()
            fetch(scan_train(
                jnp.float32(1.0), params, opt_state, corrupted, prev, noise, target
            ))
            result["train_step_ms"] = round(
                (time.perf_counter() - t0) / args.iters * 1000, 2
            )
        stats = jax.local_devices()[0].memory_stats() or {}
        result["peak_mb"] = round(stats.get("peak_bytes_in_use", 0) / 1e6)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
