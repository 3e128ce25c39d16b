"""0.25-degree GraphWeatherForecaster measurements on one chip.

Three configs (all H3 resolution-3 latent mesh, 41,162 cells):
  --config eighth   129,600 grid nodes — exactly one device's share of an
                    8-way grid-node-sharded 0.25 deg run (per-point edge
                    counts are uniform: 1 g2m + 7 m2g per point), i.e. the
                    per-chip compute of the v5p-8 north-star minus
                    collectives.
  --config half     0.5 deg (259,200 nodes) unsharded.
  --config quarter  0.25 deg (1,036,800 nodes) unsharded — may OOM on v5e.

Prints one JSON line per run with fwd ms and device peak memory.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def grid(lat_step: float, lon_step: float):
    lats = np.arange(-90.0, 90.0, lat_step)
    lons = np.arange(0.0, 360.0, lon_step)
    return [(float(a), float(b)) for a in lats for b in lons]


CONFIGS = {
    "eighth": lambda: grid(0.25, 2.0),  # 720 x 180 = 129,600
    "half": lambda: grid(0.5, 0.5),  # 360 x 720 = 259,200
    "quarter": lambda: grid(0.25, 0.25),  # 720 x 1440 = 1,036,800
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", choices=CONFIGS, default="eighth")
    p.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--rollout", type=int, default=0, help="also time an N-step lax.scan rollout")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from graph_weather_tpu import GraphWeatherForecaster

    lat_lons = CONFIGS[args.config]()
    t0 = time.time()
    model = GraphWeatherForecaster(
        lat_lons, feature_dim=78, aux_dim=24, resolution=3
    )
    build_s = time.time() - t0
    params = model.init(jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    base_fwd = model.forward_fn()

    def fwd(params, feats):
        p16 = jax.tree_util.tree_map(
            lambda t: t.astype(dtype)
            if jnp.issubdtype(t.dtype, jnp.floating)
            else t,
            params,
        )
        return base_fwd(p16, feats.astype(dtype)).astype(jnp.float32)

    f = jax.jit(fwd)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (1, len(lat_lons), 102), jnp.float32
    )
    result = {
        "config": args.config,
        "grid_nodes": len(lat_lons),
        "m2g_edges": int(model.m2g_bundle.n_edges),
        "dtype": args.dtype,
        "build_s": round(build_s, 1),
    }
    try:
        t0 = time.time()
        f(params, x).block_until_ready()
        result["compile_s"] = round(time.time() - t0, 1)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(params, x)
        out.block_until_ready()
        result["fwd_ms"] = round((time.perf_counter() - t0) / args.iters * 1000, 2)
        stats = jax.local_devices()[0].memory_stats() or {}
        result["peak_mb"] = round(stats.get("peak_bytes_in_use", 0) / 1e6)
        if args.rollout:
            from graph_weather_tpu.train import make_rollout_fn

            roll = jax.jit(make_rollout_fn(fwd, args.rollout))
            roll(params, x)[-1].block_until_ready()
            t0 = time.perf_counter()
            roll(params, x)[-1].block_until_ready()
            result["rollout_ms_per_step"] = round(
                (time.perf_counter() - t0) / args.rollout * 1000, 2
            )
        result["status"] = "ok"
    except Exception as e:  # noqa: BLE001 — OOM-graceful
        result["status"] = "failed"
        result["error"] = f"{type(e).__name__}: {str(e)[:300]}"
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
