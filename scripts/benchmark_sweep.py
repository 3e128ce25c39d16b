"""Benchmark sweep: grid resolution x batch size x checkpoint strategy.

Equivalent of reference scripts/benchmark_memory_optimizations.py:80-349:
sweeps the GraphWeatherForecaster over grid spacings and batch sizes for
each rematerialization strategy, recording forward and forward+backward
wall times and device peak memory, OOM-graceful, JSON output.

Usage: python scripts/benchmark_sweep.py [--quick] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# allow running as `python scripts/benchmark_sweep.py` without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_peak_mb() -> float:
    import jax

    stats = jax.local_devices()[0].memory_stats() or {}
    return stats.get("peak_bytes_in_use", 0) / 1e6


def run_config(spacing: float, batch: int, strategy: str, iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from graph_weather_tpu import NormalizedMSELoss
    from graph_weather_tpu.models.graphcast import GraphCast

    lats = np.arange(-90.0, 90.0, spacing)
    lons = np.arange(0.0, 360.0, spacing)
    lat_lons = [(float(a), float(b)) for a in lats for b in lons]
    result = {
        "grid_spacing_deg": spacing,
        "num_nodes": len(lat_lons),
        "batch_size": batch,
        "strategy": strategy,
    }
    try:
        model = GraphCast(
            lat_lons, input_dim=102, output_dim=78, hidden_dim=256,
            num_processor_blocks=9, checkpoint_strategy=strategy,
        )
        params = model.init(jax.random.PRNGKey(0))
        loss_obj = NormalizedMSELoss(np.ones(78), lat_lons, normalize=True)
        fwd = model.forward_fn()

        x = jax.random.normal(jax.random.PRNGKey(1), (batch, len(lat_lons), 102))
        y = jax.random.normal(jax.random.PRNGKey(2), (batch, len(lat_lons), 78))

        fwd_jit = jax.jit(fwd)
        grad_jit = jax.jit(
            jax.value_and_grad(lambda p: loss_obj(fwd(p, x), y))
        )

        fwd_jit(params, x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd_jit(params, x)
        out.block_until_ready()
        result["forward_ms"] = (time.perf_counter() - t0) / iters * 1000

        loss, grads = grad_jit(params)
        jax.tree_util.tree_leaves(grads)[0].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            loss, grads = grad_jit(params)
        jax.tree_util.tree_leaves(grads)[0].block_until_ready()
        result["fwd_bwd_ms"] = (time.perf_counter() - t0) / iters * 1000
        result["peak_memory_mb"] = device_peak_mb()
        result["status"] = "ok"
    except Exception as e:  # noqa: BLE001 — OOM-graceful like the reference
        result["status"] = "failed"
        result["error"] = f"{type(e).__name__}: {str(e)[:200]}"
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--out", default="benchmark_sweep_results.json")
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    if args.quick:
        spacings, batches = [5.0], [1, 2]
        strategies = ["none", "processor_only"]
    else:
        spacings, batches = [5.0, 2.5, 1.0], [1, 2, 4, 8]
        strategies = ["none", "full", "balanced", "processor_only", "fine_grained"]

    results = []
    for spacing in spacings:
        for batch in batches:
            for strategy in strategies:
                r = run_config(spacing, batch, strategy, args.iters)
                results.append(r)
                print(json.dumps(r))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {len(results)} results to {args.out}")


if __name__ == "__main__":
    main()
