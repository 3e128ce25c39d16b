"""Benchmark: GraphWeatherForecaster forward+loss step on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches BASELINE.md's headline row: 1-degree global grid (64,800
nodes, 102 -> 78 features), jitted forward + NormalizedMSELoss, default
model scale (256-d, 9 message-passing blocks). The reference publishes no
numbers (BASELINE.md), so vs_baseline compares against the previous round's
recorded result when present, else 1.0.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

import numpy as np


def main() -> None:
    quick = "--quick" in sys.argv
    import jax
    import jax.numpy as jnp

    from graph_weather_tpu import GraphWeatherForecaster, NormalizedMSELoss

    spacing = 4.0 if quick else 1.0
    lats = np.arange(-90.0, 90.0, spacing)
    lons = np.arange(0.0, 360.0, spacing)
    lat_lons = [(float(a), float(b)) for a in lats for b in lons]
    feature_dim, aux_dim = 78, 24

    t0 = time.time()
    model = GraphWeatherForecaster(lat_lons, feature_dim=feature_dim, aux_dim=aux_dim)
    build_s = time.time() - t0

    rng = jax.random.PRNGKey(0)
    params = model.init(rng)
    loss_obj = NormalizedMSELoss(np.ones(feature_dim), lat_lons, normalize=True)
    fwd = model.forward_fn()

    @jax.jit
    def step(params, features, target):
        return loss_obj(fwd(params, features), target)

    features = jax.random.normal(
        jax.random.PRNGKey(1), (1, len(lat_lons), feature_dim + aux_dim)
    )
    target = jax.random.normal(jax.random.PRNGKey(2), (1, len(lat_lons), feature_dim))

    t0 = time.time()
    step(params, features, target).block_until_ready()
    compile_s = time.time() - t0

    n_iter = 5 if quick else 20
    # Warmup already done; time steady-state.
    t0 = time.time()
    for _ in range(n_iter):
        loss = step(params, features, target)
    loss.block_until_ready()
    elapsed = time.time() - t0
    steps_per_sec = n_iter / elapsed

    prev = None
    rounds = sorted(
        glob.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    if rounds:
        try:
            with open(rounds[-1]) as f:
                prev = json.load(f).get("value")
        except Exception:
            prev = None
    vs_baseline = (steps_per_sec / prev) if prev else 1.0

    print(
        json.dumps(
            {
                "metric": "forecast_fwd_loss_steps_per_sec_1deg"
                + ("_quick4deg" if quick else ""),
                "value": round(steps_per_sec, 3),
                "unit": "steps/sec",
                "vs_baseline": round(vs_baseline, 3),
                "detail": {
                    "grid_nodes": len(lat_lons),
                    "loss_included": True,
                    "build_s": round(build_s, 2),
                    "compile_s": round(compile_s, 2),
                    "device": str(jax.devices()[0]),
                    "step_ms": round(1000.0 * elapsed / n_iter, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
