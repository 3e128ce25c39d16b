"""Data-pipeline throughput benchmark (host-side, no TPU needed).

Measures GenCastDataset / BatchedGenCastDataset item production at the
GenCast 128x64 grid with 13 pressure levels (the reference training
configuration shape: 6 atmospheric x 13 levels + 5 single = 83 output
features), and the host->device feed rate of the produced batches.

Replaces the reference's torch DataLoader throughput story
(/root/reference/graph_weather/data/gencast_dataloader.py); here samples
are produced with numpy and fed via jax.device_put.

Usage: python scripts/bench_datapipe.py [--device]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from graph_weather_tpu.data.gencast_dataloader import (  # noqa: E402
    BatchedGenCastDataset,
    GenCastDataset,
)
from graph_weather_tpu.data.store import FieldStore  # noqa: E402

ATMOS = ["geopotential", "temperature", "u_wind", "v_wind", "vertical", "humidity"]
SINGLE = ["2m_temperature", "mslp", "u10", "v10", "sst"]
STATIC = ["land_sea_mask", "orography"]
LEVELS = tuple(float(p) for p in (50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000))


def build_store(num_times: int = 24) -> FieldStore:
    return FieldStore.synthetic(
        num_times=num_times,
        num_lon=128,
        num_lat=64,
        levels=LEVELS,
        atmospheric=tuple(ATMOS),
        single=tuple(SINGLE),
        static=tuple(STATIC),
        start_time="2016-01-01",
    )


def bench_items(ds, n: int, warmup: int = 2):
    for i in range(warmup):
        ds[i % len(ds)]
    t0 = time.perf_counter()
    for i in range(n):
        ds[i % len(ds)]
    dt = time.perf_counter() - t0
    return n / dt


def main() -> None:
    store = build_store()
    ds = GenCastDataset(store, ATMOS, SINGLE, STATIC, max_year=2030)
    sample = ds[0]
    nbytes = sum(np.asarray(t).nbytes for t in sample)
    rate = bench_items(ds, n=20)
    print(json.dumps({
        "metric": "gencast_dataset_items_per_sec",
        "value": round(rate, 2),
        "unit": "items/sec",
        "detail": {
            "grid": "128x64", "levels": len(LEVELS),
            "output_features": ds.output_features_dim,
            "sample_mb": round(nbytes / 2**20, 2),
            "mb_per_sec": round(rate * nbytes / 2**20, 1),
        },
    }), flush=True)

    bs = 4
    bds = BatchedGenCastDataset(store, ATMOS, SINGLE, STATIC, batch_size=bs, max_year=2030)
    rate_b = bench_items(bds, n=5)
    print(json.dumps({
        "metric": "gencast_batched_dataset_batches_per_sec",
        "value": round(rate_b, 2),
        "unit": "batches/sec",
        "detail": {"batch_size": bs, "samples_per_sec": round(rate_b * bs, 2)},
    }), flush=True)

    if "--device" in sys.argv:
        import jax

        batch = bds[0]
        jax.block_until_ready(jax.device_put(batch))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            jax.block_until_ready(jax.device_put(batch))
        dt = (time.perf_counter() - t0) / reps
        bbytes = sum(np.asarray(t).nbytes for t in batch)
        print(json.dumps({
            "metric": "device_feed_mb_per_sec",
            "value": round(bbytes / 2**20 / dt, 1),
            "unit": "MB/sec",
            "detail": {"batch_mb": round(bbytes / 2**20, 2)},
        }), flush=True)


if __name__ == "__main__":
    main()
