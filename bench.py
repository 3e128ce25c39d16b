"""Benchmark suite: one JSON line per metric, headline metric LAST.

Each metric runs in its own subprocess (clean HBM, isolated failures) and
prints {"metric", "value", "unit", "vs_baseline"}. The final line is the
headline forecast steps/sec metric the driver has tracked since round 1.

Metrics (config sources: BASELINE.md round-1 measurements):
  - gencast_denoiser_fwd_ms_splits5   128x64 grid, 512-d, 16 blocks,
    splits 5 / hops 4, clustered_flash, bf16 (r1: 27.9 ms banded_flash)
  - gencast_denoiser_fwd_ms_splits6   production scale, splits 6 / hops 6
    (40,962 mesh nodes, 5.16M k-hop edges)  (r1: 178.7 ms)
  - gencast_sampler_20step_ms         full DPMSolver++2S, 37 denoiser
    evals, splits 5, bf16 (r1: 941 ms)
  - assimilator_fwd_ms                4,096 obs -> 64,800-node analysis
    grid, dim 24 (r1: 27.1 ms)
  - forecast_train_step_ms_1deg       fwd+bwd+AdamW, batch 1 (r1: 121 ms)
  - forecast_fwd_loss_steps_per_sec_1deg  HEADLINE (r1: 36.255 steps/s)

vs_baseline > 1 always means "better than round 1" (ratio is inverted for
ms metrics). --quick runs a cut-down subset on tiny grids.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# Round-1 single-v5e measurements (BASELINE.md) used as the fixed baseline
# for the ms metrics; the headline steps/sec metric reads the previous
# round's BENCH_r*.json instead (relative tracking, as in round 1).
R1_BASELINE_MS = {
    "gencast_denoiser_fwd_ms_splits5": 27.9,
    "gencast_denoiser_fwd_ms_splits6": 178.7,
    "gencast_sampler_20step_ms": 941.0,
    "assimilator_fwd_ms": 27.1,
    "forecast_train_step_ms_1deg": 121.0,
    # anchor: first measurement under the hardened harness (late round 2,
    # single-pass fwd+bwd kernels); earlier "75.2 ms" used the unreliable
    # naive loop and is not comparable.
    "gencast_denoiser_train_ms_splits5": 87.7,
}


def _grid(spacing: float):
    lats = np.arange(-90.0, 90.0, spacing)
    lons = np.arange(0.0, 360.0, spacing)
    return [(float(a), float(b)) for a in lats for b in lons]


def _fetch(x) -> float:
    """Materialize a device scalar on the host (forces remote execution)."""
    import jax

    return float(np.asarray(jax.device_get(x)).ravel()[0])


def _time_ms(body, n_iter: int, args=()) -> float:
    """Time `body` chained n_iter times inside one jitted lax.scan.

    `body(carry_scalar, *args) -> array`; the returned array's MEAN feeds
    the next carry so every iteration depends on the FULL previous output.

    This shape is required for honest numbers on the axon (remote TPU
    tunnel) runtime — measured findings, validated against an 8192^3
    matmul landing at ~65% of MXU peak:
      - un-chained repeat dispatches of identical (executable, args) can
        be served from a cache (same-buffer loops measure ~0);
      - block_until_ready alone does not force execution; a value must be
        fetched to the host;
      - a carry taken from a SLICE of the output lets XLA slice-pushdown
        delete the work being measured — hence the mean;
      - per-dispatch tunnel overhead (~30 ms) is calibrated and
        subtracted; chaining amortizes it across iterations.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def scan_fn(seed, *a):
        def step(carry, _):
            out = body(carry, *a)
            return jnp.mean(out).astype(jnp.float32), ()

        return jax.lax.scan(step, seed, None, length=n_iter)[0]

    _fetch(scan_fn(jnp.float32(0.0), *args))  # compile + warm
    triv = jax.jit(lambda s: s + 1.0)
    _fetch(triv(jnp.float32(0.5)))
    t0 = time.perf_counter()
    _fetch(triv(jnp.float32(1.5)))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    _fetch(scan_fn(jnp.float32(1.0), *args))
    return (time.perf_counter() - t0 - overhead) / n_iter * 1000.0


def _emit(metric: str, value: float, unit: str, vs_baseline: float, **detail):
    import jax

    detail.setdefault("device", str(jax.devices()[0]))
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": unit,
                "vs_baseline": round(vs_baseline, 3),
                "detail": detail,
            }
        ),
        flush=True,
    )


def _ms_metric(metric: str, value_ms: float, **detail):
    base = R1_BASELINE_MS.get(metric)
    vs = (base / value_ms) if base else 1.0
    _emit(metric, value_ms, "ms", vs, **detail)


# --------------------------------------------------------------------------
# individual metrics (each runs in a fresh subprocess)


def metric_denoiser(splits: int, hops: int, quick: bool):
    import jax
    import jax.numpy as jnp

    from graph_weather_tpu.models.gencast import Denoiser

    if quick:
        nlon, nlat, hid, blocks, splits, hops = 32, 16, 64, 4, 2, 2
        f_in, f_out = 8, 4
    else:
        nlon, nlat, hid, blocks = 128, 64, 512, 16
        f_in, f_out = 89, 83
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
    params = den.init(jax.random.PRNGKey(0))
    fwd = den.forward_fn(compute_dtype=jnp.bfloat16)
    corrupted = jax.random.normal(jax.random.PRNGKey(1), (1, nlon, nlat, f_out))
    prev = jax.random.normal(jax.random.PRNGKey(2), (1, nlon, nlat, 2 * f_in))
    noise = jnp.full((1, 1), 1.0)

    def body(c, params, corrupted, prev, noise):
        return fwd(params, corrupted.at[0, 0, 0, 0].set(c), prev, noise)

    ms = _time_ms(
        body, 5 if quick else 20, args=(params, corrupted, prev, noise)
    )
    _ms_metric(
        f"gencast_denoiser_fwd_ms_splits{splits}" + ("_quick" if quick else ""),
        ms,
        grid=f"{nlon}x{nlat}",
        mesh_nodes=int(den.graphs.khop.n_senders),
        dtype="bfloat16",
        attention_impl="clustered_flash",
    )


def metric_sampler(quick: bool):
    import jax
    import jax.numpy as jnp

    from graph_weather_tpu.models.gencast import Denoiser, Sampler

    if quick:
        nlon, nlat, hid, blocks, splits, hops = 32, 16, 64, 4, 2, 2
        f_in, f_out, steps = 8, 4, 4
    else:
        nlon, nlat, hid, blocks, splits, hops = 128, 64, 512, 16, 5, 4
        f_in, f_out, steps = 89, 83, 20
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
    params = den.init(jax.random.PRNGKey(0))
    sampler = Sampler(num_steps=steps)
    fn = sampler.sample_fn(den, compute_dtype=jnp.bfloat16)
    prev = jax.random.normal(jax.random.PRNGKey(2), (1, nlon, nlat, 2 * f_in))
    key = jax.random.PRNGKey(3)

    def body(c, params, key, prev):
        return fn(params, key, prev.at[0, 0, 0, 0].set(c))

    ms = _time_ms(body, 2 if quick else 5, args=(params, key, prev))
    _ms_metric(
        "gencast_sampler_20step_ms" + ("_quick" if quick else ""),
        ms,
        num_steps=steps,
        denoiser_evals=2 * (steps - 2) + 1,
        dtype="bfloat16",
    )


def metric_gencast_train(quick: bool):
    """Denoiser TRAIN step (fwd+bwd+AdamW) with the clustered flash
    backward kernel, splits 5 — the diffusion training workload."""
    import jax
    import jax.numpy as jnp

    from graph_weather_tpu.models.gencast import Denoiser
    from graph_weather_tpu.train import make_optimizer, make_train_step

    if quick:
        nlon, nlat, hid, blocks, splits, hops = 32, 16, 64, 4, 2, 2
        f_in, f_out = 8, 4
    else:
        nlon, nlat, hid, blocks, splits, hops = 128, 64, 512, 16, 5, 4
        f_in, f_out = 89, 83
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
    params = den.init(jax.random.PRNGKey(0))
    fwd = den.forward_fn(compute_dtype=jnp.bfloat16)
    optimizer = make_optimizer(learning_rate=1e-4)
    opt_state = optimizer.init(params)
    corrupted = jax.random.normal(jax.random.PRNGKey(1), (1, nlon, nlat, f_out))
    prev = jax.random.normal(jax.random.PRNGKey(2), (1, nlon, nlat, 2 * f_in))
    noise = jnp.full((1, 1), 1.0)
    target = jax.random.normal(jax.random.PRNGKey(3), (1, nlon, nlat, f_out))

    def loss_fn(pred, tgt):
        return jnp.mean((pred - tgt) ** 2)

    step = make_train_step(fwd, loss_fn, optimizer)
    n_iter = 3 if quick else 12
    import time as _time

    @jax.jit
    def scan_fn(seed, params, opt_state):
        def one(carry, _):
            p, o, s = carry
            p, o, loss = step(
                p, o, corrupted.at[0, 0, 0, 0].set(s), prev, noise, target
            )
            return (p, o, loss.astype(jnp.float32)), ()

        (p, o, s), _ = jax.lax.scan(
            one, (params, opt_state, seed), None, length=n_iter
        )
        return s

    _fetch(scan_fn(jnp.float32(0.0), params, opt_state))
    triv = jax.jit(lambda s: s + 1.0)
    _fetch(triv(jnp.float32(0.5)))
    t0 = _time.perf_counter()
    _fetch(triv(jnp.float32(1.5)))
    overhead = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    _fetch(scan_fn(jnp.float32(1.0), params, opt_state))
    ms = (_time.perf_counter() - t0 - overhead) / n_iter * 1000.0
    _ms_metric(
        "gencast_denoiser_train_ms_splits5" + ("_quick" if quick else ""),
        ms,
        grid=f"{nlon}x{nlat}",
        dtype="bfloat16",
        attention_impl="clustered_flash",
        optimizer="adamw",
    )


def metric_assimilator(quick: bool):
    import jax
    import jax.numpy as jnp

    from graph_weather_tpu import GraphWeatherAssimilator

    spacing = 4.0 if quick else 1.0
    lat_lons = _grid(spacing)
    num_obs = 512 if quick else 4096
    model = GraphWeatherAssimilator(
        output_lat_lons=lat_lons, analysis_dim=24, observation_dim=2
    )
    params = model.init(jax.random.PRNGKey(0), num_obs=num_obs)
    fwd = jax.jit(model.forward_fn())
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, num_obs, 2))
    rng = np.random.default_rng(2)
    obs = jnp.asarray(
        np.stack(
            [
                rng.uniform(-90, 90, num_obs),
                rng.uniform(0, 360, num_obs),
                rng.uniform(0, 10000, num_obs),
            ],
            axis=1,
        ),
        jnp.float32,
    )
    def body(c, params, feats, obs):
        return fwd(params, feats.at[0, 0, 0].set(c), obs)

    ms = _time_ms(body, 5 if quick else 20, args=(params, feats, obs))
    _ms_metric(
        "assimilator_fwd_ms" + ("_quick" if quick else ""),
        ms,
        num_obs=num_obs,
        grid_nodes=len(lat_lons),
    )


def metric_train_step(quick: bool):
    import jax

    from graph_weather_tpu import GraphWeatherForecaster, NormalizedMSELoss
    from graph_weather_tpu.train import make_optimizer, make_train_step

    spacing = 4.0 if quick else 1.0
    lat_lons = _grid(spacing)
    model = GraphWeatherForecaster(lat_lons, feature_dim=78, aux_dim=24)
    params = model.init(jax.random.PRNGKey(0))
    loss_obj = NormalizedMSELoss(np.ones(78), lat_lons, normalize=True)
    optimizer = make_optimizer(learning_rate=1e-3)
    import jax.numpy as jnp
    import time as _time

    step = make_train_step(model.forward_fn(), loss_obj, optimizer)
    opt_state = optimizer.init(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, len(lat_lons), 102))
    y = jax.random.normal(jax.random.PRNGKey(2), (1, len(lat_lons), 78))
    n_iter = 5 if quick else 20

    # Chained real optimization steps: each iteration's params depend on
    # the previous one, so no dispatch/result caching can shortcut it
    # (see _time_ms for the axon timing rules this follows).
    @jax.jit
    def scan_fn(seed, params, opt_state, x, y):
        def one(carry, _):
            p, o, s = carry
            p, o, loss = step(p, o, x.at[0, 0, 0].set(s), y)
            return (p, o, loss.astype(jnp.float32)), ()

        (p, o, s), _ = jax.lax.scan(
            one, (params, opt_state, seed), None, length=n_iter
        )
        return s

    _fetch(scan_fn(jnp.float32(0.0), params, opt_state, x, y))
    triv = jax.jit(lambda s: s + 1.0)
    _fetch(triv(jnp.float32(0.5)))
    t0 = _time.perf_counter()
    _fetch(triv(jnp.float32(1.5)))
    overhead = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    _fetch(scan_fn(jnp.float32(1.0), params, opt_state, x, y))
    ms = (_time.perf_counter() - t0 - overhead) / n_iter * 1000.0
    _ms_metric(
        "forecast_train_step_ms_1deg" + ("_quick" if quick else ""),
        ms,
        grid_nodes=len(lat_lons),
        optimizer="adamw",
        chained_scan=True,
    )


def metric_headline(quick: bool):
    import glob
    import re

    import jax

    from graph_weather_tpu import GraphWeatherForecaster, NormalizedMSELoss

    spacing = 4.0 if quick else 1.0
    lat_lons = _grid(spacing)
    t0 = time.time()
    model = GraphWeatherForecaster(lat_lons, feature_dim=78, aux_dim=24)
    build_s = time.time() - t0
    params = model.init(jax.random.PRNGKey(0))
    loss_obj = NormalizedMSELoss(np.ones(78), lat_lons, normalize=True)
    fwd = model.forward_fn()

    @jax.jit
    def step(params, features, target):
        return loss_obj(fwd(params, features), target)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, len(lat_lons), 102))
    y = jax.random.normal(jax.random.PRNGKey(2), (1, len(lat_lons), 78))
    t0 = time.time()
    _fetch(step(params, x, y))
    compile_s = time.time() - t0
    n_iter = 5 if quick else 20

    def body(c, params, x, y):
        return step(params, x.at[0, 0, 0].set(c), y)

    ms = _time_ms(body, n_iter, args=(params, x, y))
    steps_per_sec = 1000.0 / ms

    prev = None
    rounds = sorted(
        glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    if rounds:
        try:
            with open(rounds[-1]) as f:
                data = json.load(f)
            prev = (data.get("parsed") or data).get("value")
        except Exception:
            prev = None
    _emit(
        "forecast_fwd_loss_steps_per_sec_1deg" + ("_quick4deg" if quick else ""),
        steps_per_sec,
        "steps/sec",
        (steps_per_sec / prev) if prev else 1.0,
        grid_nodes=len(lat_lons),
        loss_included=True,
        build_s=round(build_s, 2),
        compile_s=round(compile_s, 2),
        step_ms=round(ms, 2),
    )


METRICS = {
    "denoiser_s5": lambda quick: metric_denoiser(5, 4, quick),
    "denoiser_s6": lambda quick: metric_denoiser(6, 6, quick),
    "gencast_train": metric_gencast_train,
    "sampler": metric_sampler,
    "assimilator": metric_assimilator,
    "train_step": metric_train_step,
    "headline": metric_headline,
}


def main() -> None:
    quick = "--quick" in sys.argv
    which = None
    for a in sys.argv[1:]:
        if a.startswith("--metric="):
            which = a.split("=", 1)[1]
    if which is not None:
        METRICS[which](quick)
        return

    # Parent: run each metric in its own subprocess; forward its stdout
    # JSON line(s). Headline runs last so the driver's single-line parse
    # keeps tracking the round-1 metric.
    if quick:
        # Smoke subset: remote-tunnel compiles dominate quick runs, so two
        # metrics keep it under ~5 minutes.
        order = ["denoiser_s5", "headline"]
    else:
        order = [
            "denoiser_s5", "denoiser_s6", "gencast_train", "sampler",
            "assimilator", "train_step", "headline",
        ]
    for name in order:
        cmd = [sys.executable, os.path.abspath(__file__), f"--metric={name}"]
        if quick:
            cmd.append("--quick")
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=2400
            )
            wrote = False
            for line in proc.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    print(line, flush=True)
                    wrote = True
            if proc.returncode != 0 or not wrote:
                sys.stderr.write(
                    f"[bench] metric {name} failed rc={proc.returncode}:\n"
                    + proc.stderr[-2000:]
                    + "\n"
                )
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"[bench] metric {name} timed out\n")


if __name__ == "__main__":
    main()
