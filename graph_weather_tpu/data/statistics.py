"""Normalization-statistics computation over a FieldStore.

Equivalent of reference models/gencast/utils/statistics.py (which carries a
hard dependency on apache_beam/weatherbench2 and a module-level cloud read;
neither replicated). Computes per-variable (optionally per-level) means and
stds from random temporal samples, for single timesteps and for timestep
differences (the 'diff' stats GenCast normalizes residuals with).
"""

from __future__ import annotations

import numpy as np

from graph_weather_tpu.data.store import FieldStore


def _samples(store: FieldStore, var: str, indexes: np.ndarray) -> tuple[np.ndarray, tuple]:
    dims, arr = store.var(var)
    t_axis = dims.index("time")
    rest = tuple(d for d in dims if d != "time")
    samples = np.nan_to_num(np.take(arr, indexes, axis=t_axis))
    # reduce over time + spatial axes, keeping "level" (if present) as the
    # statistics dimension
    reduce_axes = tuple(
        i for i, d in enumerate(("time",) + rest) if d != "level"
    )
    return samples, reduce_axes


def compute_statistics(
    store: FieldStore, variables: list[str], num_samples: int = 100, seed: int = 0
) -> tuple[dict, dict]:
    """Per-variable (per-level when applicable) means and stds."""
    rng = np.random.default_rng(seed)
    n_time = len(store.times)
    means, stds = {}, {}
    for var in variables:
        idx = rng.integers(0, n_time, min(num_samples, n_time))
        samples, axes = _samples(store, var, idx)
        means[var] = samples.mean(axis=axes)
        stds[var] = samples.std(axis=axes)
    return means, stds


def compute_statistics_diff(
    store: FieldStore,
    variables: list[str],
    num_samples: int = 100,
    timestep: int = 2,
    seed: int = 0,
) -> tuple[dict, dict]:
    """Statistics of the (t+timestep) - t residual per variable."""
    rng = np.random.default_rng(seed)
    n_time = len(store.times)
    means, stds = {}, {}
    for var in variables:
        idx = rng.integers(0, max(n_time - timestep, 1), min(num_samples, n_time))
        start, axes = _samples(store, var, idx)
        end, _ = _samples(store, var, idx + timestep)
        diff = end - start
        means[var] = diff.mean(axis=axes)
        stds[var] = diff.std(axis=axes)
    return means, stds
