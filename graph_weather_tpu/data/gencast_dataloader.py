"""GenCast training datasets (equivalent of reference
graph_weather/data/gencast_dataloader.py:22-424).

Per item: normalize+concat two input timesteps (+clock features), compute
the normalized target residual, sample a noise level, and corrupt the
residual with isotropic sphere noise. Works over any `FieldStore` (zarr,
xarray, or in-memory).

Noise is generated with the pure-NumPy twin of the framework's SHT
generator (ops/sht.py:generate_isotropic_noise_np), keeping the dataset
fully host-side.
"""

from __future__ import annotations

import warnings

import numpy as np

from graph_weather_tpu.data import const
from graph_weather_tpu.data.store import FieldStore


def _np_isotropic_noise(num_lon, num_lat, num_samples, isotropic, rng):
    # Pure NumPy: a dataset worker must never touch jax — in the axon
    # environment each eager jnp op is a remote-TPU round trip.
    from graph_weather_tpu.ops.sht import generate_isotropic_noise_np

    return generate_isotropic_noise_np(
        rng, num_lon, num_lat, num_samples, isotropic
    )


def sample_noise_level_np(rng, sigma_min=0.02, sigma_max=88.0, rho=7.0) -> float:
    u = rng.random()
    return float(
        (sigma_max ** (1 / rho) + u * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho)))
        ** rho
    )


class GenCastDataset:
    """Map-style dataset yielding
    (corrupted_targets, prev_inputs, noise_levels, target_residuals)."""

    def __init__(
        self,
        obs: "FieldStore | str",
        atmospheric_features: list[str],
        single_features: list[str],
        static_features: list[str],
        max_year: int = 2018,
        time_step: int = 2,
        seed: int = 0,
    ):
        self.data = (
            obs if isinstance(obs, FieldStore) else FieldStore.from_zarr(obs)
        )
        self.max_year = max_year
        self.grid_lon = np.asarray(self.data.coords["longitude"])
        self.grid_lat = np.asarray(self.data.coords["latitude"])
        self.num_lon = len(self.grid_lon)
        self.num_lat = len(self.grid_lat)
        self.pressure_levels = np.asarray(self.data.coords["level"], np.float32)
        self.output_features_dim = len(atmospheric_features) * len(
            self.pressure_levels
        ) + len(single_features)
        self.input_features_dim = self.output_features_dim + len(static_features) + 4
        self.time_step = time_step
        self.atmospheric_features = list(atmospheric_features)
        self.single_features = list(single_features)
        self.static_features = list(static_features)
        self._rng = np.random.default_rng(seed)

        self.means, self.stds, self.diff_means, self.diff_stds = (
            self._init_means_and_stds()
        )
        self.use_isotropic_noise = (self.num_lon == 2 * self.num_lat) or (
            self.num_lon == 2 * (self.num_lat - 1)
        )
        if not self.use_isotropic_noise:
            warnings.warn(
                "Isotropic noise requires grid's shape to be 2N x N or 2N x (N+1): "
                f"got {self.num_lon} x {self.num_lat}: falling back to flat noise"
            )

    def _stat(self, table, var, fallback=None):
        if var in table:
            value = table[var]
            # Per-level stats must match this dataset's level count (the
            # builtin ERA5 tables cover the 13 standard pressure levels).
            if isinstance(fallback, list) and np.ndim(value) == 1:
                if len(value) != len(fallback):
                    warnings.warn(
                        f"Stats for {var!r} cover {len(value)} levels but the "
                        f"dataset has {len(fallback)}; using neutral stats."
                    )
                    return fallback
            return value
        if fallback is not None:
            return fallback
        raise KeyError(f"No normalization stats for variable {var!r}")

    def _init_means_and_stds(self):
        means, stds, diff_means, diff_stds = [], [], [], []
        n_lev = len(self.pressure_levels)
        for var in self.atmospheric_features:
            means.extend(self._stat(const.ERA5_MEANS, var, [0.0] * n_lev))
            stds.extend(self._stat(const.ERA5_STD, var, [1.0] * n_lev))
            diff_means.extend(self._stat(const.ERA5_DIFF_MEAN, var, [0.0] * n_lev))
            diff_stds.extend(self._stat(const.ERA5_DIFF_STD, var, [1.0] * n_lev))
        for var in self.single_features:
            means.append(self._stat(const.ERA5_MEANS, var, 0.0))
            stds.append(self._stat(const.ERA5_STD, var, 1.0))
            diff_means.append(self._stat(const.ERA5_DIFF_MEAN, var, 0.0))
            diff_stds.append(self._stat(const.ERA5_DIFF_STD, var, 1.0))
        for var in self.static_features:
            means.append(self._stat(const.ERA5_MEANS, var, 0.0))
            stds.append(self._stat(const.ERA5_STD, var, 1.0))
        to32 = lambda x: np.asarray(x, dtype=np.float32)
        return to32(means), to32(stds), to32(diff_means), to32(diff_stds)

    @staticmethod
    def _normalize(data, means, stds):
        return (data - means) / (stds + 0.0001)

    @staticmethod
    def _sin_cos_emb(x):
        return np.sin(2 * np.pi * x), np.cos(2 * np.pi * x)

    def _clock_features(self, time_indices) -> np.ndarray:
        """[T, lon, lat, 4]: sin/cos day-of-year and local-mean-time."""
        times = self.data.times[time_indices]
        # day of year / hour of day from datetime64
        days = times.astype("datetime64[D]")
        years = times.astype("datetime64[Y]")
        day_of_year = (days - years).astype(int) + 1
        hours = (times.astype("datetime64[h]") - days).astype(int)

        doy_grid = np.broadcast_to(
            day_of_year[:, None, None].astype(np.float64),
            (len(times), self.num_lon, self.num_lat),
        )
        sin_doy, cos_doy = self._sin_cos_emb(doy_grid / 365.0)
        hod_grid = np.broadcast_to(
            hours[:, None, None].astype(np.float64),
            (len(times), self.num_lon, self.num_lat),
        )
        lmt = hod_grid + self.grid_lon[None, :, None] * 4.0 / 60.0
        sin_lmt, cos_lmt = self._sin_cos_emb(lmt / 24.0)
        return np.stack([sin_doy, cos_doy, sin_lmt, cos_lmt], axis=-1).astype(
            np.float32
        )

    def _raw_at(self, names, t) -> np.ndarray:
        """[lon, lat, F] stacked variables at time index t (atm flattened)."""
        parts = []
        for name in names:
            dims, arr = self.data.var(name)
            if "time" in dims:
                arr = np.take(arr, t, axis=dims.index("time"))
                dims = tuple(d for d in dims if d != "time")
            order = [dims.index(d) for d in ("longitude", "latitude", "level") if d in dims]
            arr = np.transpose(arr, order)
            if arr.ndim == 3:  # [lon, lat, level] -> level as channels
                parts.extend(np.moveaxis(arr, -1, 0))
            else:
                parts.append(arr)
        return np.stack(parts, axis=-1)

    def __len__(self):
        years = self.data.times.astype("datetime64[Y]").astype(int) + 1970
        return int((years < self.max_year).sum()) - 2 * self.time_step

    def __getitem__(self, item):
        t0, t1, t2 = item, item + self.time_step, item + 2 * self.time_step

        raw_inputs = np.stack(
            [
                np.concatenate(
                    [
                        self._raw_at(self.atmospheric_features, t),
                        self._raw_at(self.single_features, t),
                        self._raw_at(self.static_features, t),
                    ],
                    axis=-1,
                )
                for t in (t0, t1)
            ]
        )  # [2, lon, lat, F]
        inputs_norm = self._normalize(raw_inputs, self.means, self.stds)
        clock = self._clock_features([t0, t1])
        inputs = np.concatenate([inputs_norm, clock], axis=-1)
        prev_inputs = np.nan_to_num(
            np.concatenate([inputs[0], inputs[1]], axis=-1)
        ).astype(np.float32)

        raw_targets = np.concatenate(
            [
                self._raw_at(self.atmospheric_features, t2),
                self._raw_at(self.single_features, t2),
            ],
            axis=-1,
        )
        raw_res = raw_targets - raw_inputs[1, :, :, : raw_targets.shape[-1]]
        target_residuals = np.nan_to_num(
            self._normalize(raw_res, self.diff_means, self.diff_stds)
        ).astype(np.float32)

        noise_levels = np.array([sample_noise_level_np(self._rng)], np.float32)
        noise = _np_isotropic_noise(
            self.num_lon,
            self.num_lat,
            target_residuals.shape[-1],
            self.use_isotropic_noise,
            self._rng,
        )
        corrupted_targets = target_residuals + noise_levels * noise
        return corrupted_targets, prev_inputs, noise_levels, target_residuals


class BatchedGenCastDataset:
    """Whole-batch variant with rolling windows (reference
    gencast_dataloader.py:224-424): item i yields a batch of `batch_size`
    consecutive windows already stacked."""

    def __init__(
        self,
        obs: "FieldStore | str",
        atmospheric_features: list[str],
        single_features: list[str],
        static_features: list[str],
        batch_size: int = 16,
        max_year: int = 2018,
        time_step: int = 2,
        seed: int = 0,
    ):
        self.inner = GenCastDataset(
            obs,
            atmospheric_features,
            single_features,
            static_features,
            max_year,
            time_step,
            seed,
        )
        self.batch_size = batch_size
        for attr in (
            "grid_lon", "grid_lat", "num_lon", "num_lat", "pressure_levels",
            "output_features_dim", "input_features_dim",
        ):
            setattr(self, attr, getattr(self.inner, attr))

    def __len__(self):
        return max(len(self.inner) - self.batch_size + 1, 0)

    def __getitem__(self, item):
        samples = [self.inner[item + i] for i in range(self.batch_size)]
        return tuple(np.stack(parts) for parts in zip(*samples))
