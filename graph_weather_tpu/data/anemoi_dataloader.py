"""Anemoi-datasets wrapper (reference data/anemoi_dataloader.py:9-185).

Required per-feature mean/std, coordinate-name fallbacks, leap-aware clock
features; yields ([N, F+4] input, [N, F] target) node tensors. Accepts an
anemoi dataset name (requires the optional anemoi-datasets package) or any
FieldStore / xarray-like object directly.
"""

from __future__ import annotations

import numpy as np

from graph_weather_tpu.data.store import FieldStore


class AnemoiDataset:
    def __init__(
        self,
        dataset_name: "str | FieldStore",
        features: list[str],
        means: dict,
        stds: dict,
        time_range: tuple | None = None,
        time_step: int = 1,
        max_samples: int | None = None,
        **kwargs,
    ):
        self.features = list(features)
        self.time_step = time_step
        self.max_samples = max_samples
        self.means = means
        self.stds = stds

        missing_means = [f for f in self.features if f not in means]
        missing_stds = [f for f in self.features if f not in stds]
        if missing_means or missing_stds:
            raise ValueError(
                "Normalization statistics missing for features: "
                f"means missing: {missing_means}, stds missing: {missing_stds}"
            )

        if isinstance(dataset_name, FieldStore):
            self.data = dataset_name
        else:
            try:
                from anemoi.datasets import open_dataset
            except ImportError as e:
                raise RuntimeError(
                    "anemoi-datasets is not installed; pass a FieldStore instead"
                ) from e
            config = {"dataset": dataset_name}
            if time_range:
                config["start"], config["end"] = time_range
            config.update(kwargs)
            ds = open_dataset(config)
            if hasattr(ds, "to_xarray"):
                ds = ds.to_xarray()
            self.data = FieldStore.from_xarray(ds)

        missing = [f for f in self.features if f not in self.data.variables]
        if missing:
            raise ValueError(
                f"Features {missing} not found in dataset. Available: "
                f"{list(self.data.variables)}"
            )

        self.grid_lat = self._find_coord(("latitude", "lat", "y"))
        self.grid_lon = self._find_coord(("longitude", "lon", "x"))
        self.num_lat = len(self.grid_lat)
        self.num_lon = len(self.grid_lon)

    def _find_coord(self, names):
        for name in names:
            if name in self.data.coords:
                return np.asarray(self.data.coords[name])
        raise ValueError(
            f"Could not find any of {names} in coords: {list(self.data.coords)}"
        )

    def _normalize(self, data, feature):
        return (data - self.means[feature]) / (self.stds[feature] + 1e-6)

    def _clock_features(self, t_index: int) -> np.ndarray:
        ts = self.data.times[t_index]
        day = ts.astype("datetime64[D]")
        year_start = ts.astype("datetime64[Y]")
        year = year_start.astype(int) + 1970
        is_leap = year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)
        days_in_year = 366.0 if is_leap else 365.0
        day_of_year = ((day - year_start).astype(int) + 1) / days_in_year
        hour = (ts.astype("datetime64[h]") - day).astype(int) / 24.0
        return np.array(
            [
                np.sin(2 * np.pi * day_of_year),
                np.cos(2 * np.pi * day_of_year),
                np.sin(2 * np.pi * hour),
                np.cos(2 * np.pi * hour),
            ],
            dtype=np.float32,
        )

    def __len__(self):
        n = len(self.data.times) - self.time_step
        return min(n, self.max_samples) if self.max_samples else n

    def _nodes(self, t: int) -> np.ndarray:
        cols = []
        for f in self.features:
            dims, arr = self.data.var(f)
            a = np.take(arr, t, axis=dims.index("time"))
            cols.append(self._normalize(a.reshape(-1), f))
        return np.stack(cols, axis=-1).astype(np.float32)

    def __getitem__(self, idx):
        x = self._nodes(idx)
        clock = np.broadcast_to(self._clock_features(idx), (x.shape[0], 4))
        x = np.concatenate([x, clock], axis=-1)
        y = self._nodes(idx + self.time_step)
        return np.nan_to_num(x), np.nan_to_num(y)
