"""IFS analysis (t, t+1) pair dataset (reference data/IFSAnalysis_dataloader.py:28-105).

Per-variable mean/std normalization, pressure levels stacked into channels,
returns flat [N, F] node tensors. Works over a FieldStore with
("time", "level", "latitude", "longitude")-dimensioned variables.
"""

from __future__ import annotations

import numpy as np

from graph_weather_tpu.data.store import FieldStore

# Representative IFS per-variable stats (user-overridable).
IFS_MEAN = {"t": 243.0, "q": 0.0018, "u": 8.8, "v": 0.03, "z": 78000.0}
IFS_STD = {"t": 29.0, "q": 0.0032, "u": 12.5, "v": 8.0, "z": 59000.0}


class IFSAnalysisDataset:
    """(input [N, F], target [N, F]) pairs of consecutive analyses."""

    def __init__(
        self,
        filepath_or_store: "FieldStore | str",
        features: list,
        start_year: int = 2016,
        end_year: int = 2022,
        mean: dict | None = None,
        std: dict | None = None,
    ):
        if start_year > end_year:
            raise ValueError(
                f"start_year ({start_year}) cannot be greater than end_year ({end_year})."
            )
        store = (
            filepath_or_store
            if isinstance(filepath_or_store, FieldStore)
            else FieldStore.from_zarr(filepath_or_store)
        )
        years = store.times.astype("datetime64[Y]").astype(int) + 1970
        keep = (years >= start_year) & (years <= end_year)
        self._time_idx = np.flatnonzero(keep)
        self.data = store
        self.NWP_features = list(features)
        self.mean = mean if mean is not None else IFS_MEAN
        self.std = std if std is not None else IFS_STD

    def __len__(self):
        return max(len(self._time_idx) - 1, 0)

    def _extract(self, t: int) -> np.ndarray:
        cubes = []
        for var in self.NWP_features:
            dims, arr = self.data.var(var)
            a = np.take(arr, t, axis=dims.index("time"))
            rest = tuple(d for d in dims if d != "time")
            order = [rest.index(d) for d in ("level", "latitude", "longitude") if d in rest]
            a = np.transpose(a, order)
            if a.ndim == 2:
                a = a[None]
            a = (a - self.mean.get(var, 0.0)) / (self.std.get(var, 1.0) + 1e-6)
            cubes.append(a)
        cube = np.stack(cubes, axis=-1).astype(np.float32)  # [L, lat, lon, V]
        n_lev, n_lat, n_lon, n_var = cube.shape
        # levels folded into channels, nodes flattened lat-major
        cube = np.moveaxis(cube, 0, 2).reshape(n_lat, n_lon, n_var * n_lev)
        if np.isnan(cube).any():
            raise ValueError("NaNs in extracted IFS features")
        return cube.reshape(-1, n_var * n_lev)

    def __getitem__(self, idx):
        t0, t1 = self._time_idx[idx], self._time_idx[idx + 1]
        return self._extract(t0), self._extract(t1)


# Reference's (misspelled) name kept as an alias for drop-in compatibility.
IFSAnalisysDataset = IFSAnalysisDataset
