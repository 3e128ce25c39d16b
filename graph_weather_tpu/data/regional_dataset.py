"""Movable-bbox regional dataset (reference data/regional_dataset.py:75-195).

Samples a random square region per index (seeded seed+idx), subsamples up
to max_points grid points, standardizes per variable, and returns a
block-averaged coarse "global context" for boundary nudging. Works over a
`FieldStore` with ("time", "latitude", "longitude") variables; the cloud
IFS icechunk store path is supported when icechunk+xarray are installed.
"""

from __future__ import annotations

import numpy as np

from graph_weather_tpu.data.store import FieldStore

DEFAULT_STORE = "earthmover-demos/ecmwf-ifs"
CORE_SURFACE = ["t2m", "u10", "v10", "sp"]
CORE_SURFACE_MEAN = {"t2m": 278.83, "u10": -0.05, "v10": 0.19, "sp": 96650.0}
CORE_SURFACE_STD = {"t2m": 21.28, "u10": 5.55, "v10": 4.75, "sp": 9575.0}


def open_ifs_store(store_url: str = DEFAULT_STORE) -> FieldStore:
    """Open the anonymous Source-Cooperative IFS icechunk store (optional deps)."""
    import os

    os.environ.setdefault("AWS_EC2_METADATA_DISABLED", "true")
    try:
        import icechunk
        import xarray as xr
    except ImportError as e:
        raise ImportError(
            "open_ifs_store requires icechunk + xarray; pass an in-memory "
            "FieldStore to RegionalDataset instead"
        ) from e
    bucket, prefix = store_url.split("/", 1)
    storage = icechunk.s3_storage(
        bucket=bucket,
        prefix=prefix,
        endpoint_url="https://data.source.coop",
        region="us-east-1",
        anonymous=True,
        force_path_style=True,
    )
    repo = icechunk.Repository.open(storage)
    session = repo.readonly_session("main")
    return FieldStore.from_xarray(
        xr.open_zarr(session.store, consolidated=False, zarr_format=3)
    )


class RegionalDataset:
    """(features, lat_lons, target, global_context) per random region."""

    def __init__(
        self,
        dataset: FieldStore | None = None,
        store_url: str = DEFAULT_STORE,
        variables: list | None = None,
        extent_deg: float = 20.0,
        max_points: int = 2000,
        seed: int = 0,
        mean: dict | None = None,
        std: dict | None = None,
        global_coarsen: int = 8,
    ):
        self.data = dataset if dataset is not None else open_ifs_store(store_url)
        self.variables = variables if variables is not None else CORE_SURFACE
        self.extent_deg = extent_deg
        self.max_points = max_points
        self.seed = seed
        self.mean = mean if mean is not None else CORE_SURFACE_MEAN
        self.std = std if std is not None else CORE_SURFACE_STD
        self.global_coarsen = global_coarsen
        self.lat = np.asarray(self.data.coords["latitude"])
        self.lon = np.asarray(self.data.coords["longitude"])

    def __len__(self) -> int:
        return len(self.data.times) - 1

    def _sample_box(self, rng):
        half = self.extent_deg / 2.0
        lat_c = rng.uniform(self.lat.min() + half, self.lat.max() - half)
        lon_c = rng.uniform(self.lon.min() + half, self.lon.max() - half)
        lat_idx = np.flatnonzero(np.abs(self.lat - lat_c) <= half)
        lon_idx = np.flatnonzero(np.abs(self.lon - lon_c) <= half)
        glat, glon = np.meshgrid(self.lat[lat_idx], self.lon[lon_idx], indexing="ij")
        giy, gix = np.meshgrid(
            np.arange(len(lat_idx)), np.arange(len(lon_idx)), indexing="ij"
        )
        flat = glat.size
        n = min(self.max_points, flat)
        pick = rng.choice(flat, size=n, replace=False)
        return (
            lat_idx,
            lon_idx,
            giy.ravel()[pick],
            gix.ravel()[pick],
            glat.ravel()[pick],
            glon.ravel()[pick],
        )

    def _coarsen(self, arr: np.ndarray) -> np.ndarray:
        k = self.global_coarsen
        if k <= 1:
            return arr
        ny, nx = arr.shape
        out = np.empty_like(arr)
        for by in range(0, ny, k):
            for bx in range(0, nx, k):
                block = arr[by : by + k, bx : bx + k]
                out[by : by + k, bx : bx + k] = (
                    np.nanmean(block) if np.isfinite(block).any() else np.nan
                )
        return out

    def _crop(self, name, t, lat_idx, lon_idx) -> np.ndarray:
        dims, arr = self.data.var(name)
        arr = np.take(arr, t, axis=dims.index("time"))
        rest = tuple(d for d in dims if d != "time")
        order = [rest.index("latitude"), rest.index("longitude")]
        arr = np.transpose(arr, order)
        return arr[np.ix_(lat_idx, lon_idx)]

    def _extract(self, t, lat_idx, lon_idx, iy, ix, coarse=False) -> np.ndarray:
        cols = []
        for v in self.variables:
            arr = self._crop(v, t, lat_idx, lon_idx)
            if coarse:
                arr = self._coarsen(arr)
            cols.append((arr[iy, ix] - self.mean[v]) / self.std[v])
        return np.nan_to_num(np.stack(cols, axis=-1).astype(np.float32), nan=0.0)

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed + idx)
        lat_idx, lon_idx, iy, ix, plat, plon = self._sample_box(rng)
        features = self._extract(idx, lat_idx, lon_idx, iy, ix)
        target = self._extract(idx + 1, lat_idx, lon_idx, iy, ix)
        global_context = self._extract(idx, lat_idx, lon_idx, iy, ix, coarse=True)
        lat_lons = [(float(a), float(b)) for a, b in zip(plat, plon)]
        return features, lat_lons, target, global_context
