"""Array-backed field store: the framework's xarray replacement.

Data loaders in the reference are written against xarray/zarr (not
installed here, and not needed on the device path). `FieldStore` is a thin
dims-aware container over NumPy arrays with the operations the loaders
need: time selection, variable stacking, coordinate access. Construct one
from a zarr store when the optional deps exist (`FieldStore.from_zarr`),
from in-memory arrays for tests/synthetic data, or adapt any
xarray-Dataset-like object.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class FieldStore:
    """Variables with named dims over shared coordinates.

    Attributes:
        coords: name -> 1D array; conventionally "time" (datetime64),
            "longitude", "latitude", "level".
        variables: name -> (dims tuple, ndarray), dims drawn from coords.
    """

    coords: dict
    variables: dict

    def __post_init__(self):
        for name, (dims, arr) in self.variables.items():
            if len(dims) != np.ndim(arr):
                raise ValueError(f"{name}: dims {dims} don't match shape {np.shape(arr)}")
            for d, s in zip(dims, np.shape(arr)):
                if d in self.coords and len(self.coords[d]) != s:
                    raise ValueError(
                        f"{name}: dim {d} has size {s} but coord has {len(self.coords[d])}"
                    )

    @property
    def times(self) -> np.ndarray:
        return np.asarray(self.coords["time"])

    def var(self, name: str) -> tuple[tuple, np.ndarray]:
        return self.variables[name]

    def isel_time(self, name: str, index) -> np.ndarray:
        """Variable values at integer time index/indices (time-leading dims),
        or unchanged for static variables."""
        dims, arr = self.variables[name]
        if "time" in dims:
            axis = dims.index("time")
            return np.take(arr, index, axis=axis)
        return arr

    def stacked(self, names, time_index=None, transpose_to=None) -> np.ndarray:
        """Stack variables along a new trailing axis, optionally at a time.

        Each variable is first brought to `transpose_to` dim order (defaults
        to its own order with time removed if time_index given).
        """
        parts = []
        for name in names:
            dims, arr = self.variables[name]
            if time_index is not None and "time" in dims:
                arr = np.take(arr, time_index, axis=dims.index("time"))
                dims = tuple(d for d in dims if d != "time") if np.isscalar(
                    time_index
                ) else dims
            if transpose_to is not None:
                order = [dims.index(d) for d in transpose_to if d in dims]
                if len(order) == len(dims):
                    arr = np.transpose(arr, order)
            parts.append(arr)
        return np.stack(parts, axis=-1)

    @staticmethod
    def from_zarr(path: str) -> "FieldStore":
        """Open a zarr store (requires optional zarr + xarray or zarr v3)."""
        try:
            import xarray as xr
        except ImportError as e:
            raise ImportError(
                "FieldStore.from_zarr requires xarray+zarr; construct from "
                "in-memory arrays instead"
            ) from e
        ds = xr.open_zarr(path, chunks={})
        return FieldStore.from_xarray(ds)

    @staticmethod
    def from_xarray(ds) -> "FieldStore":
        """Adapt an xarray.Dataset(-like) object."""
        coords = {k: np.asarray(v.values) for k, v in ds.coords.items()}
        variables = {
            k: (tuple(v.dims), np.asarray(v.values)) for k, v in ds.data_vars.items()
        }
        return FieldStore(coords=coords, variables=variables)

    @staticmethod
    def synthetic(
        num_times: int = 8,
        num_lon: int = 32,
        num_lat: int = 16,
        levels=(500.0, 850.0),
        atmospheric=("temperature",),
        single=("2m_temperature",),
        static=("land_sea_mask",),
        seed: int = 0,
        start_time: str = "2016-01-01",
        freq_hours: int = 6,
    ) -> "FieldStore":
        """Random-but-reproducible store for tests and examples."""
        rng = np.random.default_rng(seed)
        times = np.datetime64(start_time) + np.arange(num_times) * np.timedelta64(
            freq_hours, "h"
        )
        coords = {
            "time": times,
            "longitude": np.arange(0, 360, 360 / num_lon),
            "latitude": np.linspace(-90, 90, num_lat),
            "level": np.asarray(levels, dtype=np.float32),
        }
        variables = {}
        for v in atmospheric:
            variables[v] = (
                ("time", "longitude", "latitude", "level"),
                rng.normal(size=(num_times, num_lon, num_lat, len(levels))).astype(
                    np.float32
                ),
            )
        for v in single:
            variables[v] = (
                ("time", "longitude", "latitude"),
                rng.normal(size=(num_times, num_lon, num_lat)).astype(np.float32),
            )
        for v in static:
            variables[v] = (
                ("longitude", "latitude"),
                rng.normal(size=(num_lon, num_lat)).astype(np.float32),
            )
        return FieldStore(coords=coords, variables=variables)
