"""Analysis (t, t+1) dataset with solar/clock/coordinate channels.

Equivalent of reference data/dataloader.py:24-175 (without the leftover
module-level script the reference carries): loads consecutive analysis
pairs, interpolates+normalizes the land-sea/orography channels, and
appends sin/cos lat/lon, day-of-year, and 25 hourly TOA-solar channels
(+-12 h) computed with the internal astronomy (see data/solar.py) instead
of pysolar.
"""

from __future__ import annotations

import numpy as np

from graph_weather_tpu.data import const
from graph_weather_tpu.data.solar import toa_irradiance
from graph_weather_tpu.data.store import FieldStore


class AnalysisDataset:
    """(input [N, F_in + aux], target [N, F_out]) consecutive-analysis pairs.

    Aux channels: sin/cos(lat), sin/cos(lon), sin/cos(day-of-year), 25
    normalized hourly TOA solar irradiance channels at t-12h .. t+12h.
    """

    def __init__(
        self,
        store: "FieldStore | str",
        features: list[str],
        means: dict | None = None,
        stds: dict | None = None,
        coarsen: int = 1,
    ):
        self.data = (
            store if isinstance(store, FieldStore) else FieldStore.from_zarr(store)
        )
        self.features = list(features)
        self.means = means or {}
        self.stds = stds or {}
        self.coarsen = coarsen

        lat = np.asarray(self.data.coords["latitude"], np.float64)
        lon = np.asarray(self.data.coords["longitude"], np.float64)
        if coarsen > 1:
            lat = lat[::coarsen]
            lon = lon[::coarsen]
        self.lat, self.lon = lat, lon
        lat_g, lon_g = np.meshgrid(lat, lon, indexing="ij")
        self.lat_lons = np.stack([lat_g.reshape(-1), lon_g.reshape(-1)], axis=1)

    def __len__(self):
        return len(self.data.times) - 1

    def _nodes(self, t: int) -> np.ndarray:
        cols = []
        for f in self.features:
            dims, arr = self.data.var(f)
            a = np.take(arr, t, axis=dims.index("time")) if "time" in dims else arr
            rest = tuple(d for d in dims if d != "time")
            order = [rest.index(d) for d in ("latitude", "longitude") if d in rest]
            a = np.transpose(a, order)
            if self.coarsen > 1:
                a = a[:: self.coarsen, :: self.coarsen]
            mean = self.means.get(f, const.FORECAST_MEANS.get(f, 0.0))
            std = self.stds.get(f, const.FORECAST_STD.get(f, 1.0))
            cols.append(((a - mean) / (std + 1e-6)).reshape(-1))
        return np.nan_to_num(np.stack(cols, axis=-1).astype(np.float32))

    def _aux(self, t: int) -> np.ndarray:
        lat_rad = np.deg2rad(self.lat_lons[:, 0])
        lon_rad = np.deg2rad(self.lat_lons[:, 1])
        ts = self.data.times[t]
        day = ts.astype("datetime64[D]")
        year = ts.astype("datetime64[Y]")
        doy = float((day - year).astype(int) + 1) / 365.0

        offsets = np.arange(-12, 13)  # 25 hourly channels
        sample_times = ts.astype("datetime64[s]") + offsets * np.timedelta64(3600, "s")
        solar = toa_irradiance(
            self.lat_lons[:, 0], self.lat_lons[:, 1], sample_times
        ).T  # [N, 25]
        solar = (solar - const.SOLAR_MEAN) / const.SOLAR_STD

        n = self.lat_lons.shape[0]
        aux = np.concatenate(
            [
                np.sin(lat_rad)[:, None],
                np.cos(lat_rad)[:, None],
                np.sin(lon_rad)[:, None],
                np.cos(lon_rad)[:, None],
                np.full((n, 1), np.sin(2 * np.pi * doy)),
                np.full((n, 1), np.cos(2 * np.pi * doy)),
                solar,
            ],
            axis=-1,
        )
        return aux.astype(np.float32)

    def __getitem__(self, idx):
        x = np.concatenate([self._nodes(idx), self._aux(idx)], axis=-1)
        y = self._nodes(idx + 1)
        return x, y
