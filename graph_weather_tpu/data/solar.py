"""Top-of-atmosphere solar irradiance (replaces the pysolar dependency).

The reference's AnalysisDataset uses pysolar's direct radiation at +-12 h
hourly offsets as input channels (reference data/dataloader.py). Here TOA
irradiance is computed from first principles: S = S0 * E0 * max(cos Z, 0),
with the solar declination/equation-of-time from the standard Spencer
(1971) Fourier fits — accurate to ~0.1 deg, vectorized over points/times.
"""

from __future__ import annotations

import numpy as np

SOLAR_CONSTANT = 1361.0  # W / m^2


def _day_fraction_angle(times: np.ndarray) -> np.ndarray:
    """Spencer day angle (radians) from datetime64 array."""
    day = times.astype("datetime64[D]")
    year = times.astype("datetime64[Y]")
    doy = (day - year).astype(np.float64)
    hours = (times - day.astype("datetime64[s]")).astype("timedelta64[s]").astype(
        np.float64
    ) / 3600.0
    return 2.0 * np.pi * (doy + (hours - 12.0) / 24.0) / 365.0


def solar_declination(times: np.ndarray) -> np.ndarray:
    """Solar declination in radians (Spencer 1971)."""
    g = _day_fraction_angle(times)
    return (
        0.006918
        - 0.399912 * np.cos(g)
        + 0.070257 * np.sin(g)
        - 0.006758 * np.cos(2 * g)
        + 0.000907 * np.sin(2 * g)
        - 0.002697 * np.cos(3 * g)
        + 0.00148 * np.sin(3 * g)
    )


def equation_of_time_minutes(times: np.ndarray) -> np.ndarray:
    g = _day_fraction_angle(times)
    return 229.18 * (
        0.000075
        + 0.001868 * np.cos(g)
        - 0.032077 * np.sin(g)
        - 0.014615 * np.cos(2 * g)
        - 0.040849 * np.sin(2 * g)
    )


def earth_sun_distance_factor(times: np.ndarray) -> np.ndarray:
    g = _day_fraction_angle(times)
    return (
        1.00011
        + 0.034221 * np.cos(g)
        + 0.00128 * np.sin(g)
        + 0.000719 * np.cos(2 * g)
        + 0.000077 * np.sin(2 * g)
    )


def toa_irradiance(
    lat_deg: np.ndarray, lon_deg: np.ndarray, times: np.ndarray
) -> np.ndarray:
    """[T, N] TOA irradiance (W/m^2) for N points at T UTC times."""
    times = np.atleast_1d(np.asarray(times, dtype="datetime64[s]"))
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lon = np.asarray(lon_deg, dtype=np.float64)

    decl = solar_declination(times)[:, None]  # [T, 1]
    eot = equation_of_time_minutes(times)[:, None]
    e0 = earth_sun_distance_factor(times)[:, None]

    day = times.astype("datetime64[D]")
    utc_hours = (
        (times - day.astype("datetime64[s]")).astype("timedelta64[s]").astype(np.float64)
        / 3600.0
    )[:, None]
    solar_time = utc_hours + lon[None, :] * 4.0 / 60.0 + eot / 60.0
    hour_angle = np.deg2rad((solar_time - 12.0) * 15.0)

    cos_z = np.sin(lat[None, :]) * np.sin(decl) + np.cos(lat[None, :]) * np.cos(
        decl
    ) * np.cos(hour_angle)
    return (SOLAR_CONSTANT * e0 * np.maximum(cos_z, 0.0)).astype(np.float32)
