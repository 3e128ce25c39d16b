"""Weather-station observation pipeline (reference
data/weather_station_reader.py:39-779).

Pandas-first implementation of the same capability surface: directory
scanning with a processed-file cache, ThreadPoolExecutor multi-file
processing, observation validation (coordinate + physical-range checks),
missing-data interpolation, resampling, WeatherReal-style conversion, and
model-format extraction. Storage is parquet (pandas-native) rather than
NetCDF; SynopticPy fetching is gated on the optional dependency.
"""

from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

# Physical plausibility ranges for common observed variables.
VALID_RANGES = {
    "temperature": (-90.0, 60.0),  # Celsius
    "t2m": (180.0, 340.0),  # Kelvin
    "pressure": (300.0, 1100.0),  # hPa
    "wind_speed": (0.0, 130.0),
    "wind_direction": (0.0, 360.0),
    "humidity": (0.0, 100.0),
    "precipitation": (0.0, 500.0),
}

_WEATHERREAL_COLUMNS = {
    "station": "station_id",
    "station_id": "station_id",
    "id": "station_id",
    "lat": "latitude",
    "latitude": "latitude",
    "lon": "longitude",
    "longitude": "longitude",
    "time": "time",
    "datetime": "time",
    "timestamp": "time",
}


class WeatherStationReader:
    """Scan, validate, and serve irregular station observations."""

    def __init__(
        self,
        data_dir: str,
        cache_dir: Optional[str] = None,
        max_workers: int = 4,
        file_pattern: str = ".csv",
    ):
        self.data_dir = data_dir
        self.cache_dir = cache_dir or os.path.join(data_dir, "_cache")
        os.makedirs(self.cache_dir, exist_ok=True)
        self.max_workers = max_workers
        self.file_pattern = file_pattern
        self._processed: set[str] = set()
        self._frames: Dict[str, pd.DataFrame] = {}

    # -- ingestion ----------------------------------------------------------
    def scan_for_new_observations(self) -> List[str]:
        """Unprocessed observation files under data_dir."""
        found = []
        for root, _, files in os.walk(self.data_dir):
            if os.path.abspath(root).startswith(os.path.abspath(self.cache_dir)):
                continue
            for f in files:
                path = os.path.join(root, f)
                if f.endswith(self.file_pattern) and path not in self._processed:
                    found.append(path)
        return sorted(found)

    def _process_file(self, filepath: str) -> Optional[str]:
        try:
            df = pd.read_csv(filepath)
            df = self._standardize_columns(df)
            df = self.validate_observations(df)
            if df.empty:
                logger.warning("No valid observations in %s", filepath)
                return None
            self._frames[filepath] = df
            self._processed.add(filepath)
            return filepath
        except Exception as e:  # noqa: BLE001 - mirror reference robustness
            logger.error("Failed to process %s: %s", filepath, e)
            return None

    def process_new_observations(self) -> List[str]:
        """Process all new files in parallel; returns successful paths."""
        new_files = self.scan_for_new_observations()
        if not new_files:
            return []
        with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
            results = list(pool.map(self._process_file, new_files))
        return [r for r in results if r is not None]

    @staticmethod
    def _standardize_columns(df: pd.DataFrame) -> pd.DataFrame:
        rename = {
            c: _WEATHERREAL_COLUMNS[c.lower()]
            for c in df.columns
            if c.lower() in _WEATHERREAL_COLUMNS
        }
        df = df.rename(columns=rename)
        if "time" in df.columns:
            df["time"] = pd.to_datetime(df["time"], errors="coerce")
        return df

    # -- quality control ----------------------------------------------------
    def validate_observations(
        self, df: pd.DataFrame, ranges: Optional[dict] = None
    ) -> pd.DataFrame:
        """Drop rows with invalid coordinates; mask out-of-range values."""
        ranges = {**VALID_RANGES, **(ranges or {})}
        if "latitude" in df.columns:
            df = df[(df["latitude"] >= -90) & (df["latitude"] <= 90)]
        if "longitude" in df.columns:
            df = df[(df["longitude"] >= -180) & (df["longitude"] < 360)]
        if "time" in df.columns:
            df = df[df["time"].notna()]
        for col, (lo, hi) in ranges.items():
            if col in df.columns:
                bad = (df[col] < lo) | (df[col] > hi)
                if bad.any():
                    df = df.copy()
                    df.loc[bad, col] = np.nan
        return df.reset_index(drop=True)

    def interpolate_missing_data(
        self, df: pd.DataFrame, method: str = "linear", limit: int = 3
    ) -> pd.DataFrame:
        """Per-station temporal interpolation of missing values."""
        if "station_id" not in df.columns or "time" not in df.columns:
            return df.interpolate(method=method, limit=limit)
        out = []
        for _, g in df.sort_values("time").groupby("station_id"):
            numeric = g.select_dtypes(include=[np.number]).columns
            g = g.copy()
            g[numeric] = g[numeric].interpolate(method=method, limit=limit)
            out.append(g)
        return pd.concat(out, ignore_index=True)

    def resample_observations(self, df: pd.DataFrame, freq: str = "1h") -> pd.DataFrame:
        """Resample each station's series to a regular interval."""
        if "time" not in df.columns:
            raise ValueError("observations need a 'time' column to resample")
        out = []
        keys = ["station_id"] if "station_id" in df.columns else []
        grouped = df.groupby(keys) if keys else [((), df)]
        for key, g in grouped:
            g = g.set_index("time").sort_index()
            numeric = g.select_dtypes(include=[np.number])
            res = numeric.resample(freq).mean().reset_index()
            if keys:
                res["station_id"] = key if np.isscalar(key) else key[0]
            out.append(res)
        return pd.concat(out, ignore_index=True)

    # -- model-facing outputs -------------------------------------------------
    def get_observations_for_model(
        self,
        variables: Optional[List[str]] = None,
        start_time=None,
        end_time=None,
        frames: Optional[List[pd.DataFrame]] = None,
    ) -> Optional[dict]:
        """Observations as model arrays: lat/lon/height + feature matrix.

        Returns {'lat_lon_heights': [N, 3], 'features': [N, F],
        'variables': [...], 'times': [N]} or None when empty. Uses all
        cached/scanned files unless explicit `frames` are given.
        """
        if frames is None:
            self.process_new_observations()
            frames = list(self._frames.values())
        if not frames:
            return None
        df = pd.concat(frames, ignore_index=True)
        if start_time is not None:
            df = df[df["time"] >= pd.Timestamp(start_time)]
        if end_time is not None:
            df = df[df["time"] <= pd.Timestamp(end_time)]
        if df.empty:
            return None
        exclude = {"latitude", "longitude", "time", "station_id", "height"}
        numeric = [
            c
            for c in df.select_dtypes(include=[np.number]).columns
            if c not in exclude
        ]
        variables = variables or numeric
        height = (
            df["height"].to_numpy(np.float32)
            if "height" in df.columns
            else np.zeros(len(df), np.float32)
        )
        lat_lon_heights = np.stack(
            [
                df["latitude"].to_numpy(np.float32),
                df["longitude"].to_numpy(np.float32),
                height,
            ],
            axis=1,
        )
        features = df[variables].to_numpy(np.float32)
        keep = np.isfinite(features).all(axis=1)
        return {
            "lat_lon_heights": lat_lon_heights[keep],
            "features": features[keep],
            "variables": variables,
            "times": df["time"].to_numpy()[keep] if "time" in df.columns else None,
        }

    def convert_to_model_format(self, df: pd.DataFrame) -> Optional[dict]:
        """Single-frame variant: converts ONLY `df` (no cached frames)."""
        frame = self.validate_observations(self._standardize_columns(df))
        return self.get_observations_for_model(frames=[frame])

    # -- WeatherReal format ----------------------------------------------------
    def convert_to_weatherreal(self, df: pd.DataFrame) -> pd.DataFrame:
        """Standardized long-format frame (station, time, lat, lon, vars)."""
        df = self._standardize_columns(df)
        required = ["station_id", "time", "latitude", "longitude"]
        for col in required:
            if col not in df.columns:
                df[col] = np.nan
        ordered = required + [c for c in df.columns if c not in required]
        return df[ordered]

    def convert_files_to_weatherreal(
        self, input_files: List[str], output_dir: str
    ) -> List[str]:
        """Convert CSV files to WeatherReal-style parquet; returns outputs."""
        os.makedirs(output_dir, exist_ok=True)
        outputs = []
        for path in input_files:
            try:
                df = self.convert_to_weatherreal(pd.read_csv(path))
                out = os.path.join(
                    output_dir,
                    os.path.splitext(os.path.basename(path))[0] + "_weatherreal.parquet",
                )
                df.to_parquet(out)
                outputs.append(out)
            except Exception as e:  # noqa: BLE001
                logger.error("WeatherReal conversion failed for %s: %s", path, e)
        return outputs

    def read_weatherreal_file(self, filepath: str) -> Optional[pd.DataFrame]:
        try:
            return pd.read_parquet(filepath)
        except Exception as e:  # noqa: BLE001
            logger.error("Failed to read %s: %s", filepath, e)
            return None

    def integrate_with_weatherreal(
        self, observations: Optional[pd.DataFrame], output_path: str
    ) -> Optional[str]:
        """Save observations in WeatherReal-Benchmark-compatible layout
        (reference data/weather_station_reader.py:711-746): standardize
        columns, ensure the output directory, write, return the path (or
        None on failure/empty input)."""
        if observations is None or len(observations) == 0:
            logger.warning("No observations to save")
            return None
        try:
            df = self.convert_to_weatherreal(observations)
            os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
            df.to_parquet(output_path)
            logger.info("Saved WeatherReal-compatible data to %s", output_path)
            return output_path
        except Exception as e:  # noqa: BLE001
            logger.error("Error saving WeatherReal data: %s", e)
            return None

    # -- SynopticPy (optional network source) -----------------------------------
    def initialize_synopticpy(
        self, token: Optional[str] = None, token_path: Optional[str] = None
    ) -> bool:
        """Store/validate a SynopticPy API token for later fetches
        (reference data/weather_station_reader.py:476-511). Returns False
        (with a warning) when the package is missing or no token resolves,
        True on success."""
        try:
            try:
                import synoptic  # noqa: F401
            except ImportError:
                logger.warning(
                    "SynopticPy package is not installed - synoptic "
                    "functionality unavailable"
                )
                return False
            if token_path and not token:
                with open(token_path) as f:
                    token = f.read().strip()
            if not token:
                logger.warning("No token provided for SynopticPy initialization")
                return False
            self._synoptic_token = token
            os.environ.setdefault("SYNOPTIC_TOKEN", token)
            logger.info("SynopticPy client initialized successfully")
            return True
        except Exception as e:  # noqa: BLE001
            logger.error("Error initializing SynopticPy: %s", e)
            return False

    def fetch_from_synopticpy(self, **kwargs) -> Optional[pd.DataFrame]:
        """Fetch live observations via SynopticPy when installed."""
        try:
            import synoptic  # noqa: F401
        except ImportError:
            logger.warning("SynopticPy not installed; skipping network fetch")
            return None
        from synoptic import TimeSeries

        token = getattr(self, "_synoptic_token", None)
        if token is not None:
            kwargs.setdefault("token", token)
        df = TimeSeries(**kwargs).df()
        return self._standardize_columns(df)
