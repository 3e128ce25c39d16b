"""Data layer tests: constants, FieldStore, all dataset classes.

Mirrors the reference's synthetic-data strategy (tests/test_anemoi.py,
test_regional_dataset.py, test_nnjai.py with mocks) — everything runs on
in-memory FieldStores, no network or optional deps.
"""

import numpy as np
import pandas as pd
import pytest

from graph_weather_tpu.data import (
    AnalysisDataset,
    AnemoiDataset,
    BatchedGenCastDataset,
    FieldStore,
    GenCastDataset,
    IFSAnalysisDataset,
    RegionalDataset,
    WeatherStationReader,
)
from graph_weather_tpu.data import const
from graph_weather_tpu.data.solar import toa_irradiance


class TestConstants:
    def test_tables_load(self):
        assert len(const.FORECAST_MEANS) > 600
        assert len(const.ERA5_MEANS["temperature"]) == 13
        assert const.SOLAR_MIN == 0.0
        assert len(const.ANALYSIS_MEANS) == 0


class TestSolar:
    def test_night_is_zero_day_positive(self):
        times = np.array(["2020-06-21T12:00"], dtype="datetime64[s]")
        # local noon at lon 0: sunny at equator; midnight at lon 180: dark
        irr = toa_irradiance([0.0, 0.0], [0.0, 180.0], times)
        assert irr[0, 0] > 1000.0
        assert irr[0, 1] == 0.0

    def test_polar_summer_vs_winter(self):
        summer = toa_irradiance([80.0], [0.0], np.array(["2020-06-21T12:00"], "datetime64[s]"))
        winter = toa_irradiance([80.0], [0.0], np.array(["2020-12-21T12:00"], "datetime64[s]"))
        assert summer[0, 0] > 100.0 and winter[0, 0] == 0.0


@pytest.fixture(scope="module")
def store():
    return FieldStore.synthetic(
        num_times=10, num_lon=32, num_lat=16,
        atmospheric=("temperature", "u_component_of_wind"),
        single=("2m_temperature",), static=("land_sea_mask",),
    )


class TestGenCastDataset:
    def test_shapes(self, store):
        ds = GenCastDataset(
            store,
            atmospheric_features=["temperature", "u_component_of_wind"],
            single_features=["2m_temperature"],
            static_features=["land_sea_mask"],
            max_year=2030,
        )
        corrupted, prev, noise, residuals = ds[0]
        f_out = 2 * 2 + 1  # 2 atm x 2 levels + 1 single
        f_in = f_out + 1 + 4  # + static + clock
        assert residuals.shape == (32, 16, f_out)
        assert corrupted.shape == (32, 16, f_out)
        assert prev.shape == (32, 16, 2 * f_in)
        assert noise.shape == (1,)
        assert len(ds) > 0
        assert not np.isnan(prev).any()

    def test_corruption_consistency(self, store):
        ds = GenCastDataset(
            store, ["temperature"], ["2m_temperature"], ["land_sea_mask"],
            max_year=2030,
        )
        corrupted, _, noise, residuals = ds[1]
        # corruption = residual + sigma * unit-variance noise
        diff_std = np.std(corrupted - residuals)
        assert 0.3 * noise[0] < diff_std < 3.0 * noise[0]

    def test_batched(self, store):
        ds = BatchedGenCastDataset(
            store, ["temperature"], ["2m_temperature"], ["land_sea_mask"],
            batch_size=3, max_year=2030,
        )
        corrupted, prev, noise, residuals = ds[0]
        assert corrupted.shape[0] == 3 and noise.shape == (3, 1)


class TestAnalysisDataset:
    def test_aux_channels(self, store):
        ds = AnalysisDataset(store, features=["2m_temperature"])
        x, y = ds[0]
        n = 16 * 32
        assert x.shape == (n, 1 + 6 + 25)  # feature + latlon/doy + 25 solar
        assert y.shape == (n, 1)
        assert np.isfinite(x).all()


class TestAnemoiDataset:
    def test_over_fieldstore(self, store):
        ds = AnemoiDataset(
            store, features=["2m_temperature"],
            means={"2m_temperature": 0.0}, stds={"2m_temperature": 1.0},
        )
        x, y = ds[0]
        assert x.shape[-1] == 1 + 4 and y.shape[-1] == 1

    def test_missing_stats_raise(self, store):
        with pytest.raises(ValueError):
            AnemoiDataset(store, features=["2m_temperature"], means={}, stds={})


class TestIFSDataset:
    def test_pairs(self):
        s = FieldStore.synthetic(
            num_times=6, num_lon=12, num_lat=8, levels=(500.0, 700.0, 850.0),
            atmospheric=("t",), single=(), static=(),
        )
        # reorder dims to (time, level, latitude, longitude) handled internally
        ds = IFSAnalysisDataset(s, features=["t"], start_year=2016, end_year=2022)
        x, y = ds[0]
        assert x.shape == (8 * 12, 3)
        assert y.shape == (8 * 12, 3)


class TestRegionalDataset:
    def test_movable_boxes(self):
        rng = np.random.default_rng(0)
        nt, nlat, nlon = 4, 60, 120
        coords = {
            "time": np.datetime64("2020-01-01") + np.arange(nt) * np.timedelta64(6, "h"),
            "latitude": np.linspace(-60, 60, nlat),
            "longitude": np.linspace(0, 359, nlon),
        }
        variables = {
            v: (("time", "latitude", "longitude"),
                rng.normal(size=(nt, nlat, nlon)).astype(np.float32))
            for v in ("t2m", "u10")
        }
        store = FieldStore(coords=coords, variables=variables)
        ds = RegionalDataset(
            dataset=store, variables=["t2m", "u10"], extent_deg=20.0,
            max_points=50, mean={"t2m": 0, "u10": 0}, std={"t2m": 1, "u10": 1},
        )
        feats, lat_lons, target, gctx = ds[0]
        assert feats.shape == (50, 2) and target.shape == (50, 2)
        assert gctx.shape == (50, 2)
        assert len(lat_lons) == 50
        # different idx -> different box (seeded)
        _, ll2, _, _ = ds[1]
        assert lat_lons != ll2


class TestWeatherStationReader:
    def test_csv_pipeline(self, tmp_path):
        df = pd.DataFrame({
            "station": ["A"] * 5 + ["B"] * 5,
            "lat": [10.0] * 5 + [200.0] * 5,  # station B has invalid lat
            "lon": [20.0] * 10,
            "time": pd.date_range("2020-01-01", periods=5, freq="1h").tolist() * 2,
            "temperature": [15, np.nan, 17, 400.0, 19] * 2,  # 400 C invalid
        })
        (tmp_path / "obs").mkdir()
        df.to_csv(tmp_path / "obs" / "stations.csv", index=False)
        reader = WeatherStationReader(str(tmp_path / "obs"))
        processed = reader.process_new_observations()
        assert len(processed) == 1
        out = reader.get_observations_for_model()
        assert out is not None
        # only station A rows with finite temperature survive
        assert out["features"].shape[1] == 1
        assert (np.abs(out["lat_lon_heights"][:, 0]) <= 90).all()
        assert np.isfinite(out["features"]).all()
        # re-scan: nothing new
        assert reader.process_new_observations() == []

    def test_interpolate_and_resample(self, tmp_path):
        reader = WeatherStationReader(str(tmp_path))
        df = pd.DataFrame({
            "station_id": ["A"] * 4,
            "time": pd.date_range("2020-01-01", periods=4, freq="2h"),
            "temperature": [10.0, np.nan, 14.0, 16.0],
        })
        interp = reader.interpolate_missing_data(df)
        assert np.isfinite(interp["temperature"]).all()
        res = reader.resample_observations(interp, freq="1h")
        assert len(res) == 7  # 6h span hourly

    def test_weatherreal_roundtrip(self, tmp_path):
        df = pd.DataFrame({
            "id": ["X"], "lat": [1.0], "lon": [2.0],
            "time": [pd.Timestamp("2020-01-01")], "temperature": [10.0],
        })
        src = tmp_path / "one.csv"
        df.to_csv(src, index=False)
        reader = WeatherStationReader(str(tmp_path))
        outs = reader.convert_files_to_weatherreal([str(src)], str(tmp_path / "wr"))
        assert len(outs) == 1
        back = reader.read_weatherreal_file(outs[0])
        assert back is not None and "station_id" in back.columns

    def test_integrate_with_weatherreal(self, tmp_path):
        """Mirrors reference data/weather_station_reader.py:711-746:
        saves a WeatherReal-compatible file, returns the path; None on
        empty input."""
        reader = WeatherStationReader(str(tmp_path))
        df = pd.DataFrame({
            "id": ["X", "Y"], "lat": [1.0, 2.0], "lon": [3.0, 4.0],
            "time": pd.to_datetime(["2020-01-01", "2020-01-02"]),
            "temperature": [10.0, 11.0],
        })
        out = reader.integrate_with_weatherreal(
            df, str(tmp_path / "wr" / "obs.parquet")
        )
        assert out is not None
        back = reader.read_weatherreal_file(out)
        assert list(back.columns[:4]) == [
            "station_id", "time", "latitude", "longitude"
        ]
        assert reader.integrate_with_weatherreal(None, str(tmp_path / "x")) is None
        assert reader.integrate_with_weatherreal(
            df.iloc[:0], str(tmp_path / "y")
        ) is None

    def test_initialize_synopticpy(self, tmp_path):
        """Returns False without the optional synoptic package (reference
        :476-511 semantics); token-file reading is exercised via the
        token_path argument when the package IS available."""
        reader = WeatherStationReader(str(tmp_path))
        token_file = tmp_path / "token.txt"
        token_file.write_text("abc123\n")
        try:
            import synoptic  # noqa: F401
            has_synoptic = True
        except ImportError:
            has_synoptic = False
        got = reader.initialize_synopticpy(token_path=str(token_file))
        assert got is has_synoptic
        if has_synoptic:
            assert reader._synoptic_token == "abc123"
        # no token at all -> always False
        assert reader.initialize_synopticpy() is False
