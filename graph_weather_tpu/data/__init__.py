"""Data layer: normalization constants, array store, dataset iterators.

NumPy-first (datasets yield numpy arrays; feed jax.device_put / a prefetch
loop). All loaders work over `FieldStore` (zarr/xarray optional).
"""

from graph_weather_tpu.data.dataloader import AnalysisDataset
from graph_weather_tpu.data.anemoi_dataloader import AnemoiDataset
from graph_weather_tpu.data.gencast_dataloader import (
    BatchedGenCastDataset,
    GenCastDataset,
)
from graph_weather_tpu.data.ifs_dataloader import (
    IFSAnalisysDataset,
    IFSAnalysisDataset,
)
from graph_weather_tpu.data.regional_dataset import RegionalDataset
from graph_weather_tpu.data.store import FieldStore
from graph_weather_tpu.data.weather_station_reader import WeatherStationReader

__all__ = [
    "AnalysisDataset",
    "AnemoiDataset",
    "BatchedGenCastDataset",
    "FieldStore",
    "GenCastDataset",
    "IFSAnalisysDataset",
    "IFSAnalysisDataset",
    "RegionalDataset",
    "WeatherStationReader",
]
