"""graph_weather_tpu: a TPU-native (JAX/XLA/Pallas) weather-ML framework.

Re-designed from scratch for TPU hardware with the capabilities of
openclimatefix/graph_weather: graph-based global forecasting, data
assimilation, diffusion ensembles (GenCast/FGN/GenDA), attention
forecasters (WeatherMesh/CaFA/Aurora/FengWu-GHR), and regional models.
"""

from graph_weather_tpu.data.nnja_ai import SensorDataset
from graph_weather_tpu.data.weather_station_reader import WeatherStationReader
from graph_weather_tpu.models.analysis import (
    GraphWeatherAssimilator,
    GraphWeatherAssimilatorConfig,
)
from graph_weather_tpu.models.forecast import (
    GraphWeatherForecaster,
    GraphWeatherForecasterConfig,
)
from graph_weather_tpu.models.losses import AMSENormalizedLoss, NormalizedMSELoss

__version__ = "0.1.0"

__all__ = [
    "AMSENormalizedLoss",
    "GraphWeatherAssimilator",
    "GraphWeatherAssimilatorConfig",
    "GraphWeatherForecaster",
    "GraphWeatherForecasterConfig",
    "NormalizedMSELoss",
    "SensorDataset",
    "WeatherStationReader",
]
