"""FGN: Functional Generative Network ensemble forecasting."""

from graph_weather_tpu.models.fgn.model import (
    FunctionalGenerativeNetwork,
    FunctionalGenerativeNetworkConfig,
)

__all__ = ["FunctionalGenerativeNetwork", "FunctionalGenerativeNetworkConfig"]
