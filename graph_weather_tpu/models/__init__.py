"""Model registry (public surface mirrors reference graph_weather/models/__init__.py)."""

from graph_weather_tpu.models.analysis import (
    AssimilatorEncoder,
    GraphWeatherAssimilator,
    GraphWeatherAssimilatorConfig,
)
from graph_weather_tpu.models.forecast import (
    GraphWeatherForecaster,
    GraphWeatherForecasterConfig,
)
from graph_weather_tpu.models.graphcast import GraphCast, GraphCastConfig
from graph_weather_tpu.models.layers import Decoder, Encoder, Processor
from graph_weather_tpu.models.losses import AMSENormalizedLoss, NormalizedMSELoss
from graph_weather_tpu.models.regional import (
    BoundaryNudgingLayer,
    RegionalForecaster,
    RegionalForecasterConfig,
)
from graph_weather_tpu.nn.film import FiLMApplier, FiLMGenerator
from graph_weather_tpu.nn.stochastic import StochasticDecompositionLayer
from graph_weather_tpu.models.fengwu_ghr import (
    ImageMetaModel,
    MetaModel,
    WrapperImageModel,
    WrapperMetaModel,
)
from graph_weather_tpu.nn.lora import lora_init, lora_merge

__all__ = [
    "AMSENormalizedLoss",
    "AssimilatorEncoder",
    "BoundaryNudgingLayer",
    "Decoder",
    "Encoder",
    "FiLMApplier",
    "FiLMGenerator",
    "GraphCast",
    "GraphCastConfig",
    "GraphWeatherAssimilator",
    "GraphWeatherAssimilatorConfig",
    "GraphWeatherForecaster",
    "GraphWeatherForecasterConfig",
    "ImageMetaModel",
    "MetaModel",
    "NormalizedMSELoss",
    "Processor",
    "RegionalForecaster",
    "RegionalForecasterConfig",
    "StochasticDecompositionLayer",
    "WrapperImageModel",
    "WrapperMetaModel",
    "lora_init",
    "lora_merge",
]
