"""WeatherMesh-3: conv encoder + 3D neighborhood-attention processors."""

from graph_weather_tpu.models.weathermesh.model import (
    NeighborhoodAttention3D,
    WeatherMesh,
    WeatherMeshConfig,
    WeatherMeshDecoder,
    WeatherMeshDecoderConfig,
    WeatherMeshEncoder,
    WeatherMeshEncoderConfig,
    WeatherMeshOutput,
    WeatherMeshProcessor,
    WeatherMeshProcessorConfig,
)

__all__ = [
    "NeighborhoodAttention3D",
    "WeatherMesh",
    "WeatherMeshConfig",
    "WeatherMeshDecoder",
    "WeatherMeshDecoderConfig",
    "WeatherMeshEncoder",
    "WeatherMeshEncoderConfig",
    "WeatherMeshOutput",
    "WeatherMeshProcessor",
    "WeatherMeshProcessorConfig",
]
