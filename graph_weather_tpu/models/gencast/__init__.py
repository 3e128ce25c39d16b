"""GenCast: graph-diffusion ensemble forecasting (TPU-native).

Public surface mirrors the reference gencast package
(reference models/gencast/__init__.py): Denoiser, Sampler, WeightedMSELoss,
graph building, and noise utilities.
"""

from graph_weather_tpu.models.gencast.denoiser import (
    Denoiser,
    DenoiserConfig,
    Preconditioner,
)
from graph_weather_tpu.models.gencast.graphs import (
    GraphCastGraphs,
    build_graphcast_graphs,
)
from graph_weather_tpu.models.gencast.noise import sample_noise_level
from graph_weather_tpu.models.gencast.rollout import (
    jit_ar_rollout,
    make_ar_rollout_fn,
)
from graph_weather_tpu.models.gencast.sampler import Sampler
from graph_weather_tpu.models.gencast.weighted_mse_loss import WeightedMSELoss
from graph_weather_tpu.ops.sht import generate_isotropic_noise

__all__ = [
    "Denoiser",
    "DenoiserConfig",
    "GraphCastGraphs",
    "Preconditioner",
    "Sampler",
    "WeightedMSELoss",
    "build_graphcast_graphs",
    "generate_isotropic_noise",
    "jit_ar_rollout",
    "make_ar_rollout_fn",
    "sample_noise_level",
]
