"""FengWu-GHR: ViT meta-model with kNN grid interpolation and LoRA."""

from graph_weather_tpu.models.fengwu_ghr.layers import (
    ImageMetaModel,
    KNNInterpolator,
    MetaModel,
    WrapperImageModel,
    WrapperMetaModel,
    knn_interpolate,
    posemb_sincos_2d,
)
from graph_weather_tpu.nn.lora import lora_init, lora_merge

__all__ = [
    "ImageMetaModel",
    "KNNInterpolator",
    "MetaModel",
    "WrapperImageModel",
    "WrapperMetaModel",
    "knn_interpolate",
    "posemb_sincos_2d",
    "lora_init",
    "lora_merge",
]
