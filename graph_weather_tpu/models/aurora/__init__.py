"""Aurora: point-cloud foundation-model components.

Equivalent of reference models/aurora/: order-invariant point encoder,
self-attention processor, point decoder, EarthSystemLoss, plus the
standalone Swin3DEncoder / PerceiverProcessor / Decoder3D modules and the
tiny/base/large config factory.
"""

from graph_weather_tpu.models.aurora.model import (
    AuroraModel,
    EarthSystemLoss,
    PointCloudProcessor,
    PointDecoder,
    PointEncoder,
)
from graph_weather_tpu.models.aurora.modules import (
    Decoder3D,
    PerceiverProcessor,
    ProcessorConfig,
    Swin3DEncoder,
)

__all__ = [
    "AuroraModel",
    "EarthSystemLoss",
    "PointCloudProcessor",
    "PointDecoder",
    "PointEncoder",
    "Decoder3D",
    "PerceiverProcessor",
    "ProcessorConfig",
    "Swin3DEncoder",
    "MODEL_CONFIGS",
    "create_model",
    "create_loss",
]

# Default configurations for different model sizes (reference
# models/aurora/__init__.py:24-50). Keys are mapped onto AuroraModel's
# constructor (the reference passes them through unmapped, which raises;
# deliberately fixed here).
MODEL_CONFIGS = {
    "tiny": {
        "input_features": 1,
        "output_features": 1,
        "latent_dim": 256,
        "max_seq_len": 2048,
    },
    "base": {
        "input_features": 1,
        "output_features": 1,
        "latent_dim": 512,
        "max_seq_len": 4096,
    },
    "large": {
        "input_features": 1,
        "output_features": 1,
        "latent_dim": 1024,
        "max_seq_len": 8192,
    },
}


def create_model(config: str = "base", **kwargs) -> AuroraModel:
    """Create an AuroraModel from a named size configuration."""
    if config not in MODEL_CONFIGS:
        raise ValueError(
            f"Unknown configuration: {config}. Choose from {list(MODEL_CONFIGS.keys())}"
        )
    model_config = MODEL_CONFIGS[config].copy()
    model_config.update(kwargs)
    return AuroraModel(**model_config)


def create_loss(alpha: float = 0.5, beta: float = 0.3, gamma: float = 0.2):
    """Create an EarthSystemLoss with the given weights."""
    return EarthSystemLoss(alpha=alpha, beta=beta, gamma=gamma)
