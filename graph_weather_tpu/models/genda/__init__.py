"""GenDA: generative data assimilation (diffusion + sensor conditioning)."""

from graph_weather_tpu.models.genda.model import GenDA, GenDAConfig

__all__ = ["GenDA", "GenDAConfig"]
