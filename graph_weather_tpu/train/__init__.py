"""Unified training harness (replaces the reference's six ad-hoc scripts)."""

from graph_weather_tpu.train.optim import cosine_warmup_schedule, make_optimizer
from graph_weather_tpu.train.step import make_train_step

__all__ = ["cosine_warmup_schedule", "make_optimizer", "make_train_step"]
