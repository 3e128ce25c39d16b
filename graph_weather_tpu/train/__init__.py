"""Unified training harness (replaces the reference's six ad-hoc scripts)."""

from graph_weather_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from graph_weather_tpu.train.rollout import jit_rollout, make_rollout_fn
from graph_weather_tpu.train.serialization import load_params, save_params
from graph_weather_tpu.train.optim import cosine_warmup_schedule, make_optimizer
from graph_weather_tpu.train.step import make_train_step
from graph_weather_tpu.train.trainer import Trainer, TrainerConfig

__all__ = [
    "Trainer",
    "jit_rollout",
    "load_params",
    "make_rollout_fn",
    "save_params",
    "TrainerConfig",
    "cosine_warmup_schedule",
    "make_optimizer",
    "make_train_step",
    "restore_checkpoint",
    "save_checkpoint",
]
