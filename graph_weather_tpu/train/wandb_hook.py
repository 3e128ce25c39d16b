"""Weights & Biases metrics hook for the Trainer.

Replaces the reference's `WandbLogger` usage (reference
models/gencast/train.py:221-296) with a plain `metrics_hook` callable —
the Trainer stays logger-agnostic; wandb is an optional dependency gated
at hook-construction time.

Usage:

    trainer = Trainer(fwd, loss, cfg, metrics_hook=make_wandb_hook(
        project="graph-weather-tpu", config={"model": "forecaster"}))
"""

from __future__ import annotations

from typing import Callable, Optional

import jax


def make_wandb_hook(
    project: str,
    config: Optional[dict] = None,
    run_name: Optional[str] = None,
    **init_kwargs,
) -> Callable[[int, dict], None]:
    """Create a Trainer metrics_hook that logs to a wandb run.

    Only process 0 logs on multi-host runs (each host executes the same
    SPMD program; metrics are identical across processes). The run is
    initialized lazily on the first logged step and finished atexit.
    """
    try:
        import wandb
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "wandb is not installed; install it or use a custom metrics_hook"
        ) from e

    state = {"run": None}

    def hook(step: int, metrics: dict) -> None:
        if jax.process_index() != 0:
            return
        if state["run"] is None:
            state["run"] = wandb.init(
                project=project, config=config, name=run_name, **init_kwargs
            )
            import atexit

            atexit.register(state["run"].finish)
        state["run"].log(metrics, step=step)

    return hook
