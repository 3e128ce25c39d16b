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


def make_gencast_sampling_hook(
    denoiser,
    prev_inputs,
    target_residuals,
    channels: tuple[int, ...] = (78, 12),
    channel_names: tuple[str, ...] = ("2m_temperature", "geopotential"),
    num_steps: int = 20,
    log_fn: Optional[Callable[[int, dict], None]] = None,
    compute_dtype=None,
    run=None,
):
    """Periodic diffusion-sampling image logger for Trainer.sample_hook.

    The TPU-native analogue of the reference's per-epoch SamplingCallback
    + plot_sample (reference models/gencast/train.py:189-239): runs the
    full DPMSolver++2S sampler on one held-out conditioning input, renders
    prediction-vs-ground-truth panels for the requested channels, and logs
    them as wandb images (or through an injected `log_fn(step, images)`
    for custom sinks / tests).

    Args:
        denoiser: the models.gencast Denoiser whose params are being
            trained (the handle, not the flax module).
        prev_inputs: [1, lon, lat, 2*f_in] held-out conditioning input.
        target_residuals: [1, lon, lat, f_out] matching ground truth.
        channels: output-channel indices to render.
        channel_names: captions, parallel to `channels`.
        num_steps: sampler steps (reference default 20).
        log_fn: override the wandb image sink; receives (step, {name:
            figure}) and takes ownership of closing the figures.
        compute_dtype: optional bf16 sampling policy.
        run: optional wandb Run to log images into. Pass the same run
            make_wandb_hook logs metrics through — with reinit or multiple
            live runs, the module-level ``wandb.log`` can land images in a
            different (or no) run than the metrics. Defaults to the active
            ``wandb.run`` at log time, falling back to ``wandb.log``.
    """
    import numpy as np

    from graph_weather_tpu.models.gencast import Sampler

    sampler = Sampler(num_steps=num_steps)
    sample_fn = None  # jitted lazily so hook construction stays cheap

    def default_log(step: int, figures: dict) -> None:
        import matplotlib

        del matplotlib
        import wandb

        images = {
            "samples": [
                wandb.Image(fig, caption=name)
                for name, fig in figures.items()
            ]
        }
        target = run if run is not None else wandb.run
        if target is not None:
            target.log(images, step=step)
        else:
            wandb.log(images, step=step)

    sink = log_fn if log_fn is not None else default_log

    def hook(step: int, params) -> None:
        nonlocal sample_fn
        if jax.process_index() != 0:
            return
        if sample_fn is None:
            sample_fn = jax.jit(
                sampler.sample_fn(denoiser, compute_dtype=compute_dtype)
            )
        key = jax.random.PRNGKey(step)
        preds = np.asarray(
            jax.device_get(sample_fn(params, key, prev_inputs))
        )
        target = np.asarray(target_residuals)

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        figures = {}
        for ch, name in zip(channels, channel_names):
            if ch >= preds.shape[-1]:
                continue
            fig, ax = plt.subplots(2)
            for a, (img, title) in zip(
                ax,
                (
                    (preds[0, :, :, ch], "Diffusion sampling prediction"),
                    (target[0, :, :, ch], "Ground truth"),
                ),
            ):
                a.imshow(
                    img.T, origin="lower", cmap="RdBu", vmin=-5, vmax=5
                )
                a.set_xticks([])
                a.set_yticks([])
                a.set_title(title)
            figures[name] = fig
        sink(step, figures)
        if log_fn is None:
            for fig in figures.values():
                plt.close(fig)

    return hook
