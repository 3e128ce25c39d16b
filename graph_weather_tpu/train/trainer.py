"""Unified Trainer: one harness replacing the reference's six scripts
(train/run.py, run_fulll.py, pl_graph_weather.py, deepspeed_graph.py,
gencast/train.py, era5.py — SURVEY section 2.7).

Features: jitted (optionally donated) train step, cosine-warmup AdamW,
gradient accumulation, bf16 compute policy, NaN-skip guard (reference
train/era5.py:95-96), periodic metrics logging with steps/sec, orbax
checkpointing with resume, optional jax.profiler trace window, and
optional DP/FSDP sharding over a device mesh.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graph_weather_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from graph_weather_tpu.train.optim import cosine_warmup_schedule, make_optimizer
from graph_weather_tpu.train.step import make_train_step

logger = logging.getLogger("graph_weather_tpu.train")


@dataclass
class TrainerConfig:
    peak_lr: float = 1e-3
    warmup_steps: int = 1000
    total_steps: int = 100_000
    weight_decay: float = 0.1
    b1: float = 0.9
    b2: float = 0.95
    grad_clip: Optional[float] = 1.0
    accumulate_steps: int = 1
    bf16_compute: bool = False
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 1000
    log_every: int = 100
    skip_non_finite: bool = True
    profile_steps: Optional[tuple[int, int]] = None  # (start, stop)
    profile_dir: str = "/tmp/graph_weather_tpu_profile"
    sample_every: int = 0  # call sample_hook(step, params) every N steps (0=off)
    shard: bool = False  # DP batch + FSDP params over a device mesh
    multihost: bool = False  # jax.distributed.initialize before meshing


class Trainer:
    """Train any (forward_fn, loss_fn) pair in the framework."""

    def __init__(
        self,
        forward_fn: Callable,
        loss_fn: Callable,
        config: TrainerConfig = TrainerConfig(),
        metrics_hook: Optional[Callable[[int, dict], None]] = None,
        sample_hook: Optional[Callable[[int, object], None]] = None,
    ):
        self.config = config
        self.metrics_hook = metrics_hook
        # Periodic generative-sampling callback (step, params) — the
        # analogue of the reference's per-epoch SamplingCallback (reference
        # models/gencast/train.py:221-239); see
        # wandb_hook.make_gencast_sampling_hook for the image-logging hook.
        self.sample_hook = sample_hook
        if config.multihost:
            # Multi-host SPMD (replaces the reference's Lightning-DDP
            # launcher, reference train/era5.py:180-187): no-op on
            # single-process runs, rendezvous over DCN otherwise.
            from graph_weather_tpu.parallel import distributed_init

            distributed_init()
        schedule = cosine_warmup_schedule(
            peak_lr=config.peak_lr,
            warmup_steps=config.warmup_steps,
            total_steps=config.total_steps,
        )
        self.optimizer = make_optimizer(
            learning_rate=schedule,
            weight_decay=config.weight_decay,
            b1=config.b1,
            b2=config.b2,
            grad_clip=config.grad_clip,
            accumulate_steps=config.accumulate_steps,
        )
        if config.skip_non_finite:
            # Skip updates from non-finite grads INSIDE the step (the
            # reference skips after the fact, train/era5.py:95-96).
            self.optimizer = optax.apply_if_finite(
                self.optimizer, max_consecutive_errors=100
            )
        fwd = forward_fn
        if config.bf16_compute:
            base_fwd = forward_fn

            def _cast16(t):
                return (
                    t.astype(jnp.bfloat16)
                    if jnp.issubdtype(t.dtype, jnp.floating)
                    else t
                )

            def fwd(params, *inputs):
                # Master params stay f32 in the optimizer; compute runs
                # bf16: both params AND inputs must be cast — a single f32
                # operand would promote the matmuls back to f32.
                p16 = jax.tree_util.tree_map(_cast16, params)
                in16 = jax.tree_util.tree_map(_cast16, inputs)
                return base_fwd(p16, *in16).astype(jnp.float32)

        if config.profile_steps is not None:
            start, stop = config.profile_steps
            if stop <= start:
                raise ValueError(
                    f"profile_steps stop ({stop}) must be > start ({start})"
                )

        self._train_step = jax.jit(
            make_train_step(fwd, loss_fn, self.optimizer, return_grad_norm=True),
            donate_argnums=(0, 1),
        )
        self._mesh = None

    def init_state(self, params):
        opt_state = self.optimizer.init(params)
        if self.config.shard:
            from graph_weather_tpu.parallel import make_mesh, sharding_for_tree

            self._mesh = make_mesh()
            params = jax.device_put(params, sharding_for_tree(params, self._mesh))
            opt_state = jax.device_put(
                opt_state, sharding_for_tree(opt_state, self._mesh)
            )
        return params, opt_state

    def _place_batch(self, batch):
        # batch elements may themselves be pytrees (e.g. GenCast packs
        # (noise_levels, residuals) as the loss target)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        if self._mesh is not None:
            from graph_weather_tpu.parallel import shard_batch

            return shard_batch(batch, self._mesh)
        return batch

    def fit(
        self,
        params,
        batches: Iterable,
        num_steps: Optional[int] = None,
        start_step: int = 0,
        opt_state=None,
    ):
        """Run the training loop.

        `batches` yields tuples (*inputs, targets). Returns (params,
        opt_state, history list of metric dicts).
        """
        cfg = self.config
        if opt_state is None:
            params, opt_state = self.init_state(params)
        # The jitted step donates its state buffers; copy once on entry so
        # the caller's pytrees stay valid.
        params = jax.tree_util.tree_map(jnp.copy, params)
        opt_state = jax.tree_util.tree_map(jnp.copy, opt_state)
        history = []
        window_start = time.perf_counter()
        window_steps = 0
        step = start_step

        trace_open = False
        try:
            for batch in batches:
                if num_steps is not None and step >= num_steps:
                    break
                if cfg.profile_steps and step == cfg.profile_steps[0]:
                    jax.profiler.start_trace(cfg.profile_dir)
                    trace_open = True
                if cfg.profile_steps and step == cfg.profile_steps[1]:
                    jax.profiler.stop_trace()
                    trace_open = False
                batch = self._place_batch(batch)
                params, opt_state, loss, gnorm = self._train_step(
                    params, opt_state, *batch
                )
                # No per-step host sync: loss stays on device (async dispatch
                # keeps host batch prep overlapped); apply_if_finite already
                # drops non-finite updates in-graph. Sync only when logging.
                step += 1
                window_steps += 1

                if step % cfg.log_every == 0:
                    loss_val = float(loss)
                    if cfg.skip_non_finite and not np.isfinite(loss_val):
                        logger.warning(
                            "step %d: non-finite loss %s — update was skipped in-graph",
                            step, loss_val,
                        )
                    dt = time.perf_counter() - window_start
                    metrics = {
                        "loss": loss_val,
                        "grad_norm": float(gnorm),
                        "steps_per_sec": window_steps / max(dt, 1e-9),
                    }
                    history.append({"step": step, **metrics})
                    logger.info(
                        "step %d loss %.5f grad_norm %.3f %.2f steps/s",
                        step, metrics["loss"], metrics["grad_norm"],
                        metrics["steps_per_sec"],
                    )
                    if self.metrics_hook:
                        self.metrics_hook(step, metrics)
                    window_start = time.perf_counter()
                    window_steps = 0

                if (
                    self.sample_hook
                    and cfg.sample_every
                    and step % cfg.sample_every == 0
                ):
                    self.sample_hook(step, params)

                if cfg.checkpoint_dir and step % cfg.checkpoint_every == 0:
                    save_checkpoint(
                        cfg.checkpoint_dir, step,
                        {"params": params, "opt_state": opt_state},
                    )
        finally:
            # Training may end (batches exhausted / num_steps / exception)
            # before the configured stop step — flush an open trace.
            if trace_open:
                jax.profiler.stop_trace()
        return params, opt_state, history

    def resume(self, template_params):
        """Restore (step, params, opt_state) from config.checkpoint_dir."""
        if not self.config.checkpoint_dir:
            raise ValueError("TrainerConfig.checkpoint_dir is not set")
        _, opt_template = self.init_state(template_params)
        step, state = restore_checkpoint(
            self.config.checkpoint_dir,
            template={"params": template_params, "opt_state": opt_template},
        )
        return step, state["params"], state["opt_state"]
