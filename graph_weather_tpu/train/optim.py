"""Optimizers and schedules.

Defaults mirror the reference recipes: AdamW (lr 1e-3, wd 0.1, betas
0.9/0.95) with 1k-step cosine warmup (reference models/gencast/train.py:
26-49, 81-110).
"""

from __future__ import annotations

import optax


def cosine_warmup_schedule(
    peak_lr: float = 1e-3,
    warmup_steps: int = 1000,
    total_steps: int = 100_000,
    end_lr_ratio: float = 0.0,
) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=peak_lr * end_lr_ratio,
    )


def make_optimizer(
    learning_rate=1e-3,
    weight_decay: float = 0.1,
    b1: float = 0.9,
    b2: float = 0.95,
    grad_clip: float | None = 1.0,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW with optional global-norm clipping and gradient accumulation."""
    tx = []
    if grad_clip is not None:
        tx.append(optax.clip_by_global_norm(grad_clip))
    tx.append(
        optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay)
    )
    opt = optax.chain(*tx)
    if accumulate_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accumulate_steps)
    return opt
