"""Jittable training-step factory.

One canonical train step serves every model family: pure function of
(params, opt_state, batch), safe to jit, donate, shard, or wrap in
`lax.scan` for in-graph multi-step training.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax


def make_train_step(
    forward_fn: Callable,
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    return_grad_norm: bool = False,
):
    """Build `(params, opt_state, *inputs, targets) -> (params, opt_state,
    loss[, grad_norm])`.

    forward_fn: (params, *inputs) -> predictions.
    loss_fn: (predictions, targets) -> scalar.
    """

    def train_step(params, opt_state, *batch):
        inputs, targets = batch[:-1], batch[-1]

        def objective(p):
            return loss_fn(forward_fn(p, *inputs), targets)

        loss, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if return_grad_norm:
            return params, opt_state, loss, optax.global_norm(grads)
        return params, opt_state, loss

    return train_step
