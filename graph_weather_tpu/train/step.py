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
):
    """Build `(params, opt_state, inputs, targets) -> (params, opt_state, loss)`.

    forward_fn: (params, inputs) -> predictions.
    loss_fn: (predictions, targets) -> scalar.
    """

    def train_step(params, opt_state, inputs, targets):
        def objective(p):
            return loss_fn(forward_fn(p, inputs), targets)

        loss, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
