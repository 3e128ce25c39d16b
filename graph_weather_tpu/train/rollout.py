"""Autoregressive rollout compiled into a single XLA program.

The reference rolls out by calling the model in a Python loop (README
quickstart; weathermesh2.py:142-144; sampler.py:90-128). Here the rollout
is one `lax.scan`: a single compile, donated state buffers, no host
round-trips between steps — the BASELINE.json north-star structure.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def make_rollout_fn(
    forward_fn: Callable,
    num_steps: int,
    feature_dim: Optional[int] = None,
    collect: bool = True,
):
    """Build (params, features) -> trajectory for an autoregressive model.

    forward_fn maps [B, N, feature+aux] -> [B, N, out]. When the model
    carries aux channels (out < input channels), the aux tail of the input
    is held fixed across steps (the standard quickstart pattern);
    `feature_dim` defaults to the forward output width.

    Returns trajectory [num_steps, B, N, out] when collect=True, else only
    the final state [B, N, out].
    """

    def rollout(params, features):
        f_out = feature_dim
        if f_out is None:
            f_out = jax.eval_shape(forward_fn, params, features).shape[-1]

        def step(state, _):
            pred = forward_fn(params, state)
            new_state = jnp.concatenate([pred, state[..., f_out:]], axis=-1)
            return new_state, pred if collect else None

        final, traj = jax.lax.scan(step, features, None, length=num_steps)
        return traj if collect else final[..., :f_out]

    return rollout


def jit_rollout(forward_fn, num_steps: int, **kwargs):
    """Jitted rollout. (The input is NOT donated: neither output shape can
    alias the [B, N, out+aux] state, so donation would only invalidate the
    caller's array.)"""
    return jax.jit(make_rollout_fn(forward_fn, num_steps, **kwargs))
