"""Autoregressive GenCast forecasting: chained diffusion sampling in one
XLA program.

The reference produces multi-step forecasts by calling the sampler in a
Python loop and rebuilding the conditioning pair on the host between
steps (reference models/gencast/sampler.py:90-128 used per step). Here
the whole trajectory is ONE `lax.scan`: a single compile, device-resident
state, fresh PRNG per step — the same structure as train/rollout.py for
grid models.

Conditioning layout: `prev_inputs` is [B, lon, lat, 2*F_in] — the two
most recent input frames concatenated (gencast_dataloader.py). Each AR
step samples a residual [B, lon, lat, F_out] for the NEXT frame; the
default `update_fn` then shifts the window: frame1 <- frame2, and
frame2's first F_out channels become frame2's fields plus the sampled
residual (residual prediction over the normalized fields), with the
remaining channels (statics + clock features) carried unchanged. Pass a
custom `update_fn(prev_inputs, sample) -> next_prev_inputs` for other
conditioning layouts (e.g. recomputed clock features).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def default_update_fn(prev_inputs: jnp.ndarray, sample: jnp.ndarray) -> jnp.ndarray:
    """Shift the 2-frame conditioning window by one predicted frame."""
    f_in = prev_inputs.shape[-1] // 2
    f_out = sample.shape[-1]
    frame2 = prev_inputs[..., f_in:]
    next_fields = frame2[..., :f_out] + sample
    next_frame = jnp.concatenate([next_fields, frame2[..., f_out:]], axis=-1)
    return jnp.concatenate([frame2, next_frame], axis=-1)


def make_ar_rollout_fn(
    sampler,
    denoiser,
    num_ar_steps: int,
    compute_dtype=None,
    update_fn: Optional[Callable] = None,
    collect: bool = True,
):
    """Build (params, key, prev_inputs) -> residual trajectory.

    Returns [num_ar_steps, B, lon, lat, F_out] when collect=True, else the
    final conditioning window [B, lon, lat, 2*F_in].
    """
    sample_fn = sampler.sample_fn(denoiser, compute_dtype=compute_dtype)
    update = update_fn if update_fn is not None else default_update_fn

    def rollout(params, key, prev_inputs):
        def step(carry, _):
            prev, key = carry
            key, skey = jax.random.split(key)
            sample = sample_fn(params, skey, prev)
            return (update(prev, sample), key), sample if collect else None

        (final, _), traj = jax.lax.scan(
            step, (prev_inputs, key), None, length=num_ar_steps
        )
        return traj if collect else final

    return rollout


def jit_ar_rollout(sampler, denoiser, num_ar_steps: int, **kwargs):
    """Jitted autoregressive sampler rollout (one compile for the whole
    trajectory)."""
    return jax.jit(make_ar_rollout_fn(sampler, denoiser, num_ar_steps, **kwargs))
