"""Device-sharded ensemble inference: members split across chips in ONE
XLA program.

Ensemble forecasting (FGN members, GenCast sample draws) is trivially
parallel over members — the production inference pattern is one jitted
program whose member axis is sharded over the device mesh: each chip runs
its members, parameters and the conditioning state stay replicated, and
the stacked output comes back member-sharded (ready for on-device
ensemble statistics, or a `jax.device_get` gather).

The reference parallelizes ensembles with torch processes around the
member loop; here it is a sharding annotation on a vmap and XLA/GSPMD
does the placement.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_ensemble_fn(
    member_fn: Callable,
    mesh: Mesh,
    axis: "str | tuple[str, ...] | None" = None,
) -> Callable:
    """Shard `vmap(member_fn)` over the leading (member) axis.

    Args:
        member_fn: (params, member_input) -> member_output, where
            member_input is a pytree whose leaves carry a leading member
            axis of size E (E must be a multiple of the sharded mesh-axis
            size); params are shared across members.
        mesh: the device mesh.
        axis: mesh axis (or axes) to shard members over. Default: ALL mesh
            axes — inference has no batch/model sharding to preserve, so
            the whole slice works on members.

    Returns a jitted fn(params, member_input) -> [E, ...] output,
    member-sharded. Per-member randomness is just another member input
    (`jax.random.split(key, E)`).
    """
    if axis is None:
        axis = tuple(mesh.axis_names)
    member_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    vmapped = jax.vmap(member_fn, in_axes=(None, 0))

    def fn(params, member_input):
        params = jax.lax.with_sharding_constraint(params, replicated)
        member_input = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, member_sharding),
            member_input,
        )
        out = vmapped(params, member_input)
        return jax.lax.with_sharding_constraint(out, member_sharding)

    return jax.jit(fn)


def sharded_fgn_ensemble(fgn, mesh: Mesh, compute_dtype=None) -> Callable:
    """(params, prev_state, keys[E]) -> [E, B, lon, lat, F_out], members
    sharded over the mesh; `prev_state` replicated."""
    member = fgn.member_fn(compute_dtype=compute_dtype)
    noise_dim = fgn.noise_dimension

    def one(params, key_and_state):
        key, prev_state = key_and_state
        z = jax.random.normal(key, (prev_state.shape[0], noise_dim))
        return member(params, prev_state, z)

    base = make_sharded_ensemble_fn(one, mesh)

    def fn(params, prev_state, keys):
        states = jnp.broadcast_to(
            prev_state[None], (keys.shape[0],) + tuple(prev_state.shape)
        )
        return base(params, (keys, states))

    return fn


def sharded_sampler_ensemble(
    sampler, denoiser, mesh: Mesh, compute_dtype=None
) -> Callable:
    """(params, prev_inputs, keys[E]) -> [E, B, lon, lat, F_out] GenCast
    sample draws, members sharded over the mesh."""
    sample_fn = sampler.sample_fn(denoiser, compute_dtype=compute_dtype)

    def one(params, key_and_prev):
        key, prev = key_and_prev
        return sample_fn(params, key, prev)

    base = make_sharded_ensemble_fn(one, mesh)

    def fn(params, prev_inputs, keys):
        prevs = jnp.broadcast_to(
            prev_inputs[None], (keys.shape[0],) + tuple(prev_inputs.shape)
        )
        return base(params, (keys, prevs))

    return fn
