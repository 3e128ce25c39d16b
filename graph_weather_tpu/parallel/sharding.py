"""Mesh construction and sharding rules.

Strategy (round-1 scope):
  * "data" axis: batch dimension (pure DP; gradients psum over ICI by jit).
  * "model" axis: FSDP-style parameter sharding — each parameter leaf is
    sharded along its largest divisible axis; XLA all-gathers shards on use
    and reduce-scatters gradients (ZeRO-3 analogue, replacing the
    reference's DeepSpeed stage-3 dependency).

Mesh-node (spatial) sharding with halo exchange is the planned "sequence
parallel" analogue for very large grids (see parallel/halo.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, data_axis: int | None = None
) -> Mesh:
    """Create a ("data", "model") device mesh.

    By default splits devices into the most square (data, model) grid with
    data >= model, preferring powers of two.
    """
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    devices = devices[:n]
    if data_axis is None:
        data_axis = 1
        d = 1
        while (d * 2) * (n // (d * 2)) == n and d * 2 <= n // (d * 2):
            d *= 2
        data_axis = d
        # Fall back to (n, 1) when n is prime/odd.
        if n % data_axis != 0:
            data_axis = n
    model_axis = n // data_axis
    dev_array = np.asarray(devices).reshape(data_axis, model_axis)
    return Mesh(dev_array, axis_names=("data", "model"))


def _leaf_spec(shape: tuple[int, ...], model_size: int) -> P:
    """Shard the largest axis divisible by the model-axis size; else replicate."""
    if model_size <= 1 or not shape:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for ax in order:
        if shape[ax] % model_size == 0 and shape[ax] >= model_size:
            spec = [None] * len(shape)
            spec[ax] = "model"
            return P(*spec)
    return P()


def sharding_for_tree(tree, mesh: Mesh):
    """NamedShardings for every leaf of an (abstract or concrete) pytree."""
    model_size = mesh.shape["model"]

    def rule(leaf):
        return NamedSharding(mesh, _leaf_spec(tuple(leaf.shape), model_size))

    return jax.tree_util.tree_map(rule, tree)


def shard_params_fsdp(params, mesh: Mesh):
    """Place a parameter pytree with FSDP-style sharding over "model"."""
    shardings = sharding_for_tree(params, mesh)
    return jax.device_put(params, shardings)


def shard_batch(batch, mesh: Mesh):
    """Place a batch pytree with the leading axis sharded over "data".

    Multi-host: each process passes its LOCAL slice of the global batch
    (global = local * process_count); the global Array is assembled via
    `jax.make_array_from_process_local_data` without cross-host copies.
    """
    from graph_weather_tpu.parallel.multihost import place_process_batch

    procs = jax.process_count()
    # Per-process divisibility: the data axis spans processes, so each
    # process's local slice must split over the data-axis devices it hosts.
    local_data = max(mesh.shape["data"] // procs, 1)

    def rule(leaf):
        spec = [None] * leaf.ndim
        if leaf.ndim and leaf.shape[0] % local_data == 0:
            spec[0] = "data"
        return NamedSharding(mesh, P(*spec))

    shardings = jax.tree_util.tree_map(rule, batch)
    return place_process_batch(batch, shardings)
