"""Multi-host (multi-process) initialization and batch placement.

The reference reaches multiple hosts only through Lightning DDP / DeepSpeed
launchers over NCCL (reference train/era5.py:180-187,
models/gencast/train.py:286-296). The TPU-native equivalent is a single
SPMD program per host: `jax.distributed.initialize` wires the processes
together (coordinator over DCN), after which `jax.devices()` spans the
whole pod/slice and every `Mesh` built from it shards over ICI + DCN
transparently.

Usage (same script on every host):

    from graph_weather_tpu.parallel import distributed_init, make_mesh
    distributed_init()                  # no-op on single-process runs
    mesh = make_mesh()                  # global mesh over all hosts
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger("graph_weather_tpu.parallel")

_initialized = False


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Initialize multi-process JAX if this looks like a multi-host run.

    Safe to call unconditionally:
      * If `jax.distributed` is already initialized, or no multi-process
        context is detectable (no args, no env), it is a no-op.
      * On TPU pods (GKE/Borg/Cloud metadata) `jax.distributed.initialize`
        auto-discovers coordinator/process topology with no args.

    Explicit args or env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID) force initialization — the manual path for bare-metal
    clusters.

    Returns True iff the distributed runtime was (or already is) live.
    """
    global _initialized
    if _initialized:
        return True

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    explicit = coordinator_address is not None
    auto_tpu = (
        not explicit
        and jax.default_backend() == "tpu"
        and os.environ.get("TPU_WORKER_HOSTNAMES")  # multi-host TPU topology
    )
    if not explicit and not auto_tpu:
        if num_processes not in (None, 1):
            raise ValueError(
                "num_processes > 1 requires a coordinator_address (or "
                "JAX_COORDINATOR_ADDRESS) so processes can rendezvous"
            )
        return False  # single-process run; nothing to do

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def place_process_batch(batch, sharding_tree):
    """Assemble a globally-sharded batch from per-process local shards.

    Single-process: plain device_put. Multi-process: each host passes ITS
    slice of the global batch (global_batch = process_count * local_batch)
    and `jax.make_array_from_process_local_data` stitches the global Array
    without any cross-host copy of the data itself.
    """
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding_tree)
    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(s, x),
        batch,
        sharding_tree,
    )
