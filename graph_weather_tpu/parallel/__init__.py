"""Device-mesh parallelism: DP batch sharding + FSDP-style param sharding.

The reference delegates all distribution to Lightning DDP / DeepSpeed over
NCCL (reference models/gencast/train.py:286-296, train/deepspeed_graph.py:
103-107). Here parallelism is first-class JAX: a `jax.sharding.Mesh` with
("data", "model") axes, batch sharded over "data", parameters sharded over
"model" (ZeRO-3 analogue), and XLA GSPMD inserting the ICI collectives.
"""

from graph_weather_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
    shard_params_fsdp,
    sharding_for_tree,
)
from graph_weather_tpu.parallel.halo import (
    make_halo_processor,
    partition_latent_graph,
)
from graph_weather_tpu.parallel.ensemble import (
    make_sharded_ensemble_fn,
    sharded_fgn_ensemble,
    sharded_sampler_ensemble,
)
from graph_weather_tpu.parallel.forecaster import make_spatial_forward
from graph_weather_tpu.parallel.gencast_spatial import (
    make_block_sharded_denoiser_fwd,
)
from graph_weather_tpu.parallel.multihost import (
    distributed_init,
    place_process_batch,
)
from graph_weather_tpu.parallel.spatial import node_sharded_forward

__all__ = [
    "distributed_init",
    "make_block_sharded_denoiser_fwd",
    "make_halo_processor",
    "make_mesh",
    "make_sharded_ensemble_fn",
    "make_spatial_forward",
    "partition_latent_graph",
    "node_sharded_forward",
    "place_process_batch",
    "shard_batch",
    "shard_params_fsdp",
    "sharded_fgn_ensemble",
    "sharded_sampler_ensemble",
    "sharding_for_tree",
]
