"""Spatial (node-axis) sharding: the "sequence parallel" analogue.

The reference has no long-sequence/context parallelism at all (SURVEY
section 5); its scale levers are single-device memory tricks. Here large
node sets shard across the "model" mesh axis: grid-node tensors
[B, N_grid, F] and edge tensors [B, E, F] are partitioned on the node/edge
axis while the small latent mesh stays replicated. Constraints are applied
at the graph boundaries and XLA GSPMD propagates the sharding through the
gather -> MLP -> segment-reduce pipeline, inserting the ICI collectives
(all-gathers of the small mesh features, psums of partial aggregates) —
the scaling-book recipe: pick a mesh, annotate, let XLA do the rest.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def node_sharded_forward(forward_fn, mesh: Mesh, axis: str = "model"):
    """Wrap a (params, features [B, N, F]) forward with node-axis sharding.

    Inputs are constrained to shard N over `axis` (batch over "data" when
    present); outputs are constrained the same way, so autoregressive
    rollouts stay sharded end to end.
    """
    batch_axes = P("data", axis, None) if "data" in mesh.axis_names else P(None, axis, None)

    def fn(params, features):
        features = jax.lax.with_sharding_constraint(
            features, NamedSharding(mesh, batch_axes)
        )
        out = forward_fn(params, features)
        return jax.lax.with_sharding_constraint(out, NamedSharding(mesh, batch_axes))

    return fn
