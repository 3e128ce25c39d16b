"""Explicit node-sharded message passing with halo exchange (shard_map).

The GSPMD path (parallel/spatial.py) lets XLA choose the collectives; this
module is the EXPLICIT version for the latent-mesh processor: mesh nodes
are partitioned contiguously across the "model" axis, every device owns the
edges whose RECEIVER lives on it, and each message-passing round exchanges
source-node features with `jax.lax.all_gather` over ICI before computing
its local edge updates and a purely local (receiver-aligned) aggregation.
No psum is needed: receiver-aligned edge ownership makes aggregation local.

Host precompute (`partition_latent_graph`) emits per-shard, equal-size
(padded + masked) edge arrays so the shard_map program is SPMD-uniform.
Numerics match the unsharded `models.layers.Processor` exactly on the same
parameters (see tests/test_parallel.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_weather_tpu.meshes.graphs import GraphBundle


@dataclass(frozen=True)
class PartitionedGraph:
    """Receiver-aligned edge partition of a homogeneous graph.

    Attributes:
        n_nodes: original node count.
        n_pad: padded node count (shards * shard_size).
        shard_size: nodes per shard.
        senders: [D, E_shard] GLOBAL sender ids (0 on padding).
        receivers_local: [D, E_shard] shard-local receiver ids; padded
            edges point at the dummy slot `shard_size`.
        edge_attr: [D, E_shard, F] raw edge features (zeros on padding).
    """

    n_nodes: int
    n_pad: int
    shard_size: int
    senders: np.ndarray
    receivers_local: np.ndarray
    edge_attr: np.ndarray


def partition_latent_graph(bundle: GraphBundle, n_shards: int) -> PartitionedGraph:
    """Split a receiver-sorted graph into receiver-aligned edge shards."""
    n_nodes = bundle.n_receivers
    shard_size = -(-n_nodes // n_shards)
    n_pad = shard_size * n_shards

    shard_of_edge = bundle.receivers // shard_size
    e_shard = max(int(np.bincount(shard_of_edge, minlength=n_shards).max()), 1)

    senders = np.zeros((n_shards, e_shard), dtype=np.int32)
    receivers_local = np.full((n_shards, e_shard), shard_size, dtype=np.int32)
    edge_attr = np.zeros(
        (n_shards, e_shard, bundle.edge_attr.shape[1]), dtype=np.float32
    )
    for d in range(n_shards):
        sel = shard_of_edge == d
        k = int(sel.sum())
        senders[d, :k] = bundle.senders[sel]
        receivers_local[d, :k] = bundle.receivers[sel] - d * shard_size
        edge_attr[d, :k] = bundle.edge_attr[sel]
    return PartitionedGraph(
        n_nodes=n_nodes,
        n_pad=n_pad,
        shard_size=shard_size,
        senders=senders,
        receivers_local=receivers_local,
        edge_attr=edge_attr,
    )


def shard_edge_feats(
    part: PartitionedGraph, bundle: GraphBundle, edge_feats
) -> "jnp.ndarray":
    """Rearrange [E, F] per-edge features into the partition's [D, E_shard, F]
    layout (zeros on padding) — the companion of partition_latent_graph for
    tensors aligned with the ORIGINAL edge order."""
    edge_feats = np.asarray(edge_feats)
    n_shards, e_shard = part.senders.shape
    shard_of_edge = bundle.receivers // part.shard_size
    out = np.zeros((n_shards, e_shard, edge_feats.shape[-1]), edge_feats.dtype)
    for d in range(n_shards):
        sel = shard_of_edge == d
        out[d, : int(sel.sum())] = edge_feats[sel]
    return jnp.asarray(out)


def make_halo_processor(
    part: PartitionedGraph,
    mesh: Mesh,
    node_dim: int,
    edge_dim: int,
    num_blocks: int,
    hidden_dim_node: int = 256,
    hidden_dim_edge: int = 256,
    hidden_layers_node: int = 2,
    hidden_layers_edge: int = 2,
    norm_type: str = "LayerNorm",
    axis: str = "model",
):
    """Build the sharded processor: (block_params, x, edge_feats) -> x'.

    block_params: the unsharded Processor's `GraphProcessor_0` subtree
    (params["params"]["GraphProcessor_0"]).
    x: [B, N, node_dim] node features (unsharded layout; constrained and
    padded internally).
    edge_feats: [D, E_shard, edge_dim] per-shard ENCODED edge features —
    encode the bundle's edge_attr with the latent edge MLP, then rearrange
    with `shard_edge_feats(part, bundle, encoded)`.
    """
    from graph_weather_tpu.nn.graph_blocks import DeviceGraph, GraphProcessorBlock

    if norm_type == "GraphNorm":
        raise ValueError(
            "GraphNorm normalizes over the node/edge axis and would be "
            "computed per-shard here, diverging from the unsharded result; "
            "use LayerNorm/RMSNorm/None."
        )
    n_shards = mesh.shape[axis]
    if part.senders.shape[0] != n_shards:
        raise ValueError(
            f"partition has {part.senders.shape[0]} shards, mesh axis {n_shards}"
        )

    senders_s = jnp.asarray(part.senders)
    receivers_s = jnp.asarray(part.receivers_local)

    block = GraphProcessorBlock(
        node_dim,
        edge_dim,
        hidden_dim_node,
        hidden_dim_edge,
        hidden_layers_node,
        hidden_layers_edge,
        norm_type,
    )

    in_specs = (
        P(),  # params replicated
        P(None, axis, None),  # x nodes sharded
        P(axis, None),  # senders
        P(axis, None),  # receivers_local
        P(axis, None, None),  # encoded edge feats
    )
    out_specs = P(None, axis, None)

    def local(block_params, x_loc, senders, receivers_local, edge_feats):
        senders = senders[0]
        receivers_local = receivers_local[0]
        e = jnp.broadcast_to(
            edge_feats[0], (x_loc.shape[0],) + edge_feats[0].shape
        )
        graph = DeviceGraph(
            senders=senders,
            receivers=receivers_local,
            edge_attr=e[0],
            csr_edge_ids=None,
            csr_mask=None,
            n_senders=part.n_pad,
            n_receivers=part.shard_size + 1,  # dummy swallows padded edges
        )
        for i in range(num_blocks):
            # Halo exchange each round: updated sources live on all shards.
            x_full = jax.lax.all_gather(x_loc, axis, axis=1, tiled=True)
            x_dst = jnp.concatenate([x_loc, jnp.zeros_like(x_loc[:, :1])], axis=1)
            x_dst, e = block.apply(
                {"params": block_params[f"GraphProcessorBlock_{i}"]},
                x_full,
                x_dst,
                e,
                graph,
            )
            x_loc = x_dst[:, : part.shard_size]
        return x_loc

    smapped = shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )

    def fn(block_params, x, edge_feats):
        b, n, f = x.shape
        pad = part.n_pad - n
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(None, axis, None))
        )
        out = smapped(block_params, x, senders_s, receivers_s, edge_feats)
        return out[:, :n]

    return fn
