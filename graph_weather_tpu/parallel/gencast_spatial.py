"""Block-sharded GenCast denoiser forward (shard_map over cluster blocks).

The clustered attention layout (meshes/clustering.py) already partitions
mesh vertices into compact geodesic receiver blocks — exactly the right
unit of model-parallel decomposition for the k-hop processor, which is
the dominant cost of the denoiser at production scale. This module runs:

  * encoder / decoder replicated (they are a few ms and touch grid-side
    graphs; sharding them is parallel/forecaster.py's territory);
  * the 16-block processor sharded over the "model" mesh axis: each
    device owns a contiguous range of receiver blocks (its cluster_ids /
    masks slices), queries, skip connections, gates and conditional
    norms are computed on LOCAL rows only, and each layer all-gathers
    the current node features over ICI so keys/values cover every
    union member (`kv_source`, models/gencast/modules.py). The
    all-gather is [B, N_pad, H] — 42 MB bf16 at splits 6 — once per
    layer; its autodiff transpose is the matching reduce-scatter.

Parameters stay replicated and the parameter TREE is the unsharded
Denoiser's — the same checkpoint runs sharded or not, and outputs match
the unsharded forward (tests/test_parallel.py).

Reference analogue being replaced: none — the reference's only answer to
processor scale is gradient checkpointing and DGL sparse attention on
one device (SURVEY §5 long-context row).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_weather_tpu.models.gencast.layers import (
    GenCastDecoder,
    GenCastEncoder,
)
from graph_weather_tpu.models.gencast.modules import (
    CondTransformerBlock,
    FourierEmbedding,
)
from graph_weather_tpu.models.gencast.denoiser import Preconditioner
from graph_weather_tpu.nn.graph_blocks import DeviceGraph


def _padded_cluster_slices(khop: DeviceGraph, n_shards: int):
    """Pad the cluster layout to a shard-divisible number of blocks.

    Extra blocks have all-zero masks (exact-zero attention output) and
    gather ids pointing at row 0; their query rows are zero-padded and
    sliced away after the processor."""
    ids = np.asarray(khop.cluster_ids)
    masks = np.asarray(khop.cluster_masks)
    nb, u_pad = ids.shape
    nb_pad = -(-nb // n_shards) * n_shards
    if nb_pad != nb:
        ids = np.concatenate(
            [ids, np.zeros((nb_pad - nb, u_pad), ids.dtype)], axis=0
        )
        masks = np.concatenate(
            [masks, np.zeros((nb_pad - nb,) + masks.shape[1:], masks.dtype)],
            axis=0,
        )
    return jnp.asarray(ids), jnp.asarray(masks), nb_pad


def make_block_sharded_denoiser_fwd(denoiser, mesh: Mesh, axis: str = "model"):
    """Build a jitted (params, corrupted, prev, noise) -> denoised forward
    whose processor is sharded over `axis` by cluster blocks.

    Requires attention_impl="clustered_flash" (khop.cluster_ids present)
    and use_edges_features=False. Params are the unsharded Denoiser's.
    """
    khop = denoiser.khop
    if khop.cluster_ids is None:
        raise ValueError(
            "block-sharded processor needs attention_impl='clustered_flash'"
        )
    n_shards = mesh.shape[axis]
    ids_pad, masks_pad, nb_pad = _padded_cluster_slices(khop, n_shards)
    block = khop.cluster_block
    n_pad2 = nb_pad * block
    n_mesh = khop.n_receivers
    module = denoiser.module
    hidden = module.hidden_dims
    latent = hidden[-1]
    heads = module.num_heads
    num_blocks = module.num_blocks
    precs = Preconditioner(sigma_data=1.0)

    encoder = GenCastEncoder(
        hidden_dims=hidden, scale_factor=module.scale_factor
    )
    decoder = GenCastDecoder(output_dim=module.output_features_dim,
                             hidden_dims=hidden)
    fourier = FourierEmbedding(16, 32, 16)  # GenCastProcessor defaults

    blocks = [
        CondTransformerBlock(
            out_channels=latent // heads,
            num_heads=heads,
            concat=True,
            beta=True,
            use_edge_features=False,
            activation=jax.nn.silu,
        )
        for _ in range(num_blocks - 1)
    ] + [
        CondTransformerBlock(
            out_channels=latent,
            num_heads=heads,
            concat=False,
            beta=True,
            use_edge_features=False,
            activation=None,
        )
    ]

    grid_feats_const = denoiser.grid_node_feats
    mesh_feats_const = denoiser.mesh_node_feats
    g2m, m2g = denoiser.g2m, denoiser.m2g
    to_nodes, from_nodes = denoiser._to_nodes, denoiser._from_nodes
    dummy_e = jnp.zeros((1,), jnp.int32)
    dummy_a = jnp.zeros((1, 0), jnp.float32)

    def processor_local(x_loc, cond, block_params, ids_loc, masks_loc):
        rows_loc = x_loc.shape[1]
        graph_loc = DeviceGraph(
            senders=dummy_e, receivers=dummy_e, edge_attr=dummy_a,
            csr_edge_ids=None, csr_mask=None,
            cluster_ids=ids_loc, cluster_masks=masks_loc,
            n_senders=n_pad2, n_receivers=rows_loc,
            cluster_block=block,
        )
        for blk, sub in zip(blocks, block_params):
            x_full = jax.lax.all_gather(x_loc, axis, axis=1, tiled=True)
            x_loc = blk.apply(
                {"params": sub}, x_loc, graph_loc, None, cond,
                kv_source=x_full,
            )
        return x_loc

    smapped = shard_map(
        processor_local,
        mesh=mesh,
        in_specs=(
            P(None, axis, None),  # x rows by blocks
            P(),  # cond replicated
            P(),  # params replicated
            P(axis, None),  # cluster ids by blocks
            P(axis, None, None),  # masks by blocks
        ),
        out_specs=P(None, axis, None),
        check_vma=False,
    )

    def fwd(params, corrupted_targets, prev_inputs, noise_levels):
        p = params["params"]
        batch = corrupted_targets.shape[0]
        corrupted = to_nodes(corrupted_targets)
        prev = to_nodes(prev_inputs)
        scaled = precs.c_in(noise_levels)[:, :, None] * corrupted
        scaled_noise = precs.c_noise(noise_levels)
        grid_feats = jnp.concatenate(
            [
                scaled,
                prev,
                jnp.broadcast_to(
                    grid_feats_const, (batch,) + grid_feats_const.shape
                ),
            ],
            axis=-1,
        )
        latent_grid, latent_mesh = encoder.apply(
            {"params": p["GenCastEncoder_0"]}, grid_feats, mesh_feats_const, g2m
        )
        proc_p = p["GenCastProcessor_0"]
        cond = fourier.apply(
            {"params": proc_p["FourierEmbedding_0"]}, scaled_noise
        )[:, None, :]
        block_params = [
            proc_p[f"CondTransformerBlock_{i}"] for i in range(num_blocks)
        ]
        x = jnp.pad(latent_mesh, ((0, 0), (0, n_pad2 - n_mesh), (0, 0)))
        x = smapped(x, cond, block_params, ids_pad, masks_pad)
        latent_mesh = x[:, :n_mesh]
        preds = decoder.apply(
            {"params": p["GenCastDecoder_0"]}, latent_mesh, latent_grid, m2g
        )
        out = (
            precs.c_skip(noise_levels)[:, :, None] * corrupted
            + precs.c_out(noise_levels)[:, :, None] * preds
        )
        return from_nodes(out)

    return jax.jit(fwd)
