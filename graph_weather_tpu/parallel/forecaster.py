"""Explicit spatially-sharded GraphWeatherForecaster forward (shard_map).

The sequence-parallel analogue for this domain is GRID-NODE sharding
(SURVEY §5): at 0.25° the global grid has ≈1,036,800 nodes and its
mesh→grid graph ≈7.26M edges — far past one chip's HBM appetite. This
module partitions the forecaster's state explicitly over the "model" mesh
axis (replacing the reference's single-device memory tricks — hierarchical
checkpointing, reference models/graphcast/model.py:113-175 — with actual
scale-out):

  * grid nodes + their g2m/m2g edges: sharded contiguously; each device
    owns the g2m edges whose SENDER and the m2g edges whose RECEIVER live
    on it, so grid-side gathers/aggregations are local.
  * encoder aggregation into the latent mesh crosses shards once per step:
    per-device partial segment-sums are `psum`-ed over ICI ([B, N_mesh, H]
    — ~6 MB at H3 res 2, the only all-reduce of the forward).
  * latent mesh processor: receiver-aligned mesh-node shards with an
    `all_gather` halo exchange per message-passing round (the
    parallel/halo.py pattern, inlined into the same shard_map program).
  * decoder: a single [N_mesh, H] all_gather of processed mesh features,
    then purely local edge MLP + padded-CSR aggregation per grid shard.

Parameters stay replicated (P()) and the parameter TREE is the unsharded
model's — the same checkpoint runs sharded or not, and outputs match the
unsharded forward to f32 tolerance (summation order inside psum differs;
see tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from graph_weather_tpu.meshes.graphs import GraphBundle
from graph_weather_tpu.nn.graph_blocks import (
    DeviceGraph,
    EdgeBlock,
    GraphProcessorBlock,
    NodeBlock,
)
from graph_weather_tpu.nn.mlp import MLP
from graph_weather_tpu.ops.scatter import build_padded_csr, segment_sum_agg
from graph_weather_tpu.parallel.halo import partition_latent_graph


def _shard_g2m_by_sender(bundle: GraphBundle, n_shards: int, shard_size: int):
    """Partition grid→mesh edges by sender (grid) shard.

    Returns [D, E_s] senders_local / receivers_global / [D, E_s, F] attrs.
    Padding edges point at sender `shard_size` (a zero dummy row) and
    receiver `n_receivers` (the aggregation dummy slot). Within each shard
    edges stay receiver-sorted, and the dummy receiver sorts last, so the
    partial segment_sum keeps `indices_are_sorted=True`.
    """
    shard_of_edge = bundle.senders // shard_size
    e_s = max(int(np.bincount(shard_of_edge, minlength=n_shards).max()), 1)
    senders_local = np.full((n_shards, e_s), shard_size, dtype=np.int32)
    receivers = np.full((n_shards, e_s), bundle.n_receivers, dtype=np.int32)
    edge_attr = np.zeros((n_shards, e_s, bundle.edge_attr.shape[1]), np.float32)
    for d in range(n_shards):
        sel = shard_of_edge == d
        k = int(sel.sum())
        senders_local[d, :k] = bundle.senders[sel] - d * shard_size
        receivers[d, :k] = bundle.receivers[sel]
        edge_attr[d, :k] = bundle.edge_attr[sel]
    return senders_local, receivers, edge_attr


def _shard_m2g_by_receiver(bundle: GraphBundle, n_shards: int, shard_size: int):
    """Partition mesh→grid edges by receiver (grid) shard.

    Returns ([D, E_s] senders_global, receivers_local, [D, E_s, F] attrs,
    [D, S_g, K] csr ids, [D, S_g, K] csr mask). Padding edges point at
    receiver `shard_size`; the CSR table only indexes real edges, so padded
    rows never contribute.
    """
    shard_of_edge = bundle.receivers // shard_size
    e_s = max(int(np.bincount(shard_of_edge, minlength=n_shards).max()), 1)
    senders = np.zeros((n_shards, e_s), dtype=np.int32)
    receivers_local = np.full((n_shards, e_s), shard_size, dtype=np.int32)
    edge_attr = np.zeros((n_shards, e_s, bundle.edge_attr.shape[1]), np.float32)
    k_max = 1
    csr_parts = []
    for d in range(n_shards):
        sel = shard_of_edge == d
        k = int(sel.sum())
        senders[d, :k] = bundle.senders[sel]
        recv_loc = bundle.receivers[sel] - d * shard_size
        receivers_local[d, :k] = recv_loc
        edge_attr[d, :k] = bundle.edge_attr[sel]
        ids, mask = build_padded_csr(recv_loc, shard_size)
        csr_parts.append((ids, mask))
        k_max = max(k_max, ids.shape[1])
    csr_ids = np.zeros((n_shards, shard_size, k_max), np.int32)
    csr_mask = np.zeros((n_shards, shard_size, k_max), bool)
    for d, (ids, mask) in enumerate(csr_parts):
        csr_ids[d, :, : ids.shape[1]] = ids
        csr_mask[d, :, : mask.shape[1]] = mask
    return senders, receivers_local, edge_attr, csr_ids, csr_mask


def make_spatial_forward(
    model,
    mesh: Mesh,
    axis: str = "model",
    compute_dtype=None,
):
    """Build the sharded (params, features) -> prediction function.

    `model` is a GraphWeatherForecaster; `params` is its UNSHARDED param
    tree (replicated across devices). Returns a function safe to jit /
    grad / scan, numerically matching `model.forward_fn()` to f32
    tolerance.
    """
    mod = model.module
    n_shards = mesh.shape[axis]
    n_grid = model.num_grid_nodes
    shard_g = -(-n_grid // n_shards)
    n_grid_pad = shard_g * n_shards
    n_mesh = mod.n_mesh

    g2m_b, latent_b, m2g_b = model.g2m_bundle, model.latent_bundle, model.m2g_bundle
    g2m_sl, g2m_r, g2m_attr = _shard_g2m_by_sender(g2m_b, n_shards, shard_g)
    m2g_s, m2g_rl, m2g_attr, m2g_csr, m2g_mask = _shard_m2g_by_receiver(
        m2g_b, n_shards, shard_g
    )
    lat = partition_latent_graph(latent_b, n_shards)
    shard_m = lat.shard_size

    f_dtype = jnp.float32 if compute_dtype is None else compute_dtype
    statics = dict(
        g2m_sl=jnp.asarray(g2m_sl),
        g2m_r=jnp.asarray(g2m_r),
        g2m_attr=jnp.asarray(g2m_attr, f_dtype),
        m2g_s=jnp.asarray(m2g_s),
        m2g_rl=jnp.asarray(m2g_rl),
        m2g_attr=jnp.asarray(m2g_attr, f_dtype),
        m2g_csr=jnp.asarray(m2g_csr),
        m2g_mask=jnp.asarray(m2g_mask),
        lat_s=jnp.asarray(lat.senders),
        lat_rl=jnp.asarray(lat.receivers_local),
        lat_attr=jnp.asarray(lat.edge_attr, f_dtype),
    )

    # -- module builders (same hyperparameters as the unsharded modules) ---
    node_mlp = MLP(
        mod.node_dim, mod.hidden_dim_processor_node,
        mod.hidden_layers_processor_node, mod.norm_type,
    )
    edge_mlp = MLP(
        mod.edge_dim, mod.hidden_dim_processor_edge,
        mod.hidden_layers_processor_edge, mod.norm_type,
    )
    m2g_edge_mlp = MLP(mod.edge_dim, mod.hidden_dim_processor_edge, 2, mod.norm_type)
    out_mlp = MLP(mod.output_dim, mod.hidden_dim_decoder, mod.hidden_layers_decoder, None)
    enc_edge_block = EdgeBlock(
        mod.edge_dim, mod.hidden_dim_processor_edge,
        mod.hidden_layers_processor_edge, mod.norm_type,
    )
    enc_node_block = NodeBlock(
        mod.node_dim, mod.hidden_dim_processor_node,
        mod.hidden_layers_processor_node, mod.norm_type,
    )
    dec_edge_block = EdgeBlock(
        mod.edge_dim, mod.hidden_dim_processor_edge,
        mod.hidden_layers_processor_edge, mod.norm_type, dst_is_zero=True,
    )
    dec_node_block = NodeBlock(
        mod.node_dim, mod.hidden_dim_processor_node,
        mod.hidden_layers_processor_node, mod.norm_type, dst_is_zero=True,
    )
    proc_block = GraphProcessorBlock(
        mod.node_dim, mod.edge_dim,
        mod.hidden_dim_processor_node, mod.hidden_dim_processor_edge,
        mod.hidden_layers_processor_node, mod.hidden_layers_processor_edge,
        mod.norm_type,
    )
    num_blocks = mod.num_blocks

    def local(params, feats_loc, st):
        # shard_map hands per-device slices with the sharded axis kept at
        # length 1 for the leading [D, ...] static arrays — drop it.
        st = {k: v[0] for k, v in st.items()}
        p = params["params"]
        p_enc, p_proc, p_dec = p["Encoder_0"], p["Processor_0"], p["Decoder_0"]
        batch = feats_loc.shape[0]
        dtype = feats_loc.dtype

        # ---- Encoder -----------------------------------------------------
        x_grid = node_mlp.apply({"params": p_enc["MLP_0"]}, feats_loc)
        x_mesh1 = node_mlp.apply({"params": p_enc["MLP_0"]}, p_enc["mesh_nodes"])
        x_mesh = jnp.broadcast_to(x_mesh1, (batch,) + x_mesh1.shape)

        g2m_e = edge_mlp.apply({"params": p_enc["MLP_1"]}, st["g2m_attr"])
        g2m_e = jnp.broadcast_to(g2m_e, (batch,) + g2m_e.shape)
        zrow = jnp.zeros((batch, 1, mod.node_dim), dtype)
        g2m_graph = DeviceGraph(
            senders=st["g2m_sl"], receivers=st["g2m_r"], edge_attr=st["g2m_attr"],
            csr_edge_ids=None, csr_mask=None,
            n_senders=shard_g + 1, n_receivers=n_mesh + 1,
        )
        blk = p_enc["GraphProcessorBlock_0"]
        e = enc_edge_block.apply(
            {"params": blk["EdgeBlock_0"]},
            jnp.concatenate([x_grid, zrow], axis=1),
            jnp.concatenate([x_mesh, zrow], axis=1),
            g2m_e,
            g2m_graph,
        )
        agg = segment_sum_agg(e, st["g2m_r"], n_mesh + 1)[..., :n_mesh, :]
        agg = jax.lax.psum(agg, axis)
        x_mesh = enc_node_block.apply(
            {"params": blk["NodeBlock_0"]}, x_mesh, e, g2m_graph, agg=agg
        )

        # ---- Processor (halo pattern: all_gather sources per round) ------
        lat_e = edge_mlp.apply({"params": p_enc["MLP_2"]}, st["lat_attr"])
        lat_e = jnp.broadcast_to(lat_e, (batch,) + lat_e.shape)
        lat_graph = DeviceGraph(
            senders=st["lat_s"], receivers=st["lat_rl"], edge_attr=st["lat_attr"],
            csr_edge_ids=None, csr_mask=None,
            n_senders=lat.n_pad, n_receivers=shard_m + 1,
        )
        idx = jax.lax.axis_index(axis)
        pad_m = lat.n_pad - n_mesh
        x_mesh_pad = jnp.pad(x_mesh, ((0, 0), (0, pad_m), (0, 0)))
        x_loc = jax.lax.dynamic_slice_in_dim(x_mesh_pad, idx * shard_m, shard_m, 1)
        e = lat_e
        for i in range(num_blocks):
            x_full = jax.lax.all_gather(x_loc, axis, axis=1, tiled=True)
            x_dst = jnp.concatenate([x_loc, jnp.zeros_like(x_loc[:, :1])], axis=1)
            x_dst, e = proc_block.apply(
                {"params": p_proc["GraphProcessor_0"][f"GraphProcessorBlock_{i}"]},
                x_full,
                x_dst,
                e,
                lat_graph,
            )
            x_loc = x_dst[:, :shard_m]
        x_mesh = jax.lax.all_gather(x_loc, axis, axis=1, tiled=True)[:, :n_mesh]

        # ---- Decoder ------------------------------------------------------
        m2g_e = m2g_edge_mlp.apply({"params": p_dec["MLP_0"]}, st["m2g_attr"])
        m2g_e = jnp.broadcast_to(m2g_e, (batch,) + m2g_e.shape)
        m2g_graph = DeviceGraph(
            senders=st["m2g_s"], receivers=st["m2g_rl"], edge_attr=st["m2g_attr"],
            csr_edge_ids=st["m2g_csr"], csr_mask=st["m2g_mask"],
            n_senders=n_mesh, n_receivers=shard_g + 1,
        )
        blk = p_dec["GraphProcessorBlock_0"]
        x_grid0 = jnp.zeros((batch, shard_g + 1, mod.node_dim), dtype)
        e = dec_edge_block.apply(
            {"params": blk["EdgeBlock_0"]}, x_mesh, x_grid0, m2g_e, m2g_graph
        )
        x_grid = dec_node_block.apply(
            {"params": blk["NodeBlock_0"]},
            x_grid0[:, :shard_g],
            e,
            m2g_graph,
            agg=m2g_graph.aggregate(e),
        )
        out = out_mlp.apply({"params": p_dec["MLP_1"]}, x_grid)
        return out + feats_loc[..., : mod.output_dim]

    static_spec = jax.tree_util.tree_map(
        lambda v: P(axis, *([None] * (v.ndim - 1))), statics
    )

    def make_smapped(batch: int):
        # Shard the batch over "data" only when it divides evenly;
        # otherwise replicate it (e.g. batch-1 inference on a DP mesh).
        batch_axis = (
            "data"
            if "data" in mesh.axis_names and batch % mesh.shape["data"] == 0
            else None
        )
        feat_spec = P(batch_axis, axis, None)
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), feat_spec, static_spec),
            out_specs=feat_spec,
            check_vma=False,
        )

    def fn(params, features):
        if compute_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda t: t.astype(compute_dtype)
                if jnp.issubdtype(t.dtype, jnp.floating)
                else t,
                params,
            )
            features = features.astype(compute_dtype)
        b, n, f = features.shape
        pad = n_grid_pad - n
        if pad:
            features = jnp.pad(features, ((0, 0), (0, pad), (0, 0)))
        out = make_smapped(b)(params, features, statics)
        out = out[:, :n]
        return out.astype(jnp.float32) if compute_dtype is not None else out

    return fn
