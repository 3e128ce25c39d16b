"""Fused MeshGraphNet edge update as a Pallas TPU kernel.

Computes, for every edge (s, r) of a graph whose node array fits in VMEM:

    h0 = relu(x[s] @ Ws + x_dst[r] @ Wd + e @ We + b0)
    h1 = relu(h0 @ W1 + b1)
    h2 = h1 @ W2 + b2
    e' = LayerNorm(h2) * gamma + beta + e          (residual)

in ONE kernel: node features stay resident in VMEM across all edge tiles,
per-edge gathers happen on-chip, and none of the [E, H] intermediates ever
round-trips through HBM.

STATUS: verified exact against the XLA reference in interpret mode
(tests/test_pallas_kernels.py), but the current Mosaic TPU compiler cannot
lower the on-chip row gather (its gather rule only supports
take_along_axis with operand-shaped indices, lowering.py:2484), so this
kernel does not yet compile for TPU. See ops/pallas/fused_mlp.py for the
compiled variant that keeps gathers in XLA — which measurement showed is
the right split anyway (XLA's fusion beat the hand-pipelined chain).

Grid: 1D over edge tiles. x_src / x_dst are whole-array VMEM blocks (mesh
node sets are small: 5,882 x 256 f32 = 6 MB); weights live in VMEM; edge
features and indices stream per tile. Requires E % tile == 0 (callers pad;
`fused_edge_mlp` handles padding + unpadding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    senders_ref,  # [T] int32 (VMEM)
    receivers_ref,  # [T] int32
    x_src_ref,  # [N_src, F] (whole array, VMEM)
    x_dst_ref,  # [N_dst, F]
    e_ref,  # [T, Fe]
    ws_ref,  # [F, H]
    wd_ref,  # [F, H]
    we_ref,  # [Fe, H]
    b0_ref,  # [1, H]
    w1_ref,  # [H, H]
    b1_ref,  # [1, H]
    w2_ref,  # [H, Fe]
    b2_ref,  # [1, Fe]
    gamma_ref,  # [1, Fe]
    beta_ref,  # [1, Fe]
    out_ref,  # [T, Fe]
):
    senders = senders_ref[:]
    receivers = receivers_ref[:]
    xs = jnp.take(x_src_ref[:], senders, axis=0)  # [T, F] on-chip gather
    xd = jnp.take(x_dst_ref[:], receivers, axis=0)
    e = e_ref[:]

    h = (
        jnp.dot(xs, ws_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(xd, wd_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(e, we_ref[:], preferred_element_type=jnp.float32)
        + b0_ref[:]
    )
    h = jnp.maximum(h, 0.0)
    h = jnp.maximum(
        jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:], 0.0
    )
    h = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]

    # LayerNorm over the feature axis (f32 accumulation), then residual.
    mean = jnp.mean(h, axis=-1, keepdims=True)
    centered = h - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    normed = centered * jax.lax.rsqrt(var + 1e-5)
    out_ref[:] = (normed * gamma_ref[:] + beta_ref[:] + e).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile",))
def _fused_edge_mlp_padded(
    senders, receivers, x_src, x_dst, e, ws, wd, we, b0, w1, b1, w2, b2, gamma, beta,
    tile: int,
):
    n_edges, fe = e.shape
    h = w1.shape[0]
    grid = (n_edges // tile,)

    def tile_map(i):
        return (i,)

    def row0_map(i):
        return (0, 0)

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(x_src.shape, row0_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(x_dst.shape, row0_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, fe), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ws.shape, row0_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(wd.shape, row0_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(we.shape, row0_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), row0_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, row0_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), row0_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, row0_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fe), row0_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fe), row0_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fe), row0_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, fe), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_edges, fe), e.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_edges * (3 * x_src.shape[1] * h + h * h + h * fe),
            bytes_accessed=n_edges * fe * 4 * 2,
            transcendentals=0,
        ),
    )(senders, receivers, x_src, x_dst, e, ws, wd, we, b0, w1, b1, w2, b2, gamma, beta)


def fused_edge_mlp(
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    x_src: jnp.ndarray,  # [N_src, F]
    x_dst: jnp.ndarray,  # [N_dst, F]
    e: jnp.ndarray,  # [E, Fe]
    params: dict,
    tile: int = 2048,
) -> jnp.ndarray:
    """Fused e' = LN(MLP([x_src[s], x_dst[r], e])) + e (unbatched).

    `params` holds the standard MLP parameter tree: TorchLinear_0..2
    (kernel/bias; TorchLinear_0.kernel is the fused [F+F+Fe, H] kernel) and
    LayerNorm_0 (scale/bias). Pads the edge axis to a tile multiple.
    """
    f_s = x_src.shape[-1]
    f_d = x_dst.shape[-1]
    k0 = params["TorchLinear_0"]["kernel"]
    ws, wd, we = k0[:f_s], k0[f_s : f_s + f_d], k0[f_s + f_d :]
    b0 = params["TorchLinear_0"]["bias"][None, :]
    w1 = params["TorchLinear_1"]["kernel"]
    b1 = params["TorchLinear_1"]["bias"][None, :]
    w2 = params["TorchLinear_2"]["kernel"]
    b2 = params["TorchLinear_2"]["bias"][None, :]
    gamma = params["LayerNorm_0"]["scale"][None, :]
    beta = params["LayerNorm_0"]["bias"][None, :]

    n_edges = e.shape[0]
    pad = (-n_edges) % tile
    if pad:
        senders = jnp.pad(senders, (0, pad))
        receivers = jnp.pad(receivers, (0, pad))
        e = jnp.pad(e, ((0, pad), (0, 0)))
    out = _fused_edge_mlp_padded(
        senders, receivers, x_src, x_dst, e,
        ws, wd, we, b0, w1, b1, w2, b2, gamma, beta, tile=tile,
    )
    return out[:n_edges] if pad else out
