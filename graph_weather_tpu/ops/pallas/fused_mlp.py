"""Fused edge-MLP chain as a Pallas TPU kernel (gathers stay in XLA).

Computes, over edge tiles, the entire MeshGraphNet edge update AFTER the
node gathers:

    h0 = relu(xs + xd + e @ We + b0)      (xs, xd are pre-gathered partials)
    h1 = relu(h0 @ W1 + b1)
    h2 = h1 @ W2 + b2
    e' = LayerNorm(h2) * gamma + beta + e

This kernel keeps h0/h1/h2/LN entirely in VMEM and writes only e'.
Mosaic's restricted dynamic-gather support is why the gathers remain in
XLA (see _gather_lowering_rule: indices must match the operand shape).

MEASURED (TPU v5e, E=453,600, F=H=256, f32, tile=1024): this kernel runs
9.3 ms vs 6.81 ms for the equivalent XLA chain — XLA's own fusion of the
matmul chain is already better than this hand-pipelined version, so the
framework keeps the XLA path as the default compute path and ships this
kernel as a verified alternative (exact to 1.4e-6). Keep tile <= 1024 at
F=256/f32: tile=2048 overflows VMEM with double buffering and crashes the
Mosaic compile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    xs_ref,  # [T, H] pre-gathered src partial (x_src @ Ws)[senders]
    xd_ref,  # [T, H] pre-gathered dst partial
    e_ref,  # [T, Fe]
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
    e = e_ref[:]
    h = (
        xs_ref[:].astype(jnp.float32)
        + xd_ref[:].astype(jnp.float32)
        + jnp.dot(e, we_ref[:], preferred_element_type=jnp.float32)
        + b0_ref[:]
    )
    h = jnp.maximum(h, 0.0)
    h = jnp.maximum(
        jnp.dot(h.astype(e.dtype), w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:],
        0.0,
    )
    h = (
        jnp.dot(h.astype(e.dtype), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:]
    )
    mean = jnp.mean(h, axis=-1, keepdims=True)
    centered = h - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    normed = centered * jax.lax.rsqrt(var + 1e-5)
    out_ref[:] = (
        normed * gamma_ref[:] + beta_ref[:] + e.astype(jnp.float32)
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile",))
def _fused_padded(xs, xd, e, we, b0, w1, b1, w2, b2, gamma, beta, tile: int):
    n_edges, fe = e.shape
    h = w1.shape[0]

    def whole(i):
        return (0, 0)

    return pl.pallas_call(
        _kernel,
        grid=(n_edges // tile,),
        in_specs=[
            pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, fe), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(we.shape, whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fe), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fe), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fe), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, fe), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_edges, fe), e.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_edges * (fe * h + h * h + h * fe),
            bytes_accessed=n_edges * (2 * h + 2 * fe) * e.dtype.itemsize,
            transcendentals=0,
        ),
    )(xs, xd, e, we, b0, w1, b1, w2, b2, gamma, beta)


def fused_edge_update(
    xs_gathered: jnp.ndarray,  # [..., E, H] (x_src @ Ws)[senders]
    xd_gathered: jnp.ndarray,  # [..., E, H]
    e: jnp.ndarray,  # [..., E, Fe]
    params: dict,
    tile: int = 1024,
) -> jnp.ndarray:
    """Fused e' = LN(MLP-chain) + e. Handles batch dims and edge padding.

    `params` is the standard MLP tree (TorchLinear_0..2 + LayerNorm_0);
    TorchLinear_0's kernel holds the fused [Fs+Fd+Fe, H] weight — only its
    edge-feature slice `We` is used here (the node slices were applied
    before gathering).
    """
    f_e = e.shape[-1]
    k0 = params["TorchLinear_0"]["kernel"]
    we = k0[-f_e:]
    b0 = params["TorchLinear_0"]["bias"][None, :]
    w1 = params["TorchLinear_1"]["kernel"]
    b1 = params["TorchLinear_1"]["bias"][None, :]
    w2 = params["TorchLinear_2"]["kernel"]
    b2 = params["TorchLinear_2"]["bias"][None, :]
    gamma = params["LayerNorm_0"]["scale"][None, :]
    beta = params["LayerNorm_0"]["bias"][None, :]

    batch_shape = e.shape[:-2]
    n_edges = e.shape[-2]
    h_dim = w1.shape[0]
    xs2 = xs_gathered.reshape(-1, h_dim)
    xd2 = xd_gathered.reshape(-1, h_dim)
    e2 = e.reshape(-1, f_e)

    total = e2.shape[0]
    pad = (-total) % tile
    if pad:
        xs2 = jnp.pad(xs2, ((0, pad), (0, 0)))
        xd2 = jnp.pad(xd2, ((0, pad), (0, 0)))
        e2 = jnp.pad(e2, ((0, pad), (0, 0)))
    dtype = e.dtype
    out = _fused_padded(
        xs2.astype(dtype), xd2.astype(dtype), e2,
        we.astype(dtype), b0, w1.astype(dtype), b1, w2.astype(dtype), b2,
        gamma, beta, tile=tile,
    )
    if pad:
        out = out[:total]
    return out.reshape(batch_shape + (n_edges, f_e))
