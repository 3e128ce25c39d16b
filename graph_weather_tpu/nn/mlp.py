"""Core MLP with MeshGraphNet semantics (norm appended AFTER the output layer).

Mirrors the behavior of the reference MLP (reference
models/layers/graph_net_block.py:17-77): `hidden_layers` ReLU-activated
hidden Dense layers, a linear output layer, then an optional normalization
applied to the output. Initialization matches torch.nn.Linear's default
(uniform +-1/sqrt(fan_in) for both kernel and bias) so converted reference
weights and self-trained weights share statistics.

Gradient checkpointing is not a flag here: rematerialization is applied at
the processor-stack level with `flax.linen.remat` policies (see
nn/graph_blocks.py), which is the JAX-native equivalent of the reference's
per-MLP `torch.utils.checkpoint` (graph_net_block.py:73-75).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

# torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in),
# 1/sqrt(fan_in)); variance of U(-b, b) is b^2/3 = 1/(3 fan_in).
torch_linear_kernel_init = nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
)


class TorchLinear(nn.Module):
    """Dense layer with torch.nn.Linear's default init for kernel AND bias."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (fan_in, self.features), jnp.float32
        )
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bound = 1.0 / (fan_in**0.5)

            def bias_init(key, shape, dtype=jnp.float32):
                import jax

                return jax.random.uniform(key, shape, dtype, -bound, bound)

            bias = self.param("bias", bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def make_norm(norm_type: Optional[str], dim: int):
    """Normalization layer factory.

    Accepts every name the reference's `getattr(torch.nn, norm_type)` path
    resolves (reference models/layers/graph_net_block.py:50-59): LayerNorm,
    BatchNorm1d and InstanceNorm1d (plus their un-suffixed aliases), and
    GraphNorm; 'RMSNorm' is a supported extra. The batch/instance variants
    are the stateless training-mode formulations (batch statistics, no
    running averages — the reference never runs them in eval mode either,
    its training scripts only exercise LayerNorm).
    """
    if norm_type is None or norm_type == "none":
        return None
    if norm_type == "LayerNorm":
        # torch LayerNorm eps for parity.
        return nn.LayerNorm(epsilon=1e-5)
    if norm_type == "RMSNorm":
        return nn.RMSNorm(epsilon=1e-5)
    if norm_type == "GraphNorm":
        # Per-feature standardization over the node axis with learnable
        # scale/shift — the PyG GraphNorm formulation for a single graph.
        return _GraphNorm()
    if norm_type in ("BatchNorm1d", "BatchNorm"):
        # torch BatchNorm1d on [N, F] node features in training mode:
        # per-feature stats over ALL leading axes (torch eps 1e-5).
        return _StatsNorm(axes="all")
    if norm_type in ("InstanceNorm1d", "InstanceNorm"):
        # torch InstanceNorm1d semantics mapped to node features: stats
        # over the node axis per sample, no affine by default.
        return _StatsNorm(axes="nodes", affine=False)
    raise ValueError(f"Unsupported norm_type: {norm_type}")


class _StatsNorm(nn.Module):
    """Stateless batch/instance normalization over node features.

    axes='all' -> statistics over every axis but the last (BatchNorm1d in
    training mode); axes='nodes' -> statistics over the node axis only
    (InstanceNorm1d). eps matches torch (1e-5).
    """

    axes: str = "all"
    affine: bool = True
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        red = tuple(range(x.ndim - 1)) if self.axes == "all" else (-2,)
        mean = jnp.mean(x, axis=red, keepdims=True)
        var = jnp.var(x, axis=red, keepdims=True)
        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        if self.affine:
            dim = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
            y = y * scale + bias
        return y


class _GraphNorm(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.ones, (dim,), jnp.float32)
        gamma = self.param("gamma", nn.initializers.ones, (dim,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (dim,), jnp.float32)
        mean = jnp.mean(x, axis=-2, keepdims=True)
        shifted = x - alpha * mean
        var = jnp.mean(shifted**2, axis=-2, keepdims=True)
        return gamma * shifted * jnp.reciprocal(jnp.sqrt(var + self.epsilon)) + beta


class MLP(nn.Module):
    """ReLU MLP with optional post-output normalization.

    Structure for hidden_layers=H: Dense(hidden) + ReLU, repeated H times,
    then Dense(out), then optional norm — matching reference
    graph_net_block.py:45-59.
    """

    out_dim: int
    hidden_dim: int = 128
    hidden_layers: int = 2
    norm_type: Optional[str] = "LayerNorm"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype_in = x.dtype
        for _ in range(self.hidden_layers):
            x = nn.relu(TorchLinear(self.hidden_dim)(x))
        x = TorchLinear(self.out_dim)(x)
        norm = make_norm(self.norm_type, self.out_dim)
        if norm is not None:
            # norms accumulate in f32; cast back so a bf16 compute policy
            # survives the norm (flax would otherwise promote to f32)
            x = norm(x).astype(dtype_in)
        return x
