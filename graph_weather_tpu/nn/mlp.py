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

    'LayerNorm' and None are the configurations the reference actually
    exercises (its getattr(torch.nn, norm_type) path only resolves for
    LayerNorm); 'RMSNorm' and 'GraphNorm' are supported extras.
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
    raise ValueError(f"Unsupported norm_type: {norm_type}")


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
