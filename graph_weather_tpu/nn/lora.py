"""Functional LoRA: low-rank adaptation by parameter-tree merging.

JAX-native equivalent of the reference's in-place Linear patching
(reference models/fengwu_ghr/layers.py:351-390): instead of mutating
modules, `lora_init` creates (A, B) factors for every kernel leaf and
`lora_merge` returns a parameter tree with kernel' = kernel + A @ B. The
merged tree is applied with the unmodified model, so ANY model in the
framework is LoRA-adaptable; gradients flow to the factors while the base
stays frozen (A ~ N(0, 1/r), B = 0, so the initial correction is zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _is_kernel(path) -> bool:
    return path and getattr(path[-1], "key", None) == "kernel"


def lora_init(rng: jax.Array, params, r: int = 4):
    """Create LoRA factors {path: (A [in, r], B [r, out])} for 2D kernels."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lora = {}
    for path, leaf in flat:
        if _is_kernel(path) and leaf.ndim == 2:
            rng, key = jax.random.split(rng)
            in_dim, out_dim = leaf.shape
            a = jax.random.normal(key, (in_dim, r), leaf.dtype) / jnp.sqrt(r)
            b = jnp.zeros((r, out_dim), leaf.dtype)
            lora[jax.tree_util.keystr(path)] = (a, b)
    return lora


def lora_merge(params, lora: dict, scale: float = 1.0):
    """Return params with kernel' = kernel + scale * A @ B for adapted leaves."""

    def merge(path, leaf):
        key = jax.tree_util.keystr(path)
        if key in lora:
            a, b = lora[key]
            return leaf + scale * (a @ b)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, params)
