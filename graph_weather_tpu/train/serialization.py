"""Single-file parameter save/load (the reference's HF-hub-mixin analogue).

The reference persists weights three ways (Lightning ckpt, HF hub mixin,
raw torch.save — SURVEY section 5); orbax (train/checkpoint.py) covers the
training-state case. This module is the lightweight single-artifact path:
one msgpack file holding the parameter pytree, suitable for publishing or
shipping a trained model — static graph arrays are never included,
matching the reference's persistent=False buffer rule.
"""

from __future__ import annotations

import os

import jax
from flax import serialization


def save_params(path: str, params) -> None:
    """Serialize a parameter pytree to one msgpack file."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template):
    """Restore a parameter pytree from `path` using `template`'s structure.

    `template` is any pytree with the right structure/shapes (e.g. a fresh
    `model.init(...)` result). Leaf shapes are validated against the
    template — flax's from_bytes would otherwise silently return arrays of
    whatever shape was saved.
    """
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())

    def check(path_, a, b):
        if hasattr(a, "shape") and tuple(a.shape) != tuple(b.shape):
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(path_)}: checkpoint "
                f"{tuple(b.shape)} vs template {tuple(a.shape)}"
            )
        return b

    return jax.tree_util.tree_map_with_path(
        lambda pth, a, b: check(pth, a, b), template, restored
    )
