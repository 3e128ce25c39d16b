"""Physical conservation constraints between HR output and LR reference.

Equivalent of reference models/layers/constraint_layer.py:12-188 but
decoupled from the owning model: operates directly on graph-format
[B, N, C] tensors (N in row-major (H, W) grid order) or grid-format
[B, C, H, W], and returns graph format like the reference.

Constraints (all conserve the LR mean over the grid):
  additive:        y = x_hr + (x_lr - mean(x_hr))
  multiplicative:  y = x_hr * mean(x_lr) / (mean(x_hr) + eps)
  softmax:         y = exp(e x_hr) * x_lr / sumpool(exp(e x_hr))  (blockwise)
"""

from __future__ import annotations

import jax.numpy as jnp


class PhysicalConstraintLayer:
    """Stateless constraint applier."""

    def __init__(
        self,
        grid_shape: tuple[int, int],
        upsampling_factor: int = 1,
        constraint_type: str = "none",
        exp_factor: float = 1.0,
    ):
        if constraint_type not in ("additive", "multiplicative", "softmax"):
            raise ValueError(f"Unknown constraint type: {constraint_type}")
        self.grid_shape = grid_shape
        self.upsampling_factor = upsampling_factor
        self.constraint_type = constraint_type
        self.exp_factor = exp_factor

    # format helpers -------------------------------------------------------
    def _to_grid(self, t: jnp.ndarray) -> jnp.ndarray:
        """[B, N, C] or [B, C, H, W] -> [B, C, H, W]."""
        if t.ndim == 3:
            b, n, c = t.shape
            h, w = self.grid_shape
            if n == h * w:
                return jnp.transpose(t.reshape(b, h, w, c), (0, 3, 1, 2))
            f = self.upsampling_factor
            return jnp.transpose(t.reshape(b, h // f, w // f, c), (0, 3, 1, 2))
        if t.ndim == 4:
            return t
        raise ValueError("Input tensor must be either 3D (graph) or 4D (grid).")

    @staticmethod
    def _to_graph(t: jnp.ndarray) -> jnp.ndarray:
        b, c, h, w = t.shape
        return jnp.transpose(t, (0, 2, 3, 1)).reshape(b, h * w, c)

    # constraints -----------------------------------------------------------
    def additive_constraint(self, hr: jnp.ndarray, lr: jnp.ndarray) -> jnp.ndarray:
        hr_g, lr_g = self._to_graph(hr), self._to_graph(lr)
        avg_hr = hr_g.mean(axis=1, keepdims=True)
        diff = lr_g - avg_hr  # [B, N_lr, C]
        f2 = self.upsampling_factor**2
        diff_expanded = jnp.tile(diff, (1, f2, 1))
        return self._to_grid_like(hr, hr_g + diff_expanded)

    def multiplicative_constraint(self, hr: jnp.ndarray, lr: jnp.ndarray) -> jnp.ndarray:
        hr_g, lr_g = self._to_graph(hr), self._to_graph(lr)
        avg_hr = hr_g.mean(axis=1, keepdims=True)
        lr_avg = lr_g.mean(axis=1, keepdims=True)
        ratio = lr_avg / (avg_hr + 1e-8)
        return self._to_grid_like(hr, hr_g * ratio)

    def softmax_constraint(self, hr: jnp.ndarray, lr: jnp.ndarray) -> jnp.ndarray:
        f = self.upsampling_factor
        y = jnp.exp(self.exp_factor * hr)  # [B, C, H, W]
        b, c, h, w = y.shape
        # blockwise sum over f x f patches
        blocks = y.reshape(b, c, h // f, f, w // f, f)
        sum_y = blocks.sum(axis=(3, 5))  # [B, C, h/f, w/f]
        ratio = lr / sum_y
        expanded = jnp.repeat(jnp.repeat(ratio, f, axis=2), f, axis=3)
        return y * expanded

    def _to_grid_like(self, hr_grid: jnp.ndarray, graph: jnp.ndarray) -> jnp.ndarray:
        b, c, h, w = hr_grid.shape
        return jnp.transpose(graph.reshape(b, h, w, c), (0, 3, 1, 2))

    def __call__(self, hr, lr) -> jnp.ndarray:
        """Apply the constraint; returns GRAPH format [B, N, C]."""
        hr_grid = self._to_grid(hr)
        lr_grid = self._to_grid(lr)
        if hr_grid.shape[2:] != tuple(self.grid_shape):
            raise ValueError(
                f"Expected spatial dimensions {self.grid_shape}, got {hr_grid.shape[2:]}"
            )
        if self.constraint_type == "additive":
            out = self.additive_constraint(hr_grid, lr_grid)
        elif self.constraint_type == "multiplicative":
            out = self.multiplicative_constraint(hr_grid, lr_grid)
        else:
            out = self.softmax_constraint(hr_grid, lr_grid)
        return self._to_graph(out)
