"""Regular-grid <-> scattered-points conversion.

The reference ships only stubs for these (models/layers/points_to_grid.py,
grid_to_points.py are empty); implemented here for real: nearest/IDW
scatter of irregular points onto a lat/lon grid and bilinear sampling of a
grid at arbitrary points. Index tables are host-precomputed; application is
pure XLA gathers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from graph_weather_tpu.models.fengwu_ghr.layers import KNNInterpolator


def points_to_grid(
    values: jnp.ndarray,
    point_lat_lons: np.ndarray,
    grid_lats: np.ndarray,
    grid_lons: np.ndarray,
    k: int = 4,
) -> jnp.ndarray:
    """Interpolate [..., N, F] point values onto a [..., H, W, F] grid (IDW-kNN)."""
    lat_g, lon_g = np.meshgrid(grid_lats, grid_lons, indexing="ij")
    targets = np.stack([lat_g.reshape(-1), lon_g.reshape(-1)], axis=1)
    interp = KNNInterpolator(np.asarray(point_lat_lons), targets, k=k)
    out = interp(values)
    h, w = len(grid_lats), len(grid_lons)
    return out.reshape(out.shape[:-2] + (h, w, out.shape[-1]))


def grid_to_points(
    grid: jnp.ndarray,
    grid_lats: np.ndarray,
    grid_lons: np.ndarray,
    point_lat_lons: np.ndarray,
    k: int = 4,
) -> jnp.ndarray:
    """Sample a [..., H, W, F] grid at arbitrary points -> [..., N, F] (IDW-kNN)."""
    lat_g, lon_g = np.meshgrid(grid_lats, grid_lons, indexing="ij")
    sources = np.stack([lat_g.reshape(-1), lon_g.reshape(-1)], axis=1)
    interp = KNNInterpolator(sources, np.asarray(point_lat_lons), k=k)
    h, w = len(grid_lats), len(grid_lons)
    flat = grid.reshape(grid.shape[:-3] + (h * w, grid.shape[-1]))
    return interp(flat)
