"""Variable-resolution ("stretched") hexagonal mesh.

Equivalent of reference models/layers/stretched_mesh.py:11-54: coarse cells
tile the globe; every coarse cell whose center falls inside the bounding
box is replaced by its fine-resolution children (children = fine cells
whose nearest coarse center is that cell — an exact partition, so the
result covers the globe exactly once with no overlaps).

Cells are identified by (resolution, cell id) pairs instead of H3 strings;
centers and per-cell resolution arrays are returned for direct use in
graph construction.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from graph_weather_tpu.meshes.hexmesh import get_hexmesh


@dataclass(frozen=True)
class StretchedMesh:
    """A mixed-resolution cell set covering the sphere exactly once."""

    cell_xyz: np.ndarray  # [N, 3] unit centers
    cell_latlon: np.ndarray  # [N, 2] degrees
    cell_res: np.ndarray  # [N] resolution of each cell
    cell_id: np.ndarray  # [N] id within its resolution's full mesh

    @property
    def num_cells(self) -> int:
        return self.cell_xyz.shape[0]


def build_variable_resolution_mesh(
    bbox: tuple[float, float, float, float],
    coarse_res: int,
    fine_res: int,
) -> StretchedMesh:
    """Globe-covering mesh, refined to `fine_res` inside `bbox`.

    Args:
        bbox: (lat_min, lat_max, lon_min, lon_max) degrees.
        coarse_res: resolution outside the region.
        fine_res: resolution inside; must exceed coarse_res.
    """
    if fine_res <= coarse_res:
        raise ValueError(
            f"fine_res ({fine_res}) must be greater than coarse_res ({coarse_res})"
        )
    lat_min, lat_max, lon_min, lon_max = bbox
    coarse = get_hexmesh(coarse_res)
    fine = get_hexmesh(fine_res)

    lat, lon = coarse.cell_latlon[:, 0], coarse.cell_latlon[:, 1]
    lon_wrapped = np.mod(lon, 360.0)
    lo, hi = np.mod(lon_min, 360.0), np.mod(lon_max, 360.0)
    if lo <= hi:
        in_lon = (lon_wrapped >= lo) & (lon_wrapped <= hi)
    else:  # bbox crosses the dateline
        in_lon = (lon_wrapped >= lo) | (lon_wrapped <= hi)
    inside = (lat >= lat_min) & (lat <= lat_max) & in_lon

    parents = fine.parent_cells(coarse)  # nearest coarse center per fine cell
    fine_keep = inside[parents]
    coarse_keep = ~inside

    cell_xyz = np.concatenate(
        [coarse.cell_xyz[coarse_keep], fine.cell_xyz[fine_keep]], axis=0
    )
    cell_latlon = np.concatenate(
        [coarse.cell_latlon[coarse_keep], fine.cell_latlon[fine_keep]], axis=0
    )
    cell_res = np.concatenate(
        [
            np.full(coarse_keep.sum(), coarse_res, dtype=np.int32),
            np.full(fine_keep.sum(), fine_res, dtype=np.int32),
        ]
    )
    cell_id = np.concatenate(
        [
            np.flatnonzero(coarse_keep).astype(np.int32),
            np.flatnonzero(fine_keep).astype(np.int32),
        ]
    )
    # Deterministic ordering: by (lat, lon), like the reference's sorted ids.
    order = np.lexsort(
        (np.round(cell_latlon[:, 1], 7), np.round(cell_latlon[:, 0], 7))
    )
    return StretchedMesh(
        cell_xyz=cell_xyz[order],
        cell_latlon=cell_latlon[order],
        cell_res=cell_res[order],
        cell_id=cell_id[order],
    )
