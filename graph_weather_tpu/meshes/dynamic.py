"""Dynamic (per-region) hex graph construction with identity caching.

Equivalent of reference models/layers/dynamic_graph_builder.py:13-155,
vectorized over the hex mesh: maps arbitrary lat/lon coordinate sets to
their containing cells, builds the obs->cell encoder graph, the
neighborhood->obs decoder graph, and the latent graph restricted to the
region's cells, and returns global cell ids for embedding lookup.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from graph_weather_tpu.meshes.graphs import GraphBundle, _sincos_dist
from graph_weather_tpu.meshes.hexmesh import HexMesh, get_hexmesh
from graph_weather_tpu.meshes.spherical import great_circle_distance_xyz, latlon_to_xyz
from graph_weather_tpu.utils import validate_lat_lons


class DynamicGraphBuilder:
    """Build encoder/decoder/latent graphs for movable regional domains."""

    def __init__(self, resolution: int = 2):
        self.resolution = resolution
        self.mesh: HexMesh = get_hexmesh(resolution)
        self._prev_lat_lons = None
        self._cached = None

    def _assign_cells(self, lat_lons) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(cell per point, sorted unique global cells, local index per point)."""
        ll = np.asarray(lat_lons, dtype=np.float64)
        cells = self.mesh.latlng_to_cell(ll[:, 0], ll[:, 1])
        unique_cells, local = np.unique(cells, return_inverse=True)
        return cells, unique_cells.astype(np.int32), local.astype(np.int32)

    def build_encoder_graph(self, lat_lons) -> Tuple[GraphBundle, np.ndarray]:
        """obs -> local-cell bundle (1 edge per point) + global cell ids."""
        ll = np.asarray(lat_lons, dtype=np.float64)
        pts = latlon_to_xyz(ll[:, 0], ll[:, 1])
        cells, unique_cells, local = self._assign_cells(lat_lons)
        dist = great_circle_distance_xyz(pts, self.mesh.cell_xyz[cells])
        bundle = GraphBundle(
            senders=np.arange(len(ll), dtype=np.int32),
            receivers=local,
            edge_attr=_sincos_dist(dist),
            n_senders=len(ll),
            n_receivers=len(unique_cells),
        ).sorted_by_receiver()
        return bundle, unique_cells

    def build_decoder_graph(self, lat_lons) -> Tuple[GraphBundle, np.ndarray]:
        """neighborhood-cells -> obs bundle (<=7 edges per point).

        Senders index the sorted union of grid_disk(cell, 1) over the
        region's cells (returned as the second element, global ids).
        """
        ll = np.asarray(lat_lons, dtype=np.float64)
        pts = latlon_to_xyz(ll[:, 0], ll[:, 1])
        cells, unique_cells, _ = self._assign_cells(lat_lons)
        disks, mask = self.mesh.grid_disks(cells)  # [P, 7] global ids
        hood = np.unique(disks[disks >= 0])
        hood_index = np.full(self.mesh.num_cells, -1, dtype=np.int32)
        hood_index[hood] = np.arange(len(hood), dtype=np.int32)

        flat = mask.ravel()
        src_global = disks.ravel()[flat]
        src = hood_index[src_global]
        dst = np.repeat(np.arange(len(ll), dtype=np.int32), 7)[flat]
        dist = great_circle_distance_xyz(pts[dst], self.mesh.cell_xyz[src_global])
        bundle = GraphBundle(
            senders=src,
            receivers=dst,
            edge_attr=_sincos_dist(dist),
            n_senders=len(hood),
            n_receivers=len(ll),
        ).sorted_by_receiver()
        return bundle, hood.astype(np.int32)

    def build_latent_graph(self, unique_cells: np.ndarray) -> GraphBundle:
        """Self+neighbor edges among the region's cells only."""
        unique_cells = np.asarray(unique_cells, dtype=np.int32)
        local_index = np.full(self.mesh.num_cells, -1, dtype=np.int32)
        local_index[unique_cells] = np.arange(len(unique_cells), dtype=np.int32)
        disks, mask = self.mesh.grid_disks(unique_cells)  # [K, 7]
        flat = mask.ravel()
        dst_global = disks.ravel()[flat]
        keep = local_index[dst_global] >= 0
        src = np.repeat(np.arange(len(unique_cells), dtype=np.int32), 7)[flat][keep]
        dst = local_index[dst_global[keep]]
        dist = great_circle_distance_xyz(
            self.mesh.cell_xyz[unique_cells[src]], self.mesh.cell_xyz[unique_cells[dst]]
        )
        return GraphBundle(
            senders=src,
            receivers=dst,
            edge_attr=_sincos_dist(dist),
            n_senders=len(unique_cells),
            n_receivers=len(unique_cells),
        ).sorted_by_receiver()

    def __call__(self, lat_lons):
        """(encoder, decoder, latent, h3_indices), identity-cached like the
        reference (dynamic_graph_builder.py:128-155)."""
        if lat_lons is self._prev_lat_lons and self._cached is not None:
            return self._cached
        validate_lat_lons(lat_lons)
        encoder, unique_cells = self.build_encoder_graph(lat_lons)
        decoder, _ = self.build_decoder_graph(lat_lons)
        latent = self.build_latent_graph(unique_cells)
        self._prev_lat_lons = lat_lons
        self._cached = (encoder, decoder, latent, unique_cells)
        return self._cached
