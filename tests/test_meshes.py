"""Golden-value tests for mesh/graph construction.

Constants mirror the reference's asserted values: 5,882 hex cells at
resolution 2 and 41,162 latent edges (reference tests/test_model.py:31),
2,562 icosphere vertices at splits 4 (reference tests/test_gencast.py:61).
"""

import numpy as np
import pytest

from graph_weather_tpu.meshes.graphs import (
    build_grid_to_mesh_graph,
    build_latent_graph,
    build_mesh_to_grid_graph,
)
from graph_weather_tpu.meshes.hexmesh import get_hexmesh, num_cells
from graph_weather_tpu.meshes.icosphere import (
    faces_to_edges,
    get_hierarchy_of_triangular_meshes_for_sphere,
    merge_meshes,
    num_vertices,
)
from graph_weather_tpu.meshes.spherical import great_circle_distance


def _grid(spacing=10):
    return [
        (lat, lon)
        for lat in range(-90, 90, spacing)
        for lon in range(0, 360, spacing)
    ]


class TestHexMesh:
    @pytest.mark.parametrize("res,expected", [(0, 122), (1, 842), (2, 5882)])
    def test_cell_counts_match_h3(self, res, expected):
        mesh = get_hexmesh(res)
        assert mesh.num_cells == expected == num_cells(res)

    def test_twelve_pentagons(self):
        mesh = get_hexmesh(2)
        degrees = mesh.neighbor_mask.sum(axis=1)
        assert (degrees == 5).sum() == 12
        assert (degrees == 6).sum() == mesh.num_cells - 12

    def test_adjacency_symmetric(self):
        mesh = get_hexmesh(1)
        for c in range(mesh.num_cells):
            for n in mesh.neighbor_idx[c]:
                if n >= 0:
                    assert c in mesh.neighbor_idx[n]

    def test_latlng_to_cell_roundtrip(self):
        mesh = get_hexmesh(2)
        cells = mesh.latlng_to_cell(
            mesh.cell_latlon[:, 0], mesh.cell_latlon[:, 1]
        )
        np.testing.assert_array_equal(cells, np.arange(mesh.num_cells))

    def test_grid_disk_self_plus_neighbors(self):
        mesh = get_hexmesh(2)
        disk = mesh.grid_disk(100, 1)
        assert 100 in disk
        assert len(disk) in (6, 7)

    def test_cells_roughly_uniform(self):
        mesh = get_hexmesh(2)
        # Nearest-neighbor distances should be within a ~2.5x band.
        d = great_circle_distance(
            mesh.cell_latlon[:, None, :][:, 0],
            mesh.cell_latlon[mesh.neighbor_idx[:, 0]],
        )
        assert d.max() / d.min() < 2.5


class TestLatentGraph:
    def test_edge_count_matches_reference(self):
        g = build_latent_graph(resolution=2)
        assert g.n_edges == 41162  # reference tests/test_model.py:31
        assert g.n_senders == g.n_receivers == 5882

    def test_receiver_sorted_and_selfloops(self):
        g = build_latent_graph(resolution=1)
        assert np.all(np.diff(g.receivers) >= 0)
        # every node has a self-loop with edge attr [sin 0, cos 0] = [0, 1]
        self_edges = g.senders == g.receivers
        assert self_edges.sum() == g.n_receivers
        np.testing.assert_allclose(g.edge_attr[self_edges, 0], 0.0, atol=1e-6)
        np.testing.assert_allclose(g.edge_attr[self_edges, 1], 1.0, atol=1e-6)


class TestBipartiteGraphs:
    def test_grid_to_mesh_one_edge_per_point(self):
        ll = np.array(_grid(10), dtype=np.float64)
        g = build_grid_to_mesh_graph(ll)
        assert g.n_edges == len(ll)
        assert g.n_senders == len(ll)
        assert g.n_receivers == 5882
        assert set(np.unique(g.senders)) == set(range(len(ll)))

    def test_mesh_to_grid_disk_edges(self):
        ll = np.array(_grid(10), dtype=np.float64)
        g = build_mesh_to_grid_graph(ll)
        # 7 edges/point except pentagon-containing points (6).
        counts = np.bincount(g.receivers, minlength=len(ll))
        assert np.all((counts == 6) | (counts == 7))
        assert g.n_receivers == len(ll)

    def test_edge_attrs_in_unit_range(self):
        ll = np.array(_grid(20), dtype=np.float64)
        g = build_mesh_to_grid_graph(ll)
        assert np.all(np.abs(g.edge_attr) <= 1.0 + 1e-6)
        assert not np.any(np.isnan(g.edge_attr))


class TestIcosphere:
    def test_vertex_counts(self):
        meshes = get_hierarchy_of_triangular_meshes_for_sphere(4)
        for i, m in enumerate(meshes):
            assert m.vertices.shape[0] == num_vertices(i)
        assert meshes[4].vertices.shape[0] == 2562  # reference test_gencast.py:61

    def test_faces_oriented_outward(self):
        mesh = get_hierarchy_of_triangular_meshes_for_sphere(2)[-1]
        v, f = mesh.vertices, mesh.faces
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        orient = np.einsum("ij,ij->i", np.cross(b - a, c - a), (a + b + c) / 3)
        assert np.all(orient > 0)

    def test_edges_bidirectional(self):
        mesh = get_hierarchy_of_triangular_meshes_for_sphere(3)[-1]
        s, r = faces_to_edges(mesh.faces)
        fwd = set(zip(s.tolist(), r.tolist()))
        assert all((b, a) in fwd for a, b in fwd)

    def test_merge_meshes_prefix_property(self):
        meshes = get_hierarchy_of_triangular_meshes_for_sphere(3)
        merged = merge_meshes(meshes)
        assert merged.vertices.shape[0] == num_vertices(3)
        assert merged.faces.shape[0] == sum(m.faces.shape[0] for m in meshes)
        # Coarse vertices must be a prefix of fine vertices.
        np.testing.assert_allclose(
            meshes[0].vertices, meshes[-1].vertices[:12], atol=1e-12
        )
