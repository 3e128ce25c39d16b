"""GraphCast-family graphs: g2m (radius), mesh, m2g (triangle), k-hop.

Equivalent of the reference GraphBuilder (reference
models/gencast/graph/graph_builder.py:70-372) emitting static GraphBundles
plus precomputed spatial node features. The k-hop expansion uses
scipy.sparse boolean matrix powers with self-loop removal (the reference
uses torch.sparse on CPU, graph_builder.py:309-372).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp

from graph_weather_tpu.meshes.connectivity import (
    in_mesh_triangle_indices,
    radius_query_indices,
)
from graph_weather_tpu.meshes.graphs import GraphBundle
from graph_weather_tpu.meshes.icosphere import (
    TriangularMesh,
    faces_to_edges,
    get_hierarchy_of_triangular_meshes_for_sphere,
)
from graph_weather_tpu.meshes.spatial import (
    edge_spatial_features,
    node_spatial_features,
)

RADIUS_QUERY_FRACTION_EDGE_LENGTH = 0.6  # reference graph_builder.py:60


def _max_edge_length(mesh: TriangularMesh) -> float:
    s, r = faces_to_edges(mesh.faces)
    return float(np.linalg.norm(mesh.vertices[s] - mesh.vertices[r], axis=-1).max())


def khop_edges(
    senders: np.ndarray, receivers: np.ndarray, n: int, num_hops: int
) -> tuple[np.ndarray, np.ndarray]:
    """Edges of the <=num_hops-neighborhood graph (no self loops).

    Uses the native C++ stamped-BFS expander (csrc/meshops.cpp) when the
    toolchain is available — linear memory vs the quadratic intermediates of
    matrix powers at splits 6 — with a scipy boolean-matrix-power fallback
    mirroring reference graph_builder.py:309-355. Both paths produce the
    same edge SET; ordering is normalized downstream by receiver sorting.
    """
    from graph_weather_tpu.csrc import khop_edges_native

    native = khop_edges_native(senders, receivers, n, num_hops)
    if native is not None:
        return native

    adj = sp.csr_matrix(
        (np.ones_like(senders, dtype=bool), (senders, receivers)), shape=(n, n)
    )
    adj_k = adj.copy()
    for _ in range(num_hops - 1):
        adj_k = (adj_k + adj_k @ adj).astype(bool)
        adj_k.setdiag(False)
        adj_k.eliminate_zeros()
    coo = adj_k.tocoo()
    return coo.row.astype(np.int32), coo.col.astype(np.int32)


def _mesh_latlon(mesh: TriangularMesh) -> tuple[np.ndarray, np.ndarray]:
    v = mesh.vertices
    lat = 90.0 - np.rad2deg(np.arccos(np.clip(v[:, 2], -1, 1)))
    lon = np.mod(np.rad2deg(np.arctan2(v[:, 1], v[:, 0])), 360.0)
    return lat.astype(np.float32), lon.astype(np.float32)


@dataclass(frozen=True)
class GraphCastGraphs:
    """All static arrays for a GenCast/GraphCast-style model.

    Attributes mirror the reference GraphBuilder's public surface:
    grid_nodes_dim / mesh_nodes_dim / *_edges_dim, plus bundles whose
    edge_attr are the 4-dim receiver-local spatial features.
    """

    g2m: GraphBundle
    mesh: GraphBundle
    m2g: GraphBundle
    khop: GraphBundle | None
    grid_node_feats: np.ndarray  # [N_grid, 3]
    mesh_node_feats: np.ndarray  # [N_mesh, 3]
    mesh_vertices: np.ndarray  # [N_mesh, 3]

    @property
    def grid_nodes_dim(self) -> int:
        return self.grid_node_feats.shape[1]

    @property
    def mesh_nodes_dim(self) -> int:
        return self.mesh_node_feats.shape[1]

    @property
    def g2m_edges_dim(self) -> int:
        return self.g2m.edge_attr.shape[1]

    @property
    def mesh_edges_dim(self) -> int:
        return self.mesh.edge_attr.shape[1]

    @property
    def m2g_edges_dim(self) -> int:
        return self.m2g.edge_attr.shape[1]


# Bump when the builder's output changes for identical arguments (cache
# entries from older versions are then ignored).
_GRAPH_CACHE_VERSION = 1


def _graph_cache_path(args_key: tuple) -> "str | None":
    import hashlib
    import os

    if os.environ.get("GRAPH_WEATHER_TPU_GRAPH_CACHE", "1") == "0":
        return None
    root = os.environ.get(
        "GRAPH_WEATHER_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "graph_weather_tpu"),
    )
    h = hashlib.sha256(repr(args_key).encode()).hexdigest()[:24]
    return os.path.join(root, f"graphs_v{_GRAPH_CACHE_VERSION}_{h}.npz")


def _save_graphs_cache(path: str, graphs: "GraphCastGraphs") -> None:
    import os

    arrays = {
        "grid_node_feats": graphs.grid_node_feats,
        "mesh_node_feats": graphs.mesh_node_feats,
        "mesh_vertices": graphs.mesh_vertices,
        "has_khop": np.array(graphs.khop is not None),
    }
    bundles = {"g2m": graphs.g2m, "mesh": graphs.mesh, "m2g": graphs.m2g}
    if graphs.khop is not None:
        bundles["khop"] = graphs.khop
    for name, b in bundles.items():
        arrays[f"{name}_senders"] = b.senders
        arrays[f"{name}_receivers"] = b.receivers
        arrays[f"{name}_edge_attr"] = b.edge_attr
        arrays[f"{name}_dims"] = np.array([b.n_senders, b.n_receivers])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".{os.getpid()}.tmp.npz"  # atomic publish, race-safe
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def _load_graphs_cache(path: str) -> "GraphCastGraphs | None":
    import os

    if not os.path.exists(path):
        return None
    try:
        z = np.load(path)

        def bundle(name):
            dims = z[f"{name}_dims"]
            return GraphBundle(
                senders=z[f"{name}_senders"],
                receivers=z[f"{name}_receivers"],
                edge_attr=z[f"{name}_edge_attr"],
                n_senders=int(dims[0]),
                n_receivers=int(dims[1]),
            )

        return GraphCastGraphs(
            g2m=bundle("g2m"),
            mesh=bundle("mesh"),
            m2g=bundle("m2g"),
            khop=bundle("khop") if bool(z["has_khop"]) else None,
            grid_node_feats=z["grid_node_feats"],
            mesh_node_feats=z["mesh_node_feats"],
            mesh_vertices=z["mesh_vertices"],
        )
    except Exception:
        return None  # corrupt/partial cache entry: rebuild


def build_graphcast_graphs(
    grid_lon: np.ndarray,
    grid_lat: np.ndarray,
    splits: int = 5,
    num_hops: int = 0,
    add_edge_features_to_khop: bool = True,
    mesh2grid_edge_normalization_factor: float | None = None,
    spatial_sort: bool | str = True,
    mesh_orientation: str = "pole",
) -> GraphCastGraphs:
    """Build g2m / mesh / m2g (/ k-hop) bundles for a lon-major grid.

    Grid node order is lat-major flattening of meshgrid(lon, lat) i.e.
    index = lat_i * n_lon + lon_i... matching the reference's
    np.meshgrid(grid_lon, grid_lat) reshape (graph_builder.py:164-166);
    note the DATA layout convention of GenCast models is [lon, lat] and is
    transposed accordingly in the model wrapper.

    spatial_sort renumbers MESH vertices: subdivision order scatters
    spatial neighbors across the index space. True/"latlon" sorts by
    (lat, lon) — near-contiguous gathers and small band spans (banded
    attention). "rcb" orders by recursive coordinate bisection so every
    aligned 512-vertex slice is a compact geodesic patch — the layout the
    clustered flash attention needs (meshes/clustering.py). Purely an
    internal relabeling — node features and all edge indices are permuted
    consistently.
    """
    grid_lon = np.asarray(grid_lon, dtype=np.float64)
    grid_lat = np.asarray(grid_lat, dtype=np.float64)
    # Host graph construction takes ~40 s at splits 6; cache the result on
    # disk keyed by ALL build inputs (opt out: GRAPH_WEATHER_TPU_GRAPH_CACHE=0,
    # relocate: GRAPH_WEATHER_TPU_CACHE_DIR).
    cache_path = _graph_cache_path((
        grid_lon.tobytes(), grid_lat.tobytes(), splits, num_hops,
        add_edge_features_to_khop, mesh2grid_edge_normalization_factor,
        spatial_sort, mesh_orientation,
    ))
    if cache_path is not None:
        cached = _load_graphs_cache(cache_path)
        if cached is not None:
            return cached
    # mesh_orientation="graphcast" reproduces the reference's icosahedron
    # rotation (geometry-identical graphs, e.g. for pretrained weights);
    # the default "pole" keeps a vertex at the north pole.
    mesh = get_hierarchy_of_triangular_meshes_for_sphere(
        splits, orientation=mesh_orientation
    )[-1]
    if spatial_sort:
        if spatial_sort == "rcb":
            from graph_weather_tpu.meshes.clustering import rcb_order

            order = rcb_order(mesh.vertices, leaf=512)
        else:
            from graph_weather_tpu.meshes.spherical import canonical_point_order

            order = canonical_point_order(mesh.vertices)
        inverse = np.empty_like(order)
        inverse[order] = np.arange(order.shape[0])
        mesh = TriangularMesh(
            vertices=mesh.vertices[order], faces=inverse[mesh.faces]
        )
    mesh_lat, mesh_lon = _mesh_latlon(mesh)

    lon_g, lat_g = np.meshgrid(grid_lon, grid_lat)
    grid_nodes_lat = lat_g.reshape(-1).astype(np.float32)
    grid_nodes_lon = lon_g.reshape(-1).astype(np.float32)
    n_grid = grid_nodes_lat.shape[0]
    n_mesh = mesh.vertices.shape[0]

    radius = _max_edge_length(mesh) * RADIUS_QUERY_FRACTION_EDGE_LENGTH

    # g2m
    g_idx, m_idx = radius_query_indices(grid_lat, grid_lon, mesh, radius)
    g2m_attr = edge_spatial_features(
        grid_nodes_lat, grid_nodes_lon, mesh_lat, mesh_lon, g_idx, m_idx
    )
    g2m = GraphBundle(
        senders=g_idx,
        receivers=m_idx,
        edge_attr=g2m_attr,
        n_senders=n_grid,
        n_receivers=n_mesh,
    ).sorted_by_receiver()

    # mesh
    s, r = faces_to_edges(mesh.faces)
    s = s.astype(np.int32)
    r = r.astype(np.int32)
    mesh_attr = edge_spatial_features(mesh_lat, mesh_lon, mesh_lat, mesh_lon, s, r)
    mesh_bundle = GraphBundle(
        senders=s, receivers=r, edge_attr=mesh_attr, n_senders=n_mesh, n_receivers=n_mesh
    ).sorted_by_receiver()

    # m2g: senders are the 3 vertices of each grid point's containing triangle
    g_idx2, m_idx2 = in_mesh_triangle_indices(grid_lat, grid_lon, mesh)
    m2g_attr = edge_spatial_features(
        mesh_lat,
        mesh_lon,
        grid_nodes_lat,
        grid_nodes_lon,
        m_idx2,
        g_idx2,
        edge_normalization_factor=mesh2grid_edge_normalization_factor,
    )
    m2g = GraphBundle(
        senders=m_idx2,
        receivers=g_idx2,
        edge_attr=m2g_attr,
        n_senders=n_mesh,
        n_receivers=n_grid,
    ).sorted_by_receiver()

    # k-hop
    khop = None
    if num_hops > 0:
        ks, kr = khop_edges(s, r, n_mesh, num_hops)
        if add_edge_features_to_khop:
            k_attr = edge_spatial_features(mesh_lat, mesh_lon, mesh_lat, mesh_lon, ks, kr)
        else:
            k_attr = np.zeros((ks.shape[0], 0), dtype=np.float32)
        khop = GraphBundle(
            senders=ks, receivers=kr, edge_attr=k_attr, n_senders=n_mesh, n_receivers=n_mesh
        ).sorted_by_receiver()

    graphs = GraphCastGraphs(
        g2m=g2m,
        mesh=mesh_bundle,
        m2g=m2g,
        khop=khop,
        grid_node_feats=node_spatial_features(grid_nodes_lat, grid_nodes_lon),
        mesh_node_feats=node_spatial_features(mesh_lat, mesh_lon),
        mesh_vertices=mesh.vertices,
    )
    if cache_path is not None:
        _save_graphs_cache(cache_path, graphs)
    return graphs
