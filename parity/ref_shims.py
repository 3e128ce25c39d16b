"""Import shims that let the PyTorch reference run in this image.

The reference depends on torch_geometric / torch_scatter (CUDA-compiled)
and the C h3 library, none of which are installable here. Each shim is a
faithful pure-torch/NumPy implementation of exactly the API surface the
reference's GraphWeather family uses (reference
models/layers/graph_net_block.py:13-14, encoder.py:28, decoder paths):

  * torch_scatter.scatter_sum  — index_add_ based, identical semantics.
  * torch_geometric.nn.MetaLayer — PyG MetaLayer forward contract
    (edge_model(src, dst, e, u, batch) then node_model(x, ei, e, u, b)).
  * torch_geometric.data.Data — attribute container with .to().
  * torch_geometric.nn.pool.knn / torch_geometric.utils.scatter —
    scipy-cKDTree kNN and index_add scatter (FengWu-GHR path).
  * h3 — backed by graph_weather_tpu's Goldberg–Coxeter hex mesh. Cell
    ids encode (resolution, mesh index) as res * 10**8 + idx, so sorted()
    order equals mesh index order and both frameworks build IDENTICAL
    graphs — parity then compares the torch math against the JAX math on
    the same topology. (True H3 ids would permute node order; converting
    a real pretrained H3-indexed checkpoint additionally needs the
    permutation between H3-sorted and hexmesh order.)

Call install() BEFORE importing anything from `graph_weather`.
"""

from __future__ import annotations

import sys
import types

import numpy as np

_RES_STRIDE = 10**8


def _make_torch_scatter():
    import torch

    mod = types.ModuleType("torch_scatter")

    def scatter_sum(src, index, dim=0, dim_size=None):
        if dim < 0:
            dim += src.dim()
        size = list(src.shape)
        size[dim] = (
            dim_size if dim_size is not None else int(index.max().item()) + 1
        )
        out = torch.zeros(*size, dtype=src.dtype, device=src.device)
        expand = [1] * src.dim()
        expand[dim] = -1
        idx = index.view(*expand).expand_as(src) if index.dim() == 1 else index
        return out.scatter_add_(dim, idx, src)

    mod.scatter_sum = scatter_sum
    return mod


def _make_torch_geometric():
    import torch

    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn_pool = types.ModuleType("torch_geometric.nn.pool")
    tg_data = types.ModuleType("torch_geometric.data")
    tg_utils = types.ModuleType("torch_geometric.utils")

    class MetaLayer(torch.nn.Module):
        """PyG MetaLayer contract (torch_geometric/nn/meta.py semantics)."""

        def __init__(self, edge_model=None, node_model=None, global_model=None):
            super().__init__()
            self.edge_model = edge_model
            self.node_model = node_model
            self.global_model = global_model

        def forward(self, x, edge_index, edge_attr=None, u=None, batch=None):
            row, col = edge_index[0], edge_index[1]
            if self.edge_model is not None:
                edge_attr = self.edge_model(
                    x[row], x[col], edge_attr, u,
                    batch if batch is None else batch[row],
                )
            if self.node_model is not None:
                x = self.node_model(x, edge_index, edge_attr, u, batch)
            if self.global_model is not None:
                u = self.global_model(x, edge_index, edge_attr, u, batch)
            return x, edge_attr, u

    class Data:
        def __init__(self, **kwargs):
            for k, v in kwargs.items():
                setattr(self, k, v)
            self._keys = list(kwargs)

        def to(self, device):
            for k in self._keys:
                v = getattr(self, k)
                if hasattr(v, "to"):
                    setattr(self, k, v.to(device))
            return self

    class HeteroData(Data):
        pass

    def knn(x, y, k, batch_x=None, batch_y=None):
        """For each y[i], its k nearest x — returns [2, k*len(y)] of
        (y_index, x_index) pairs, matching PyG's knn output layout."""
        from scipy.spatial import cKDTree

        tree = cKDTree(x.detach().cpu().numpy())
        _, idx = tree.query(y.detach().cpu().numpy(), k=k)
        idx = np.atleast_2d(idx)
        ys = np.repeat(np.arange(len(y)), k)
        return torch.tensor(
            np.stack([ys, idx.reshape(-1)]), dtype=torch.long, device=x.device
        )

    def scatter(src, index, dim=0, dim_size=None, reduce="sum"):
        ts = sys.modules["torch_scatter"]
        out = ts.scatter_sum(src, index, dim=dim, dim_size=dim_size)
        if reduce in ("mean", "avg"):
            ones = torch.ones(src.shape[dim], device=src.device)
            cnt = torch.zeros(out.shape[dim], device=src.device).scatter_add_(
                0, index, ones
            )
            shape = [1] * out.dim()
            shape[dim] = -1
            out = out / cnt.clamp(min=1).view(*shape)
        elif reduce != "sum":
            raise NotImplementedError(reduce)
        return out

    tg_nn.MetaLayer = MetaLayer
    tg_nn_pool.knn = knn
    tg_nn.pool = tg_nn_pool
    tg_data.Data = Data
    tg_data.HeteroData = HeteroData
    tg_utils.scatter = scatter
    tg.nn = tg_nn
    tg.data = tg_data
    tg.utils = tg_utils
    return {
        "torch_geometric": tg,
        "torch_geometric.nn": tg_nn,
        "torch_geometric.nn.pool": tg_nn_pool,
        "torch_geometric.data": tg_data,
        "torch_geometric.utils": tg_utils,
    }


def _make_h3():
    from graph_weather_tpu.meshes.hexmesh import get_hexmesh

    mod = types.ModuleType("h3")
    meshes = {}

    def _mesh(res):
        if res not in meshes:
            meshes[res] = get_hexmesh(res)
        return meshes[res]

    def _encode(res, idx):
        return int(res) * _RES_STRIDE + int(idx)

    def _decode(cell):
        return divmod(int(cell), _RES_STRIDE)

    def get_res0_cells():
        return [_encode(0, i) for i in range(_mesh(0).num_cells)]

    def uncompact_cells(cells, res):
        # All inputs are coarse full covers here; the fine cells are just
        # every cell at `res` (matching h3.uncompact_cells(res0, res)).
        return [_encode(res, i) for i in range(_mesh(res).num_cells)]

    def get_num_cells(res):
        return _mesh(res).num_cells

    def latlng_to_cell(lat, lng, res):
        return _encode(res, int(_mesh(res).latlng_to_cell(lat, lng)))

    def cell_to_latlng(cell):
        res, idx = _decode(cell)
        lat, lon = _mesh(res).cell_latlon[idx]
        return float(lat), float(lon)

    def grid_disk(cell, k=1):
        res, idx = _decode(cell)
        return [_encode(res, i) for i in np.atleast_1d(_mesh(res).grid_disk(idx, k))]

    def great_circle_distance(a, b, unit="km"):
        lat1, lon1 = np.radians(a[0]), np.radians(a[1])
        lat2, lon2 = np.radians(b[0]), np.radians(b[1])
        d = 2 * np.arcsin(
            np.sqrt(
                np.sin((lat2 - lat1) / 2) ** 2
                + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
            )
        )
        if unit == "rads":
            return float(d)
        if unit == "km":
            return float(d) * 6371.0
        raise NotImplementedError(unit)

    def cell_to_children(cell, res):
        raise NotImplementedError("stretched-mesh path not shimmed")

    mod.get_res0_cells = get_res0_cells
    mod.uncompact_cells = uncompact_cells
    mod.get_num_cells = get_num_cells
    mod.latlng_to_cell = latlng_to_cell
    mod.cell_to_latlng = cell_to_latlng
    mod.grid_disk = grid_disk
    mod.great_circle_distance = great_circle_distance
    mod.cell_to_children = cell_to_children
    return mod


class _AutoStub(types.ModuleType):
    """Module stub whose attributes are inert placeholders.

    Lets `graph_weather.__init__`'s data-layer imports (anemoi, xarray,
    zarr, ...) resolve without the packages; anything actually CALLED from
    a stub raises, so parity runs can't silently use fake data code.
    """

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)

        def _fail(*a, **k):
            raise NotImplementedError(
                f"stubbed module {self.__name__}.{name} was called"
            )

        return _fail


_DATA_STUBS = [
    "anemoi", "anemoi.datasets", "xarray", "zarr", "pysolar", "pysolar.solar",
    "pysolar.util", "fsspec", "icechunk", "nnja", "nnja.io", "nnja_ai",
    "trimesh", "natten", "natten.functional", "dgl", "dgl.sparse",
    "torch_harmonics", "healpy", "dacite", "torchvision",
    "torchvision.transforms",
]


def install() -> None:
    """Install all shims into sys.modules (idempotent)."""
    if "torch_scatter" not in sys.modules:
        sys.modules["torch_scatter"] = _make_torch_scatter()
    if "torch_geometric" not in sys.modules:
        sys.modules.update(_make_torch_geometric())
    if "h3" not in sys.modules:
        sys.modules["h3"] = _make_h3()
    for name in _DATA_STUBS:
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = _AutoStub(name)


def add_reference_to_path(ref="/root/reference") -> None:
    import os

    ref = os.environ.get("GRAPH_WEATHER_REF", ref)
    if ref not in sys.path:
        sys.path.insert(0, ref)
