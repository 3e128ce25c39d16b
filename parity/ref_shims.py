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

import importlib.machinery
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

        def __getattr__(self, name):
            # PyG Data yields None for unset attributes (e.g. edge_attr
            # when edge features are disabled).
            if name.startswith("_"):
                raise AttributeError(name)
            return None

        def to(self, device):
            for k in self._keys:
                v = getattr(self, k)
                if hasattr(v, "to"):
                    setattr(self, k, v.to(device))
            return self

    class _Storage:
        """Node/edge-type storage namespace of a HeteroData."""

        def to(self, device):
            for k, v in list(vars(self).items()):
                if hasattr(v, "to"):
                    setattr(self, k, v.to(device))
            return self

    class HeteroData:
        """PyG-style heterogeneous graph container: data["type"].attr."""

        def __init__(self):
            self._stores = {}

        def __getitem__(self, key):
            if key not in self._stores:
                self._stores[key] = _Storage()
            return self._stores[key]

        def to(self, device):
            for s in self._stores.values():
                s.to(device)
            return self

    def knn(x, y, k, batch_x=None, batch_y=None, num_workers=1):
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

    def segment_softmax(alpha, index, num_nodes):
        """PyG `softmax(src, index)`: per-receiver-segment softmax."""
        m = torch.full(
            (num_nodes,) + alpha.shape[1:], float("-inf"), device=alpha.device
        )
        m = m.scatter_reduce(
            0, index.view(-1, *([1] * (alpha.dim() - 1))).expand_as(alpha),
            alpha, reduce="amax", include_self=True,
        )
        e = torch.exp(alpha - m[index])
        s = torch.zeros_like(m).scatter_add_(
            0, index.view(-1, *([1] * (alpha.dim() - 1))).expand_as(e), e
        )
        return e / s[index].clamp(min=1e-16)

    class MessagePassing(torch.nn.Module):
        """Minimal PyG MessagePassing: add-aggregation, source_to_target.

        Supports the InteractionNetwork pattern (reference
        gencast/layers/modules.py:70-157): propagate(edge_index, x=(xs,xr),
        edge_attr=..., size=...) -> scatter_add(message(x_i, x_j, e)).
        """

        def __init__(self, aggr="add", flow="source_to_target", node_dim=0):
            super().__init__()
            assert aggr == "add" and flow == "source_to_target"

        def propagate(self, edge_index, x, edge_attr=None, size=None):
            src, dst = edge_index[0], edge_index[1]
            x_s, x_r = x if isinstance(x, tuple) else (x, x)
            n_out = size[1] if size is not None else x_r.shape[0]
            msg = self.message(x_r[dst], x_s[src], edge_attr)
            out = torch.zeros(
                (n_out,) + msg.shape[1:], dtype=msg.dtype, device=msg.device
            )
            return out.scatter_add_(
                0, dst.view(-1, *([1] * (msg.dim() - 1))).expand_as(msg), msg
            )

    class TransformerConv(torch.nn.Module):
        """Faithful PyG TransformerConv (UniMP; Shi et al. 2021) forward:
        q_i k_j attention with optional edge features added to key/value,
        per-receiver softmax, concat/mean heads, root skip + beta gate
        (gate input order [out, x_r, out - x_r] as in PyG)."""

        def __init__(
            self, in_channels, out_channels, heads=1, concat=True,
            beta=False, dropout=0.0, edge_dim=None, bias=True,
            root_weight=True,
        ):
            super().__init__()
            H, C = heads, out_channels
            self.heads, self.out_channels = H, C
            self.concat, self.edge_dim = concat, edge_dim
            self.root_weight = root_weight
            self.lin_key = torch.nn.Linear(in_channels, H * C)
            self.lin_query = torch.nn.Linear(in_channels, H * C)
            self.lin_value = torch.nn.Linear(in_channels, H * C)
            if edge_dim is not None:
                self.lin_edge = torch.nn.Linear(edge_dim, H * C, bias=False)
            final = H * C if concat else C
            if root_weight:
                self.lin_skip = torch.nn.Linear(in_channels, final, bias=bias)
                if beta:
                    self.lin_beta = torch.nn.Linear(3 * final, 1, bias=False)
                else:
                    self.lin_beta = None

        def forward(self, x, edge_index, edge_attr=None):
            H, C = self.heads, self.out_channels
            src, dst = edge_index[0], edge_index[1]
            q = self.lin_query(x).view(-1, H, C)[dst]
            k = self.lin_key(x).view(-1, H, C)[src]
            v = self.lin_value(x).view(-1, H, C)[src]
            if self.edge_dim is not None and edge_attr is not None:
                e = self.lin_edge(edge_attr).view(-1, H, C)
                k = k + e
                v = v + e
            alpha = (q * k).sum(-1) / (C**0.5)  # [E, H]
            alpha = segment_softmax(alpha, dst, x.shape[0])
            msg = v * alpha.unsqueeze(-1)
            out = torch.zeros(
                (x.shape[0], H, C), dtype=msg.dtype, device=msg.device
            ).scatter_add_(0, dst.view(-1, 1, 1).expand_as(msg), msg)
            out = out.reshape(-1, H * C) if self.concat else out.mean(dim=1)
            if self.root_weight:
                x_r = self.lin_skip(x)
                if self.lin_beta is not None:
                    b = torch.sigmoid(
                        self.lin_beta(torch.cat([out, x_r, out - x_r], -1))
                    )
                    out = b * x_r + (1 - b) * out
                else:
                    out = out + x_r
            return out

    tg_nn_conv = types.ModuleType("torch_geometric.nn.conv")
    tg_nn_conv.TransformerConv = TransformerConv
    tg_nn.MetaLayer = MetaLayer
    tg_nn.MessagePassing = MessagePassing
    tg_nn.TransformerConv = TransformerConv
    tg_nn.conv = tg_nn_conv
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
        "torch_geometric.nn.conv": tg_nn_conv,
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

    def __init__(self, name):
        super().__init__(name)
        # torch._dynamo.trace_rules probes importlib.util.find_spec on many
        # modules (even with dynamo disabled, via Optimizer.__init__); a
        # module with __spec__ None there raises ValueError. Give stubs a
        # real (loader-less) spec so find_spec returns cleanly.
        self.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _StubAttr(f"{self.__name__}.{name}")


class _StubAttr:
    """Inert placeholder: supports further attribute access (so type
    annotations like dglsp.SparseMatrix resolve) but raises if called."""

    def __init__(self, path):
        self._path = path

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _StubAttr(f"{self._path}.{name}")

    def __call__(self, *a, **k):
        raise NotImplementedError(f"stubbed {self._path} was called")


_DATA_STUBS = [
    "anemoi", "anemoi.datasets", "xarray", "zarr", "pysolar", "pysolar.solar",
    "pysolar.util", "fsspec", "icechunk", "nnja", "nnja.io", "nnja_ai",
    "natten", "natten.functional", "dgl", "dgl.sparse",
    "torch_harmonics", "healpy", "torchvision",
    "torchvision.transforms",
]


def _make_dacite():
    """Minimal working dacite.from_dict (the reference only uses flat and
    one-level-nested dataclass configs)."""
    import dataclasses

    mod = types.ModuleType("dacite")

    def from_dict(data_class, data, config=None):
        kwargs = {}
        for f in dataclasses.fields(data_class):
            if f.name not in data:
                continue
            v = data[f.name]
            if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
                v = from_dict(f.type, v)
            kwargs[f.name] = v
        return data_class(**kwargs)

    mod.from_dict = from_dict
    mod.Config = type("Config", (), {"__init__": lambda self, **k: None})
    return mod


def _make_trimesh():
    """trimesh.Trimesh + proximity.closest_point, backed by the framework's
    gnomonic containing-triangle query (meshes/connectivity.py). On a
    convex sphere mesh the face with the closest surface point IS the
    radially containing face, which is all the reference uses it for
    (reference gencast/graph/grid_mesh_connectivity.py:116-119)."""
    mod = types.ModuleType("trimesh")
    prox = types.ModuleType("trimesh.proximity")

    class Trimesh:
        def __init__(self, vertices=None, faces=None):
            self.vertices = np.asarray(vertices, dtype=np.float64)
            self.faces = np.asarray(faces)

    def closest_point(mesh, points):
        from graph_weather_tpu.meshes.connectivity import containing_triangles
        from graph_weather_tpu.meshes.icosphere import TriangularMesh

        pts = np.asarray(points, dtype=np.float64)
        pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
        fidx = containing_triangles(
            pts, TriangularMesh(vertices=mesh.vertices, faces=mesh.faces)
        )
        return None, None, fidx

    prox.closest_point = closest_point
    mod.Trimesh = Trimesh
    mod.proximity = prox
    return {"trimesh": mod, "trimesh.proximity": prox}


def _make_natten():
    """Pure-torch natten shim: NeighborhoodAttention3D with NATTEN
    semantics — every query attends to exactly kernel_size neighbors, the
    window CLAMPS (slides inward) at boundaries, a learnable relative-
    position bias indexed by (key - query) offset is added, and q is
    scaled by head_dim^-0.5. Parameter layout matches natten's module
    (qkv / rpb / proj) so state_dicts convert 1:1. Brute-force O(volume x
    window) gather — parity-scale volumes only."""
    import torch

    mod = types.ModuleType("natten")

    def _axis_windows(size, kernel):
        i = np.arange(size)[:, None]
        start = np.clip(i - kernel // 2, 0, size - kernel)
        idx = start + np.arange(kernel)[None, :]
        rel = idx - i + kernel - 1  # in [0, 2*kernel-2]
        return idx, rel

    class NeighborhoodAttention3D(torch.nn.Module):
        def __init__(
            self,
            embed_dim=None,
            num_heads=8,
            kernel_size=(5, 7, 7),
            dim=None,
            qkv_bias=True,
            qk_scale=None,
            **kwargs,
        ):
            super().__init__()
            dim = embed_dim if embed_dim is not None else dim
            if isinstance(kernel_size, int):
                kernel_size = (kernel_size,) * 3
            self.dim = dim
            self.num_heads = num_heads
            self.kernel_size = tuple(kernel_size)
            self.head_dim = dim // num_heads
            self.scale = qk_scale or self.head_dim**-0.5
            kd, kh, kw = self.kernel_size
            self.qkv = torch.nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.rpb = torch.nn.Parameter(
                torch.zeros(num_heads, 2 * kd - 1, 2 * kh - 1, 2 * kw - 1)
            )
            self.proj = torch.nn.Linear(dim, dim)

        def forward(self, x):
            b, d, h, w, c = x.shape
            kd, kh, kw = self.kernel_size
            nh, ch = self.num_heads, self.head_dim
            qkv = self.qkv(x).reshape(b, d, h, w, 3, nh, ch)
            q, k, v = qkv.unbind(dim=4)  # [B, D, H, W, nh, ch]

            id_, rd = _axis_windows(d, kd)
            ih_, rh = _axis_windows(h, kh)
            iw_, rw = _axis_windows(w, kw)

            # Gather each query's kd*kh*kw neighborhood of k/v.
            def gather(t):
                t = t[:, torch.tensor(id_)]  # [B, D, kd, H, W, nh, ch]
                t = t[:, :, :, torch.tensor(ih_)]  # [B, D, kd, H, kh, W, ...]
                t = t[:, :, :, :, :, torch.tensor(iw_)]
                # -> [B, D, kd, H, kh, W, kw, nh, ch]
                return t

            kn = gather(k)
            vn = gather(v)
            logits = torch.einsum("bdhwnc,bdxhywznc->bdhwnxyz", q * self.scale, kn)
            bias = self.rpb[
                :,
                torch.tensor(rd)[:, None, None, :, None, None],
                torch.tensor(rh)[None, :, None, None, :, None],
                torch.tensor(rw)[None, None, :, None, None, :],
            ]  # [nh, D, H, W, kd, kh, kw]
            logits = logits + bias.permute(1, 2, 3, 0, 4, 5, 6)[None]
            attn = torch.softmax(
                logits.reshape(b, d, h, w, nh, -1), dim=-1
            ).reshape(logits.shape)
            out = torch.einsum("bdhwnxyz,bdxhywznc->bdhwnc", attn, vn)
            return self.proj(out.reshape(b, d, h, w, c))

    mod.NeighborhoodAttention3D = NeighborhoodAttention3D
    return mod


def install() -> None:
    """Install all shims into sys.modules (idempotent)."""
    if "natten" not in sys.modules:
        sys.modules["natten"] = _make_natten()
    if "torch_scatter" not in sys.modules:
        sys.modules["torch_scatter"] = _make_torch_scatter()
    if "torch_geometric" not in sys.modules:
        sys.modules.update(_make_torch_geometric())
    if "h3" not in sys.modules:
        sys.modules["h3"] = _make_h3()
    if "trimesh" not in sys.modules:
        sys.modules.update(_make_trimesh())
    if "dacite" not in sys.modules:
        try:
            import dacite  # noqa: F401
        except ImportError:
            sys.modules["dacite"] = _make_dacite()
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
