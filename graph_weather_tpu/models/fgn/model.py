"""FGN: noise-vector-conditioned ensemble forecaster.

Equivalent of reference models/fgn/model.py:60-351 and
models/fgn/layers/processor.py:20-180: the GenCast encoder/decoder with a
processor whose ConditionalLayerNorms condition directly on a random noise
VECTOR (no Fourier embedding, no noise level). `forward` draws a fresh
gaussian per ensemble member; here the ensemble axis is a `vmap` over PRNG
keys inside one jitted program instead of a Python loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from graph_weather_tpu.models.gencast.graphs import build_graphcast_graphs
from graph_weather_tpu.models.gencast.layers import (
    GenCastDecoder,
    GenCastEncoder,
)
from graph_weather_tpu.models.gencast.modules import (
    CondTransformerBlock,
    GenCastMLP,
    cluster_pad_rows,
    cluster_unpad_rows,
)
from graph_weather_tpu.nn.graph_blocks import DeviceGraph


class FGNProcessor(nn.Module):
    """Transformer blocks conditioned on a raw noise vector.

    Reference models/fgn/layers/processor.py: same block stack as GenCast's
    processor (last block averages heads, no activation) but `cond` is the
    noise vector itself.
    """

    latent_dim: int
    hidden_dims: tuple[int, ...]
    num_blocks: int = 24
    num_heads: int = 4
    use_edge_features: bool = True
    activation: Callable = nn.silu
    use_layer_norm: bool = True
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latent_mesh: jnp.ndarray,  # [B, N_mesh, latent]
        noise_vector: jnp.ndarray,  # [B, noise_dim]
        khop: DeviceGraph,
    ) -> jnp.ndarray:
        if self.latent_dim % self.num_heads != 0:
            raise ValueError("latent_dim must be divisible by num_heads")
        cond = noise_vector[:, None, :]

        edge_attr = None
        if self.use_edge_features and khop.edge_attr.shape[-1] > 0:
            edge_attr = GenCastMLP(
                self.hidden_dims, self.activation, self.use_layer_norm
            )(khop.edge_attr)

        # One pad/slice around the whole stack (see GenCastProcessor).
        n_real = latent_mesh.shape[-2]
        latent_mesh = cluster_pad_rows(latent_mesh, khop)

        block_cls = CondTransformerBlock
        if self.remat:
            block_cls = nn.remat(CondTransformerBlock, static_argnums=())
        for i in range(self.num_blocks - 1):
            latent_mesh = block_cls(
                out_channels=self.latent_dim // self.num_heads,
                num_heads=self.num_heads,
                concat=True,
                beta=True,
                use_edge_features=edge_attr is not None,
                activation=self.activation,
                name=f"CondTransformerBlock_{i}",
            )(latent_mesh, khop, edge_attr, cond)
        latent_mesh = block_cls(
            out_channels=self.latent_dim,
            num_heads=self.num_heads,
            concat=False,
            beta=True,
            use_edge_features=edge_attr is not None,
            activation=None,
            name=f"CondTransformerBlock_{self.num_blocks - 1}",
        )(latent_mesh, khop, edge_attr, cond)
        return cluster_unpad_rows(latent_mesh, n_real)


class FGNModule(nn.Module):
    """Pure flax single-member forward: state + noise vector -> prediction."""

    output_features_dim: int
    hidden_dims: tuple[int, ...] = (768, 768)
    num_blocks: int = 24
    num_heads: int = 4
    use_edge_features: bool = True
    scale_factor: float = 1.0
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        prev_state: jnp.ndarray,  # [B, N_grid, F_in]
        noise_vector: jnp.ndarray,  # [B, noise_dim]
        grid_node_feats: jnp.ndarray,
        mesh_node_feats: jnp.ndarray,
        g2m: DeviceGraph,
        khop: DeviceGraph,
        m2g: DeviceGraph,
    ) -> jnp.ndarray:
        batch = prev_state.shape[0]
        grid_feats = jnp.concatenate(
            [
                prev_state,
                jnp.broadcast_to(grid_node_feats, (batch,) + grid_node_feats.shape),
            ],
            axis=-1,
        )
        latent_grid, latent_mesh = GenCastEncoder(
            hidden_dims=self.hidden_dims, scale_factor=self.scale_factor
        )(grid_feats, mesh_node_feats, g2m)
        latent_mesh = FGNProcessor(
            latent_dim=self.hidden_dims[-1],
            hidden_dims=self.hidden_dims,
            num_blocks=self.num_blocks,
            num_heads=self.num_heads,
            use_edge_features=self.use_edge_features,
            remat=self.remat,
        )(latent_mesh, noise_vector, khop)
        return GenCastDecoder(
            output_dim=self.output_features_dim, hidden_dims=self.hidden_dims
        )(latent_mesh, latent_grid, m2g)


@dataclass
class FunctionalGenerativeNetworkConfig:
    """Mirrors reference models/fgn/model.py:17-57."""

    grid_lon: np.ndarray
    grid_lat: np.ndarray
    input_features_dim: int
    output_features_dim: int
    noise_dimension: int
    hidden_dims: tuple = (768, 768)
    num_blocks: int = 24
    num_heads: int = 4
    splits: int = 6
    num_hops: int = 6
    use_edges_features: bool = True
    scale_factor: float = 1.0
    remat: bool = False
    attention_impl: str = "segment"

    def build(self) -> "FunctionalGenerativeNetwork":
        return FunctionalGenerativeNetwork(
            grid_lon=self.grid_lon,
            grid_lat=self.grid_lat,
            input_features_dim=self.input_features_dim,
            output_features_dim=self.output_features_dim,
            noise_dimension=self.noise_dimension,
            hidden_dims=tuple(self.hidden_dims),
            num_blocks=self.num_blocks,
            num_heads=self.num_heads,
            splits=self.splits,
            num_hops=self.num_hops,
            use_edges_features=self.use_edges_features,
            scale_factor=self.scale_factor,
            remat=self.remat,
            attention_impl=self.attention_impl,
        )


class FunctionalGenerativeNetwork:
    """FGN handle: [B, lon, lat, F_in] -> [B, E, lon, lat, F_out] ensemble."""

    def __init__(
        self,
        grid_lon: np.ndarray,
        grid_lat: np.ndarray,
        input_features_dim: int,
        output_features_dim: int,
        noise_dimension: int,
        hidden_dims: tuple[int, ...] = (768, 768),
        num_blocks: int = 24,
        num_heads: int = 4,
        splits: int = 6,
        num_hops: int = 6,
        use_edges_features: bool = True,
        scale_factor: float = 1.0,
        remat: bool = False,
        attention_impl: str = "segment",
        mesh_orientation: str = "pole",
        node_layout: str = "consistent",
    ):
        if attention_impl not in (
            "segment", "banded", "banded_flash", "clustered_flash"
        ):
            raise ValueError(f"unknown attention_impl {attention_impl!r}")
        if node_layout not in ("consistent", "reference"):
            raise ValueError(f"unknown node_layout {node_layout!r}")
        self.node_layout = node_layout
        if attention_impl != "segment" and use_edges_features:
            raise ValueError(
                f"attention_impl={attention_impl!r} requires use_edges_features="
                "False "
                "(banded attention carries no per-edge features; see "
                "ops/banded_attention.py)"
            )
        self.num_lon = len(grid_lon)
        self.num_lat = len(grid_lat)
        self.input_features_dim = input_features_dim
        self.output_features_dim = output_features_dim
        self.noise_dimension = noise_dimension

        graphs = build_graphcast_graphs(
            grid_lon,
            grid_lat,
            splits=splits,
            num_hops=num_hops,
            add_edge_features_to_khop=use_edges_features,
            spatial_sort="rcb" if attention_impl == "clustered_flash" else True,
            mesh_orientation=mesh_orientation,
        )
        self.graphs = graphs
        self.g2m = DeviceGraph.from_bundle(graphs.g2m)
        self.khop = DeviceGraph.from_bundle(
            graphs.khop,
            banded=attention_impl.startswith("banded"),
            band_flash=(attention_impl == "banded_flash"),
            clustered=(attention_impl == "clustered_flash"),
        )
        self.m2g = DeviceGraph.from_bundle(graphs.m2g)
        self.grid_node_feats = jnp.asarray(graphs.grid_node_feats)
        self.mesh_node_feats = jnp.asarray(graphs.mesh_node_feats)

        self.module = FGNModule(
            output_features_dim=output_features_dim,
            hidden_dims=tuple(hidden_dims),
            num_blocks=num_blocks,
            num_heads=num_heads,
            use_edge_features=use_edges_features,
            scale_factor=scale_factor,
            remat=remat,
        )
        self._jit_apply = None
        self._jit_init = None

    # Layout quirk handling identical to Denoiser._to_nodes (the reference
    # FGN flattens data lon-major against lat-major graphs too,
    # reference models/fgn/model.py:334-336).
    def _to_nodes(self, x):
        b, lon, lat, f = x.shape
        if self.node_layout == "reference":
            return x.reshape(b, lon * lat, f)
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, lat * lon, f)

    def _from_nodes(self, x):
        b, n, f = x.shape
        if self.node_layout == "reference":
            return x.reshape(b, self.num_lon, self.num_lat, f)
        return jnp.transpose(
            x.reshape(b, self.num_lat, self.num_lon, f), (0, 2, 1, 3)
        )

    def init(self, rng: jax.Array, batch_size: int = 1):
        if self._jit_init is None:
            self._jit_init = jax.jit(
                lambda rng, s, z: self.module.init(
                    rng,
                    s,
                    z,
                    self.grid_node_feats,
                    self.mesh_node_feats,
                    self.g2m,
                    self.khop,
                    self.m2g,
                )
            )
        n = self.num_lon * self.num_lat
        state = jnp.zeros((batch_size, n, self.input_features_dim))
        noise = jnp.zeros((batch_size, self.noise_dimension))
        return self._jit_init(rng, state, noise)

    def member_fn(self, compute_dtype=None):
        """Pure (params, prev_state [B,lon,lat,F], noise_vector) -> prediction.

        compute_dtype=bf16 runs the network in bf16 (params/inputs/static
        features cast; output back in f32) — same policy as
        Denoiser.forward_fn."""
        module = self.module
        consts = [
            self.grid_node_feats,
            self.mesh_node_feats,
            self.g2m,
            self.khop,
            self.m2g,
        ]
        if compute_dtype is not None:
            consts[0] = consts[0].astype(compute_dtype)
            consts[1] = consts[1].astype(compute_dtype)
            for i in (2, 3, 4):
                consts[i] = consts[i].replace(
                    edge_attr=consts[i].edge_attr.astype(compute_dtype)
                )
        consts = tuple(consts)
        to_nodes, from_nodes = self._to_nodes, self._from_nodes

        def fn(params, prev_state, noise_vector):
            if compute_dtype is not None:
                params = jax.tree_util.tree_map(
                    lambda t: t.astype(compute_dtype)
                    if jnp.issubdtype(t.dtype, jnp.floating)
                    else t,
                    params,
                )
                prev_state = prev_state.astype(compute_dtype)
                noise_vector = noise_vector.astype(compute_dtype)
            out = module.apply(params, to_nodes(prev_state), noise_vector, *consts)
            return from_nodes(out).astype(jnp.float32)

        return fn

    def forward_fn(
        self,
        num_ensemble: int = 2,
        compute_dtype=None,
        member_chunk: int | None = None,
    ):
        """Pure (params, prev_state, key) -> [B, E, lon, lat, F_out].

        member_chunk: members are vmapped in chunks of this size and the
        chunks run sequentially under `lax.map`. The vmap working set is
        O(chunk x per-member peak) — at reference scale (768-d, 24
        blocks, splits 6) a full 8-member vmap's gather workspace alone
        exceeds one v5e's HBM, and member-vmap ANTI-scales in the gather
        memory system even when it fits (measured v5e, scripts/
        probe_fgn_ensemble.py: 452.8 ms/member vmapped-by-2 vs 171.9
        sequential) — use member_chunk=1 at production scale on one
        chip. Default: one chunk (pure vmap, fine at small scale). On a
        multi-chip mesh prefer sharding the member axis
        (parallel/ensemble.py) over chunking."""
        member = self.member_fn(compute_dtype=compute_dtype)
        noise_dim = self.noise_dimension
        if member_chunk is None:
            member_chunk = num_ensemble
        if num_ensemble % member_chunk:
            raise ValueError(
                f"member_chunk={member_chunk} must divide "
                f"num_ensemble={num_ensemble}"
            )
        n_chunks = num_ensemble // member_chunk

        def fn(params, prev_state, key):
            batch = prev_state.shape[0]
            keys = jax.random.split(key, num_ensemble)

            def one(k):
                z = jax.random.normal(k, (batch, noise_dim))
                return member(params, prev_state, z)

            if n_chunks == 1:
                ens = jax.vmap(one)(keys)  # [E, B, lon, lat, F]
            else:
                chunked = jax.lax.map(
                    jax.vmap(one),
                    keys.reshape(n_chunks, member_chunk, *keys.shape[1:]),
                )  # [n_chunks, chunk, B, lon, lat, F]
                ens = chunked.reshape(num_ensemble, *chunked.shape[2:])
            return jnp.swapaxes(ens, 0, 1)

        return fn

    def ensemble_rollout_fn(
        self,
        num_ensemble: int = 2,
        num_steps: int = 1,
        compute_dtype=None,
        member_chunk: int | None = None,
    ):
        """Pure (params, prev_state, key) -> [B, E, T, lon, lat, F_out]
        autoregressive ensemble trajectory, ONE `lax.scan` program.

        FGN semantics (arXiv:2506.10772, reference models/fgn/README.md):
        a member IS one functional perturbation — its noise vector is
        sampled once and held FIXED across every autoregressive step, so
        each member's trajectory is jointly consistent; fresh noise per
        step would sample from the marginals instead. Members advance
        independently (vmap, or `lax.map` chunks via member_chunk — same
        tradeoffs as `forward_fn`).

        Requires output_features_dim == input_features_dim (the output
        must be next step's input)."""
        if self.output_features_dim != self.input_features_dim:
            raise ValueError(
                "autoregressive rollout needs output_features_dim "
                f"({self.output_features_dim}) == input_features_dim "
                f"({self.input_features_dim})"
            )
        member = self.member_fn(compute_dtype=compute_dtype)
        noise_dim = self.noise_dimension
        if member_chunk is None:
            member_chunk = num_ensemble
        if num_ensemble % member_chunk:
            raise ValueError(
                f"member_chunk={member_chunk} must divide "
                f"num_ensemble={num_ensemble}"
            )
        n_chunks = num_ensemble // member_chunk

        def fn(params, prev_state, key):
            batch = prev_state.shape[0]
            keys = jax.random.split(key, num_ensemble)

            def member_traj(k):
                z = jax.random.normal(k, (batch, noise_dim))

                def step(state, _):
                    nxt = member(params, state, z)
                    return nxt, nxt

                _, traj = jax.lax.scan(
                    step, prev_state, None, length=num_steps
                )
                return traj  # [T, B, lon, lat, F_out]

            if n_chunks == 1:
                ens = jax.vmap(member_traj)(keys)  # [E, T, B, ...]
            else:
                chunked = jax.lax.map(
                    jax.vmap(member_traj),
                    keys.reshape(n_chunks, member_chunk, *keys.shape[1:]),
                )
                ens = chunked.reshape(num_ensemble, *chunked.shape[2:])
            # [E, T, B, lon, lat, F] -> [B, E, T, lon, lat, F]
            return jnp.transpose(ens, (2, 0, 1, 3, 4, 5))

        return fn

    def apply(self, params, prev_state, num_ensemble: int = 2, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        if self._jit_apply is None:
            self._jit_apply = {}
        if num_ensemble not in self._jit_apply:
            self._jit_apply[num_ensemble] = jax.jit(self.forward_fn(num_ensemble))
        return self._jit_apply[num_ensemble](params, prev_state, key)

    def __call__(self, params, prev_state, num_ensemble: int = 2, key=None):
        return self.apply(params, prev_state, num_ensemble, key)
