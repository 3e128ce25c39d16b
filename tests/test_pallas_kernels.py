"""Pallas kernel equivalence tests (interpret mode on CPU).

Every Pallas kernel has an XLA reference twin; these tests pin them
together, mirroring the framework's kernel-testing strategy (SURVEY §4
implication: equivalence between Pallas kernels and pure-XLA references).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import graph_weather_tpu.ops.pallas.edge_mlp as edge_mlp_mod


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(edge_mlp_mod.pl, "pallas_call", interp)
    # the inner function is jitted with a cached signature; clear it
    edge_mlp_mod._fused_edge_mlp_padded.clear_cache()
    yield
    edge_mlp_mod._fused_edge_mlp_padded.clear_cache()


def _params(rng, f):
    return {
        "TorchLinear_0": {
            "kernel": jnp.asarray(rng.normal(size=(3 * f, f)) * 0.05, jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32),
        },
        "TorchLinear_1": {
            "kernel": jnp.asarray(rng.normal(size=(f, f)) * 0.05, jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32),
        },
        "TorchLinear_2": {
            "kernel": jnp.asarray(rng.normal(size=(f, f)) * 0.05, jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32),
        },
        "LayerNorm_0": {"scale": jnp.ones(f), "bias": jnp.zeros(f)},
    }


def _xla_ref(senders, receivers, x_src, x_dst, e, p):
    inp = jnp.concatenate(
        [jnp.take(x_src, senders, 0), jnp.take(x_dst, receivers, 0), e], -1
    )
    h = jax.nn.relu(inp @ p["TorchLinear_0"]["kernel"] + p["TorchLinear_0"]["bias"])
    h = jax.nn.relu(h @ p["TorchLinear_1"]["kernel"] + p["TorchLinear_1"]["bias"])
    h = h @ p["TorchLinear_2"]["kernel"] + p["TorchLinear_2"]["bias"]
    mu = h.mean(-1, keepdims=True)
    v = ((h - mu) ** 2).mean(-1, keepdims=True)
    return (h - mu) / jnp.sqrt(v + 1e-5) * p["LayerNorm_0"]["scale"] + p[
        "LayerNorm_0"
    ]["bias"] + e


def test_fused_edge_mlp_matches_xla():
    rng = np.random.default_rng(0)
    n, e_cnt, f = 64, 500, 32
    x = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(e_cnt, f)), jnp.float32)
    senders = jnp.asarray(rng.integers(0, n, e_cnt), jnp.int32)
    receivers = jnp.asarray(rng.integers(0, n, e_cnt), jnp.int32)
    p = _params(rng, f)
    out = edge_mlp_mod.fused_edge_mlp(senders, receivers, x, x, e, p, tile=128)
    ref = _xla_ref(senders, receivers, x, x, e, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_edge_mlp_bipartite_and_unpadded_tail():
    """Bipartite node sets + an edge count that is not a tile multiple."""
    rng = np.random.default_rng(1)
    n_src, n_dst, e_cnt, f = 40, 70, 333, 32
    xs = jnp.asarray(rng.normal(size=(n_src, f)), jnp.float32)
    xd = jnp.asarray(rng.normal(size=(n_dst, f)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(e_cnt, f)), jnp.float32)
    senders = jnp.asarray(rng.integers(0, n_src, e_cnt), jnp.int32)
    receivers = jnp.asarray(rng.integers(0, n_dst, e_cnt), jnp.int32)
    p = _params(rng, f)
    out = edge_mlp_mod.fused_edge_mlp(senders, receivers, xs, xd, e, p, tile=128)
    assert out.shape == (e_cnt, f)
    ref = _xla_ref(senders, receivers, xs, xd, e, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestBandedFlash:
    """Flash-style banded attention kernel (interpret mode) vs the XLA
    banded path (itself equivalence-tested against segment softmax)."""

    def _graph(self, rng, n, w, deg=5):
        senders, receivers = [], []
        for r in range(n):
            s = np.unique(rng.integers(max(0, r - w), min(n, r + w + 1), size=deg))
            senders.extend(s.tolist())
            receivers.extend([r] * len(s))
        pairs = np.unique(np.stack([receivers, senders], 1), axis=0)
        return pairs[:, 1].astype(np.int32), pairs[:, 0].astype(np.int32)

    def test_matches_xla_banded(self):
        from graph_weather_tpu.ops.banded_attention import (
            banded_graph_attention,
            build_band_masks,
        )
        from graph_weather_tpu.ops.pallas.banded_flash import (
            banded_flash_attention,
        )

        rng = np.random.default_rng(0)
        n, h, c, block, w = 1100, 2, 128, 512, 256
        s_ids, r_ids = self._graph(rng, n, w)
        keep = ~np.isin(r_ids, [3, 700, 1099])  # empty receiver rows
        s_ids, r_ids = s_ids[keep], r_ids[keep]
        masks = jnp.asarray(build_band_masks(s_ids, r_ids, n, block, w))
        q, k, v = (
            jnp.asarray(rng.standard_normal((n, h, c)), jnp.float32)
            for _ in range(3)
        )
        ref = banded_graph_attention(q, k, v, masks, block, w)
        out = banded_flash_attention(q, k, v, masks, block, w, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        assert np.all(np.asarray(out)[3] == 0.0)  # empty rows exact zeros

    def test_tile_divisibility_guard(self):
        from graph_weather_tpu.ops.pallas.banded_flash import (
            banded_flash_attention,
        )

        q = jnp.zeros((600, 1, 128))
        masks = jnp.zeros((2, 512, 512 + 2 * 100), bool)
        with pytest.raises(ValueError, match="multiples"):
            banded_flash_attention(q, q, q, masks, 512, 100, interpret=True)

    def test_gradients_match_xla_banded(self):
        from graph_weather_tpu.ops.banded_attention import (
            banded_graph_attention,
            build_band_masks,
        )
        from graph_weather_tpu.ops.pallas.banded_flash import (
            banded_flash_attention,
        )

        rng = np.random.default_rng(1)
        n, h, c, block, w = 700, 1, 128, 512, 256
        s_ids, r_ids = self._graph(rng, n, w, deg=4)
        masks = jnp.asarray(build_band_masks(s_ids, r_ids, n, block, w))
        q, k, v = (
            jnp.asarray(rng.standard_normal((n, h, c)), jnp.float32)
            for _ in range(3)
        )

        def loss_flash(q, k, v):
            return jnp.sum(
                banded_flash_attention(q, k, v, masks, block, w, interpret=True)
                ** 2
            )

        def loss_ref(q, k, v):
            return jnp.sum(banded_graph_attention(q, k, v, masks, block, w) ** 2)

        g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_rf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_fl, g_rf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    @pytest.mark.parametrize("c", [128, 16])
    def test_flash_backward_kernels_match_xla(self, c):
        """w % 512 == 0 routes to the HAND-WRITTEN flash backward kernels
        (dq + dk/dv Pallas, delta/lse recompute) — not the XLA-recompute
        fallback. Checked against the XLA banded VJP, incl. empty rows and
        lane-padded small head dims."""
        from graph_weather_tpu.ops.banded_attention import (
            banded_graph_attention,
            build_band_masks,
        )
        from graph_weather_tpu.ops.pallas.banded_flash import (
            banded_flash_attention,
        )

        rng = np.random.default_rng(2)
        n, h, block, w = 1300, 2, 512, 512
        s_ids, r_ids = self._graph(rng, n, w, deg=6)
        keep = ~np.isin(r_ids, [0, 511, 512, 1299])  # empty rows at edges
        s_ids, r_ids = s_ids[keep], r_ids[keep]
        masks = jnp.asarray(build_band_masks(s_ids, r_ids, n, block, w))
        q, k, v = (
            jnp.asarray(rng.standard_normal((n, h, c)), jnp.float32)
            for _ in range(3)
        )
        cot = jnp.asarray(rng.standard_normal((n, h, c)), jnp.float32)

        def loss_flash(q, k, v):
            out = banded_flash_attention(q, k, v, masks, block, w, interpret=True)
            return jnp.sum(out * cot)

        def loss_ref(q, k, v):
            return jnp.sum(banded_graph_attention(q, k, v, masks, block, w) * cot)

        out = banded_flash_attention(q, k, v, masks, block, w, interpret=True)
        ref = banded_graph_attention(q, k, v, masks, block, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_rf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("q k v".split(), g_fl, g_rf):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, err_msg=f"d{name}"
            )
        # Empty receiver rows: zero output AND zero dq.
        assert np.all(np.asarray(out)[0] == 0.0)
        assert np.all(np.asarray(g_fl[0])[0] == 0.0)


class TestClusteredFlash:
    """Clustered (gathered-neighbor) flash attention vs the XLA banded
    path / plain segment softmax — works for arbitrary static graphs."""

    def _random_graph(self, rng, n, deg):
        senders, receivers = [], []
        for r in range(n):
            s = np.unique(rng.integers(0, n, size=deg))
            senders.extend(s.tolist())
            receivers.extend([r] * len(s))
        pairs = np.unique(np.stack([receivers, senders], 1), axis=0)
        return pairs[:, 1].astype(np.int32), pairs[:, 0].astype(np.int32)

    def _dense_ref(self, q, k, v, s_ids, r_ids, n):
        mask = np.zeros((n, n), bool)
        mask[r_ids, s_ids] = True
        mask = jnp.asarray(mask)
        logits = jnp.einsum("nhc,mhc->hnm", q, k) / np.sqrt(q.shape[-1])
        logits = jnp.where(mask[None], logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1)
        p = jnp.where(mask[None], p, 0.0)
        return jnp.einsum("hnm,mhc->nhc", p, v)

    @pytest.mark.parametrize("c", [128, 16])
    @pytest.mark.parametrize("kernel", ["onepass", "online_fallback"])
    def test_matches_dense_and_grads(self, c, kernel, monkeypatch):
        import graph_weather_tpu.ops.pallas.clustered_flash as cfmod

        if kernel == "online_fallback":
            # Force the multi-tile online fwd/bwd kernels (the large-config
            # fallback) by shrinking the VMEM budget the selector uses.
            monkeypatch.setattr(cfmod, "_VMEM_BUDGET", 0)
        # The branch choice is baked in at trace time; drop cached traces
        # so each parametrization really exercises its kernel.
        cfmod.clustered_flash_attention.clear_cache()
        from graph_weather_tpu.meshes.clustering import build_cluster_layout
        from graph_weather_tpu.ops.pallas.clustered_flash import (
            clustered_flash_attention,
        )

        rng = np.random.default_rng(3)
        n, h, block = 1200, 2, 512
        s_ids, r_ids = self._random_graph(rng, n, deg=7)
        keep = ~np.isin(r_ids, [0, 513, 1199])  # empty receiver rows
        s_ids, r_ids = s_ids[keep], r_ids[keep]
        layout = build_cluster_layout(s_ids, r_ids, n, n, block=block)
        ids = jnp.asarray(layout.gather_ids)
        masks = jnp.asarray(layout.masks)
        q, k, v = (
            jnp.asarray(rng.standard_normal((n, h, c)), jnp.float32)
            for _ in range(3)
        )
        cot = jnp.asarray(rng.standard_normal((n, h, c)), jnp.float32)

        out = clustered_flash_attention(q, k, v, ids, masks, block, interpret=True)
        ref = self._dense_ref(q, k, v, s_ids, r_ids, n)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        assert np.all(np.asarray(out)[0] == 0.0)  # empty rows exact zeros

        def loss_fl(q, k, v):
            return jnp.sum(
                clustered_flash_attention(q, k, v, ids, masks, block, interpret=True)
                * cot
            )

        def loss_ref(q, k, v):
            return jnp.sum(self._dense_ref(q, k, v, s_ids, r_ids, n) * cot)

        g_fl = jax.grad(loss_fl, argnums=(0, 1, 2))(q, k, v)
        g_rf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("q k v".split(), g_fl, g_rf):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4, err_msg=f"d{name}"
            )

    def test_symmetric_backward_matches_scatter_path(self):
        """symmetric=True (scatter-free transpose dk/dv kernel) must match
        the general scatter backward and the dense reference, batched and
        unbatched, including empty receiver rows."""
        from graph_weather_tpu.meshes.clustering import (
            build_cluster_layout,
            is_symmetric_edges,
        )
        from graph_weather_tpu.ops.pallas.clustered_flash import (
            clustered_flash_attention,
        )

        rng = np.random.default_rng(11)
        n, h, c, block, B = 1200, 2, 32, 512, 2
        s_ids, r_ids = self._random_graph(rng, n, deg=6)
        # Symmetrize (the k-hop mesh graph case) and knock out some rows
        # entirely (node 7 keeps no edges in either direction).
        keep = (s_ids != 7) & (r_ids != 7)
        s_sym = np.concatenate([s_ids[keep], r_ids[keep]])
        r_sym = np.concatenate([r_ids[keep], s_ids[keep]])
        pairs = np.unique(np.stack([s_sym, r_sym], 1), axis=0)
        s_sym, r_sym = pairs[:, 0], pairs[:, 1]
        assert is_symmetric_edges(s_sym, r_sym)
        assert not is_symmetric_edges(
            np.array([0, 1]), np.array([1, 2])
        )
        layout = build_cluster_layout(s_sym, r_sym, n, n, block=block)
        ids = jnp.asarray(layout.gather_ids)
        masks = jnp.asarray(layout.masks)
        q, k, v = (
            jnp.asarray(rng.standard_normal((B, n, h, c)), jnp.float32)
            for _ in range(3)
        )
        cot = jnp.asarray(rng.standard_normal((B, n, h, c)), jnp.float32)

        def loss(q, k, v, symmetric, batched=True):
            args = (q, k, v) if batched else (q[0], k[0], v[0])
            out = clustered_flash_attention(
                *args, ids, masks, block, interpret=True, symmetric=symmetric
            )
            return jnp.sum(out * (cot if batched else cot[0]))

        g_sym = jax.grad(functools.partial(loss, symmetric=True), (0, 1, 2))(
            q, k, v
        )
        g_gen = jax.grad(functools.partial(loss, symmetric=False), (0, 1, 2))(
            q, k, v
        )
        for name, a, b in zip("q k v".split(), g_sym, g_gen):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5, err_msg=f"d{name}"
            )
        # Dense reference on sample 0 via the unbatched path.
        def loss_ref(q0, k0, v0):
            return jnp.sum(self._dense_ref(q0, k0, v0, s_sym, r_sym, n) * cot[0])

        g_s0 = jax.grad(
            functools.partial(loss, symmetric=True, batched=False), (0, 1, 2)
        )(q, k, v)
        g_rf = jax.grad(loss_ref, (0, 1, 2))(q[0], k[0], v[0])
        for name, a, b in zip("q k v".split(), g_s0, g_rf):
            np.testing.assert_allclose(
                np.asarray(a[0]), np.asarray(b), atol=3e-4, err_msg=f"d{name}"
            )
            # edgeless node 7: exact-zero gradients everywhere
            assert np.all(np.asarray(a[0])[7] == 0.0)

    def test_symmetric_rejects_mismatched_node_sets(self):
        """symmetric=True with different q vs k/v node counts must raise
        (the transpose identity needs one shared node set)."""
        from graph_weather_tpu.meshes.clustering import build_cluster_layout
        from graph_weather_tpu.ops.pallas.clustered_flash import (
            clustered_flash_attention,
        )

        rng = np.random.default_rng(1)
        s_ids = np.array([0, 1, 2, 3], np.int32)
        r_ids = np.array([0, 1, 2, 3], np.int32)
        layout = build_cluster_layout(s_ids, r_ids, 8, 16, block=8)
        q = jnp.asarray(rng.standard_normal((8, 1, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((16, 1, 16)), jnp.float32)

        def loss(q, k, v):
            return jnp.sum(
                clustered_flash_attention(
                    q, k, v,
                    jnp.asarray(layout.gather_ids),
                    jnp.asarray(layout.masks),
                    8, interpret=True, symmetric=True,
                )
            )

        with pytest.raises(ValueError, match="same node set"):
            jax.grad(loss)(q, k, k)

    def test_batched_matches_per_sample(self):
        """[B, N, h, c] inputs (B folded into the kernel grid) must equal
        per-sample calls, in forward and in gradients."""
        from graph_weather_tpu.meshes.clustering import build_cluster_layout
        from graph_weather_tpu.ops.pallas.clustered_flash import (
            clustered_flash_attention,
        )

        rng = np.random.default_rng(5)
        n, h, c, block, B = 1200, 2, 32, 512, 3
        s_ids, r_ids = self._random_graph(rng, n, deg=6)
        layout = build_cluster_layout(s_ids, r_ids, n, n, block=block)
        ids = jnp.asarray(layout.gather_ids)
        masks = jnp.asarray(layout.masks)
        q, k, v = (
            jnp.asarray(rng.standard_normal((B, n, h, c)), jnp.float32)
            for _ in range(3)
        )
        cot = jnp.asarray(rng.standard_normal((B, n, h, c)), jnp.float32)

        out_b = clustered_flash_attention(q, k, v, ids, masks, block, interpret=True)
        for i in range(B):
            out_i = clustered_flash_attention(
                q[i], k[i], v[i], ids, masks, block, interpret=True
            )
            np.testing.assert_allclose(
                np.asarray(out_b[i]), np.asarray(out_i), atol=2e-5
            )

        def loss_b(q, k, v):
            return jnp.sum(
                clustered_flash_attention(q, k, v, ids, masks, block, interpret=True)
                * cot
            )

        def loss_i(q, k, v, i):
            return jnp.sum(
                clustered_flash_attention(q, k, v, ids, masks, block, interpret=True)
                * cot[i]
            )

        g_b = jax.grad(loss_b, argnums=(0, 1, 2))(q, k, v)
        for i in range(B):
            g_i = jax.grad(
                lambda q_, k_, v_: loss_i(q_, k_, v_, i), argnums=(0, 1, 2)
            )(q[i], k[i], v[i])
            for name, a, b in zip("q k v".split(), g_b, g_i):
                np.testing.assert_allclose(
                    np.asarray(a[i]), np.asarray(b), atol=3e-4,
                    err_msg=f"d{name}[{i}]",
                )

    def test_denoiser_clustered_matches_segment(self, monkeypatch):
        """End-to-end: Denoiser(attention_impl='clustered_flash') output
        equals the segment-softmax path (same weights, no edge feats).

        The segment denoiser is forced onto the same RCB mesh ordering —
        orderings are mathematically equivalent but reorder f32 summations
        (measured: up to ~4e-4 output drift through 2 blocks), which would
        mask a genuine kernel discrepancy at this tolerance."""
        import graph_weather_tpu.models.gencast.denoiser as dmod
        from graph_weather_tpu.models.gencast import Denoiser

        grid_lon = np.arange(0, 360, 360 / 32)
        grid_lat = np.linspace(-90, 90, 16)
        kw = dict(
            grid_lon=grid_lon, grid_lat=grid_lat, input_features_dim=3,
            output_features_dim=2, hidden_dims=(16, 16), num_blocks=2,
            num_heads=2, splits=2, num_hops=2, use_edges_features=False,
        )
        den_c = Denoiser(attention_impl="clustered_flash", **kw)
        orig = dmod.build_graphcast_graphs

        def forced_rcb(*a, **k):
            k["spatial_sort"] = "rcb"
            return orig(*a, **k)

        monkeypatch.setattr(dmod, "build_graphcast_graphs", forced_rcb)
        den_s = Denoiser(attention_impl="segment", **kw)
        monkeypatch.undo()
        params = den_c.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(7)
        tgt = jnp.asarray(rng.normal(size=(1, 32, 16, 2)), jnp.float32)
        prev = jnp.asarray(rng.normal(size=(1, 32, 16, 6)), jnp.float32)
        noise = jnp.full((1, 1), 0.5)
        out_c = den_c.forward_fn()(params, tgt, prev, noise)
        out_s = den_s.forward_fn()(params, tgt, prev, noise)
        # Wiring check: kernel numerics are pinned at 2e-5 by
        # test_matches_dense_and_grads; through 2 conditioned-norm blocks
        # the flash-vs-segment softmax accumulation-order drift reaches
        # ~4e-4 (same magnitude round 1 measured for banded-vs-segment).
        np.testing.assert_allclose(
            np.asarray(out_c), np.asarray(out_s), atol=1e-3
        )


class TestNatten3DPallas:
    """Pallas NATTEN vs the XLA slot-scan reference (which is itself
    brute-force-verified in tests/test_attention_models.py)."""

    def _inputs(self, B=2, D=4, H=6, W=10, heads=4, ch=32, seed=0):
        rng = np.random.default_rng(seed)
        q, k, v = (
            jnp.asarray(
                rng.standard_normal((B, D, H, W, heads, ch)), jnp.float32
            )
            for _ in range(3)
        )
        return q, k, v, rng

    @pytest.mark.parametrize("circular_w", [False, True])
    @pytest.mark.parametrize("with_rpb", [True, False])
    def test_matches_xla(self, circular_w, with_rpb):
        from graph_weather_tpu.ops.neighborhood_attention import (
            neighborhood_attention_3d_xla,
        )
        from graph_weather_tpu.ops.pallas.natten3d import (
            neighborhood_attention_3d_pallas,
        )

        kd, kh, kw = 3, 3, 5
        q, k, v, rng = self._inputs()
        rpb = (
            jnp.asarray(
                rng.standard_normal((4, 2 * kd - 1, 2 * kh - 1, 2 * kw - 1)),
                jnp.float32,
            )
            * 0.5
            if with_rpb
            else None
        )
        ref = neighborhood_attention_3d_xla(q, k, v, (kd, kh, kw), rpb, circular_w)
        out = neighborhood_attention_3d_pallas(
            q, k, v, (kd, kh, kw), rpb, circular_w, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_gradients_match_xla(self):
        """The custom_vjp backward differentiates the XLA implementation;
        end-to-end grads must match the pure-XLA grads."""
        from graph_weather_tpu.ops.neighborhood_attention import (
            neighborhood_attention_3d_xla,
        )
        from graph_weather_tpu.ops.pallas.natten3d import (
            neighborhood_attention_3d_pallas,
        )

        q, k, v, rng = self._inputs(B=1, D=3, H=5, W=8)
        rpb = jnp.asarray(
            rng.standard_normal((4, 5, 5, 9)), jnp.float32
        )

        def loss(fn):
            return lambda q, k, v, r: jnp.sum(
                fn(q, k, v, (3, 3, 5), r, False) ** 2
            )

        g_p = jax.grad(
            loss(
                lambda *a, **kw: neighborhood_attention_3d_pallas(
                    *a, interpret=True, **kw
                )
            ),
            (0, 1, 2, 3),
        )(q, k, v, rpb)
        g_x = jax.grad(loss(neighborhood_attention_3d_xla), (0, 1, 2, 3))(
            q, k, v, rpb
        )
        for name, a, b in zip("q k v rpb".split(), g_p, g_x):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
            )

    def test_dispatcher_fallback(self):
        """impl='auto' on CPU uses XLA; unqualified shapes raise only
        when forced."""
        from graph_weather_tpu.ops.neighborhood_attention import (
            neighborhood_attention_3d,
        )
        from graph_weather_tpu.ops.pallas.natten3d import (
            neighborhood_attention_3d_pallas,
        )

        rng = np.random.default_rng(0)
        # heads*ch = 24: not a lane multiple -> pallas path must raise...
        q = jnp.asarray(rng.standard_normal((1, 3, 4, 6, 3, 8)), jnp.float32)
        with pytest.raises(ValueError, match="multiple of 128"):
            neighborhood_attention_3d_pallas(
                q, q, q, (3, 3, 3), None, False, interpret=True
            )
        # ...but the dispatcher falls back and still computes.
        out = neighborhood_attention_3d(q, q, q, (3, 3, 3))
        assert out.shape == q.shape


class TestNattenFlashPallas:
    """Block-dense halo NATTEN flash vs the XLA slot-scan reference."""

    def _inputs(self, B=2, D=4, H=11, W=14, heads=4, ch=32, seed=0):
        rng = np.random.default_rng(seed)
        q, k, v = (
            jnp.asarray(
                rng.standard_normal((B, D, H, W, heads, ch)), jnp.float32
            )
            for _ in range(3)
        )
        return q, k, v, rng

    @pytest.mark.parametrize("circular_w", [False, True])
    @pytest.mark.parametrize("with_rpb", [True, False])
    def test_matches_xla(self, circular_w, with_rpb):
        from graph_weather_tpu.ops.neighborhood_attention import (
            neighborhood_attention_3d_xla,
        )
        from graph_weather_tpu.ops.pallas.natten_flash import (
            neighborhood_attention_3d_flash,
        )

        kd, kh, kw = 3, 5, 5
        q, k, v, rng = self._inputs()
        rpb = (
            jnp.asarray(
                rng.standard_normal((4, 2 * kd - 1, 2 * kh - 1, 2 * kw - 1)),
                jnp.float32,
            )
            * 0.5
            if with_rpb
            else None
        )
        ref = neighborhood_attention_3d_xla(
            q, k, v, (kd, kh, kw), rpb, circular_w
        )
        out = neighborhood_attention_3d_flash(
            q, k, v, (kd, kh, kw), rpb, circular_w, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_multi_lane_group(self):
        """hc = 256 (two 128-lane groups, ch=64) exercises the group grid
        axis and per-group bias layout."""
        from graph_weather_tpu.ops.neighborhood_attention import (
            neighborhood_attention_3d_xla,
        )
        from graph_weather_tpu.ops.pallas.natten_flash import (
            neighborhood_attention_3d_flash,
        )

        q, k, v, rng = self._inputs(B=1, D=3, H=7, W=10, heads=4, ch=64)
        rpb = jnp.asarray(
            rng.standard_normal((4, 5, 5, 5)), jnp.float32
        )
        ref = neighborhood_attention_3d_xla(q, k, v, (3, 3, 3), rpb, True)
        out = neighborhood_attention_3d_flash(
            q, k, v, (3, 3, 3), rpb, True, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_gradients_match_xla(self):
        from graph_weather_tpu.ops.neighborhood_attention import (
            neighborhood_attention_3d_xla,
        )
        from graph_weather_tpu.ops.pallas.natten_flash import (
            neighborhood_attention_3d_flash,
        )

        q, k, v, rng = self._inputs(B=1, D=3, H=6, W=8)
        rpb = jnp.asarray(rng.standard_normal((4, 5, 5, 9)), jnp.float32)

        def loss(fn):
            return lambda q, k, v, r: jnp.sum(
                fn(q, k, v, (3, 3, 5), r, False) ** 2
            )

        g_f = jax.grad(
            loss(
                lambda *a, **kw: neighborhood_attention_3d_flash(
                    *a, interpret=True, **kw
                )
            ),
            (0, 1, 2, 3),
        )(q, k, v, rpb)
        g_x = jax.grad(loss(neighborhood_attention_3d_xla), (0, 1, 2, 3))(
            q, k, v, rpb
        )
        for name, a, b in zip("q k v rpb".split(), g_f, g_x):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
            )

    @pytest.mark.parametrize(
        "circular_w,with_rpb,B,heads,ch",
        [
            (True, True, 2, 4, 32),  # circular wrap + batch
            (False, False, 1, 4, 32),  # no learned bias
            (True, True, 1, 2, 64),  # multi-lane-group (hc=128? no: 2*64)
            (False, True, 2, 8, 32),  # hc=256: two lane groups
        ],
    )
    def test_hand_backward_kernel(
        self, circular_w, with_rpb, B, heads, ch, monkeypatch
    ):
        """The hand-written backward kernel (not the XLA-VJP fallback)
        matches the XLA slot-scan gradients for every input, including
        drpb via the translation-invariant dbias accumulator."""
        import graph_weather_tpu.ops.pallas.natten_flash as nfmod
        from graph_weather_tpu.ops.neighborhood_attention import (
            neighborhood_attention_3d_xla,
        )

        q, k, v, rng = self._inputs(B=B, D=3, H=7, W=10, heads=heads, ch=ch)
        kernel = (3, 3, 5)
        rpb = (
            jnp.asarray(
                rng.standard_normal((heads, 5, 5, 9)), jnp.float32
            )
            if with_rpb
            else None
        )

        # Any fall-through to the XLA VJP is a test failure.
        calls = {"bwd": 0}
        real_bwd = nfmod._flash_bwd_impl

        def counting_bwd(*a, **kw):
            res = real_bwd(*a, **kw)
            assert res is not None, "hand backward rejected the tile"
            calls["bwd"] += 1
            return res

        monkeypatch.setattr(nfmod, "_flash_bwd_impl", counting_bwd)

        def loss_flash(q, k, v, r):
            return jnp.sum(
                nfmod.neighborhood_attention_3d_flash(
                    q, k, v, kernel, r, circular_w, interpret=True
                )
                ** 2
            )

        def loss_xla(q, k, v, r):
            return jnp.sum(
                neighborhood_attention_3d_xla(
                    q, k, v, kernel, r, circular_w
                )
                ** 2
            )

        if with_rpb:
            g_f = jax.grad(loss_flash, (0, 1, 2, 3))(q, k, v, rpb)
            g_x = jax.grad(loss_xla, (0, 1, 2, 3))(q, k, v, rpb)
        else:
            g_f = jax.grad(
                lambda q, k, v: loss_flash(q, k, v, None), (0, 1, 2)
            )(q, k, v)
            g_x = jax.grad(
                lambda q, k, v: loss_xla(q, k, v, None), (0, 1, 2)
            )(q, k, v)
        assert calls["bwd"] == 1
        names = "q k v rpb".split()
        for name, a, b in zip(names, g_f, g_x):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-5,
                err_msg=f"d{name}",
            )

    def test_unqualified_raises(self):
        from graph_weather_tpu.ops.pallas.natten_flash import (
            neighborhood_attention_3d_flash,
        )

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((1, 3, 4, 6, 3, 8)), jnp.float32)
        with pytest.raises(ValueError, match="multiple of 128"):
            neighborhood_attention_3d_flash(
                q, q, q, (3, 3, 3), None, False, interpret=True
            )
