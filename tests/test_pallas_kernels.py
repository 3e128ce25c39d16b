"""Pallas kernel equivalence tests (interpret mode on CPU).

Every Pallas kernel has an XLA reference twin; these tests pin them
together, mirroring the framework's kernel-testing strategy (SURVEY §4
implication: equivalence between Pallas kernels and pure-XLA references).
"""

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
