"""Shim-fidelity goldens: hand-computed tiny-case vectors for the two
builder-written torch shims the parity goldens depend on.

All torch-reference parity goldens run the reference code with
`parity/ref_shims.py` standing in for PyG `TransformerConv` and natten
`NeighborhoodAttention3D`. If a shim deviated from the real upstream
semantics, the goldens would inherit the deviation and parity would be
vacuous. These tests pin the shims — AND the corresponding JAX layers —
to explicit hand-built vectors transcribed directly from the upstream
definitions, with every intermediate (attention weights, gate values)
spelled out, so a semantic drift in either side fails loudly.

Upstream definitions transcribed here:

- PyG ``TransformerConv`` ("Masked Label Prediction: Unified Message
  Passing Model for Semi-Supervised Classification", Shi et al. 2021,
  arXiv:2009.03509, eqs. 3-5; ``torch_geometric/nn/conv/
  transformer_conv.py`` forward)::

      alpha_ij = softmax_{j in N(i)} ( (W_q x_i) . (W_k x_j) / sqrt(C) )
      m_i      = sum_j alpha_ij (W_v x_j)
      x_r      = W_skip x_i
      b_i      = sigmoid( w_beta . [m_i, x_r, m_i - x_r] )   # THIS order
      out_i    = b_i * x_r + (1 - b_i) * m_i

  The gate-input ORDER ([out, x_r, out - x_r]) is the part a
  re-implementation can silently get wrong: our flax layer feeds
  [x_r, m, x_r - m] instead and `convert._transformer_conv` permutes
  the weight chunks (V = (W2 - W3, W1 + W3, 0)) — both directions are
  pinned against the same hand vectors below.

- natten ``NeighborhoodAttention3D`` (Hassani et al., "Neighborhood
  Attention Transformer", CVPR 2023, arXiv:2204.07143 §3; natten docs
  "every pixel attends to exactly kernel_size^d neighbors"): at the
  volume boundary the window CLAMPS — it slides inward so each query
  still sees exactly `prod(kernel)` keys (no zero padding, no shrinking)
  — and the learnable relative-position bias is indexed per axis by the
  offset (neighbor - query) in [-(k-1), k-1].
"""

import math
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity import ref_shims  # noqa: E402

ref_shims.install()


# ---------------------------------------------------------------------------
# TransformerConv beta gating
# ---------------------------------------------------------------------------

# One head, C = 1, three nodes, destination-sorted edges (src -> dst):
#   2 -> 0, 0 -> 1, 0 -> 2, 1 -> 2
_X = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], np.float32)
_SENDERS = np.array([2, 0, 0, 1], np.int32)
_RECEIVERS = np.array([0, 1, 2, 2], np.int32)
_WQ = np.array([[1.0, 0.0]], np.float32)  # q = [1, 0, 1]
_WK = np.array([[0.0, 1.0]], np.float32)  # k = [0, 1, 1]
_WV = np.array([[1.0, 1.0]], np.float32)  # v = [1, 1, 2]
_WSKIP = np.array([[1.0, -1.0]], np.float32)
_BSKIP = np.array([0.5], np.float32)  # x_r = [1.5, -0.5, 0.5]
# PyG chunk order [W1 (out), W2 (x_r), W3 (out - x_r)]; distinct values so
# any permutation or sign error in the gate input order changes the result.
_WBETA = np.array([[1.0, 2.0, 3.0]], np.float32)


def _hand_transformer_conv():
    """Transcription of Shi et al. 2021 eqs. 3-5 + the PyG gate, scalar by
    scalar (C = 1, scale = 1)."""
    e = math.exp(1.0)
    # logits per edge: q[dst] * k[src]
    #   2->0: q0*k2 = 1      0->1: q1*k0 = 0
    #   0->2: q2*k0 = 0      1->2: q2*k1 = 1
    # per-receiver softmax:
    alpha_20 = 1.0  # single edge into node 0
    alpha_01 = 1.0  # single edge into node 1
    alpha_02 = 1.0 / (1.0 + e)  # node 2: softmax([0, 1])
    alpha_12 = e / (1.0 + e)
    m = np.array(
        [
            alpha_20 * 2.0,  # v[2] = 2
            alpha_01 * 1.0,  # v[0] = 1
            alpha_02 * 1.0 + alpha_12 * 1.0,  # v[0] = v[1] = 1
        ]
    )
    x_r = np.array([1.5, -0.5, 0.5])
    gate = _WBETA[0, 0] * m + _WBETA[0, 1] * x_r + _WBETA[0, 2] * (m - x_r)
    b = 1.0 / (1.0 + np.exp(-gate))
    out = b * x_r + (1.0 - b) * m
    return (
        np.array([alpha_20, alpha_01, alpha_02, alpha_12]),
        out.astype(np.float64),
    )


def _pyg_state_dict():
    sd = {
        "lin_query.weight": _WQ, "lin_query.bias": np.zeros(1, np.float32),
        "lin_key.weight": _WK, "lin_key.bias": np.zeros(1, np.float32),
        "lin_value.weight": _WV, "lin_value.bias": np.zeros(1, np.float32),
        "lin_skip.weight": _WSKIP, "lin_skip.bias": _BSKIP,
        "lin_beta.weight": _WBETA,
    }
    return {k: torch.tensor(v) for k, v in sd.items()}


def test_transformer_conv_shim_matches_hand_vectors():
    """The torch shim reproduces the hand-computed PyG semantics — in
    particular the [out, x_r, out - x_r] gate input order."""
    from torch_geometric.nn import TransformerConv

    conv = TransformerConv(2, 1, heads=1, concat=True, beta=True)
    conv.load_state_dict(_pyg_state_dict())
    edge_index = torch.tensor(np.stack([_SENDERS, _RECEIVERS]).astype(np.int64))
    with torch.no_grad():
        out = conv(torch.tensor(_X), edge_index).numpy()[:, 0]
    alphas, expected = _hand_transformer_conv()
    np.testing.assert_allclose(out, expected, atol=1e-6)
    # node-2 attention split is exactly [1, e] / (1 + e)
    e = math.exp(1.0)
    np.testing.assert_allclose(alphas[2:], [1 / (1 + e), e / (1 + e)])


def test_transformer_conv_jax_matches_hand_vectors():
    """The flax GraphTransformerConv, fed through the SAME converter the
    goldens use (`convert._transformer_conv`, which permutes the beta
    chunks for the different gate-input order), reproduces the hand
    vectors."""
    from graph_weather_tpu.convert import _transformer_conv
    from graph_weather_tpu.models.gencast.modules import GraphTransformerConv
    from graph_weather_tpu.meshes.graphs import GraphBundle
    from graph_weather_tpu.nn.graph_blocks import DeviceGraph

    sd = {f"c.{k}": v.numpy() for k, v in _pyg_state_dict().items()}
    params = {"params": _transformer_conv(sd, "c")}
    bundle = GraphBundle(
        senders=_SENDERS, receivers=_RECEIVERS,
        edge_attr=np.zeros((4, 0), np.float32), n_senders=3, n_receivers=3,
    )
    graph = DeviceGraph.from_bundle(bundle, use_csr=False)
    conv = GraphTransformerConv(
        out_channels=1, num_heads=1, concat=True, beta=True,
        use_edge_features=False,
    )
    out = np.asarray(
        jax.jit(conv.apply)(params, jnp.asarray(_X)[None], graph)
    )[0, :, 0]
    _, expected = _hand_transformer_conv()
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_transformer_conv_shim_vs_jax_with_edges_random():
    """Random cross-check with multi-head + edge features: shim forward ==
    converted flax forward (covers the k/v edge-feature add, eq. 5 of
    Shi et al. 2021, which the hand case omits)."""
    from torch_geometric.nn import TransformerConv

    from graph_weather_tpu.convert import _transformer_conv
    from graph_weather_tpu.models.gencast.modules import GraphTransformerConv
    from graph_weather_tpu.meshes.graphs import GraphBundle
    from graph_weather_tpu.nn.graph_blocks import DeviceGraph

    rng = np.random.default_rng(0)
    n, f, fe, h, c = 7, 5, 3, 2, 4
    senders, receivers = [], []
    for j in range(n):
        for s in rng.choice(n, size=3, replace=False):
            senders.append(int(s))
            receivers.append(j)
    senders = np.asarray(senders, np.int32)
    receivers = np.asarray(receivers, np.int32)
    x = rng.standard_normal((n, f)).astype(np.float32)
    edge_attr = rng.standard_normal((len(senders), fe)).astype(np.float32)

    torch.manual_seed(0)
    tconv = TransformerConv(f, c, heads=h, concat=True, beta=True, edge_dim=fe)
    edge_index = torch.tensor(np.stack([senders, receivers]).astype(np.int64))
    with torch.no_grad():
        ref = tconv(
            torch.tensor(x), edge_index, torch.tensor(edge_attr)
        ).numpy()

    sd = {f"c.{k}": v.detach().numpy() for k, v in tconv.state_dict().items()}
    params = {"params": _transformer_conv(sd, "c")}
    bundle = GraphBundle(
        senders=senders, receivers=receivers,
        edge_attr=edge_attr, n_senders=n, n_receivers=n,
    )
    graph = DeviceGraph.from_bundle(bundle, use_csr=False)
    conv = GraphTransformerConv(
        out_channels=c, num_heads=h, concat=True, beta=True,
        use_edge_features=True,
    )
    out = np.asarray(
        jax.jit(lambda p, x: conv.apply(p, x, graph, jnp.asarray(edge_attr)))(
            params, jnp.asarray(x)[None]
        )
    )[0]
    np.testing.assert_allclose(out, ref, atol=1e-5)


# ---------------------------------------------------------------------------
# NATTEN window clamping
# ---------------------------------------------------------------------------

# Effective 1-axis case: volume [D=1, H=1, W=5], kernel (1, 1, 3), one head,
# head_dim 2. natten window semantics (arXiv:2204.07143 §3): each query sees
# exactly 3 keys; the window CLAMPS at the boundary:
#   i=0 -> {0,1,2}   i=1 -> {0,1,2}   i=2 -> {1,2,3}
#   i=3 -> {2,3,4}   i=4 -> {2,3,4}
# and the bias index per key is (j - i) + k - 1 in [0, 2k-2].
_NAT_X = np.array(
    [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [2.0, 0.0], [0.0, 2.0]], np.float32
)
# rpb over offsets [-2, -1, 0, +1, +2]: big magnitudes so an off-by-one in
# the clamped rel-index mapping shifts the result far beyond tolerance.
_NAT_RPB = np.array([10.0, 0.5, 0.0, -0.5, -10.0], np.float32)
_NAT_WINDOWS = [(0, 1, 2), (0, 1, 2), (1, 2, 3), (2, 3, 4), (2, 3, 4)]


def _hand_natten():
    """softmax_{j in win(i)} ( q_i . k_j / sqrt(ch) + rpb[j - i + k - 1] )
    with q = k = v = x, transcribed key by key."""
    scale = 1.0 / math.sqrt(2.0)
    out = np.zeros((5, 2))
    for i, win in enumerate(_NAT_WINDOWS):
        logits = np.array(
            [
                float(_NAT_X[i] @ _NAT_X[j]) * scale + _NAT_RPB[j - i + 2]
                for j in win
            ]
        )
        a = np.exp(logits - logits.max())
        a /= a.sum()
        out[i] = sum(aj * _NAT_X[j] for aj, j in zip(a, win))
    return out


def test_natten_shim_matches_hand_vectors():
    """The torch natten shim reproduces the hand-built clamped windows and
    bias indexing (qkv and proj pinned to identity so the module IS the
    attention math)."""
    import natten

    mod = natten.NeighborhoodAttention3D(
        embed_dim=2, num_heads=1, kernel_size=(1, 1, 3)
    )
    eye = torch.eye(2)
    with torch.no_grad():
        mod.qkv.weight.copy_(torch.cat([eye, eye, eye], dim=0))
        mod.qkv.bias.zero_()
        mod.proj.weight.copy_(eye)
        mod.proj.bias.zero_()
        mod.rpb.copy_(torch.tensor(_NAT_RPB).reshape(1, 1, 1, 5))
        out = mod(torch.tensor(_NAT_X).reshape(1, 1, 1, 5, 2)).numpy()
    np.testing.assert_allclose(
        out.reshape(5, 2), _hand_natten(), atol=1e-6
    )


def test_natten_xla_matches_hand_vectors():
    """The JAX slot-scan NATTEN reproduces the same hand vectors."""
    from graph_weather_tpu.ops.neighborhood_attention import (
        neighborhood_attention_3d_xla,
    )

    x = jnp.asarray(_NAT_X).reshape(1, 1, 1, 5, 1, 2)
    rpb = jnp.asarray(_NAT_RPB).reshape(1, 1, 1, 5)
    out = np.asarray(
        neighborhood_attention_3d_xla(x, x, x, (1, 1, 3), rpb, False)
    )
    np.testing.assert_allclose(
        out.reshape(5, 2), _hand_natten(), atol=1e-6
    )


def test_natten_clamps_instead_of_padding():
    """Structural clamp check: with kernel 3 on width 5, queries 0 and 1
    share the window {0,1,2} — perturbing position 4's key/value must not
    change their outputs (it would under circular or dilated semantics),
    and every attention row sums to 1 over exactly 3 keys (it would not
    under zero-padding semantics)."""
    import natten

    mod = natten.NeighborhoodAttention3D(
        embed_dim=2, num_heads=1, kernel_size=(1, 1, 3)
    )
    eye = torch.eye(2)
    with torch.no_grad():
        mod.qkv.weight.copy_(torch.cat([eye, eye, eye], dim=0))
        mod.qkv.bias.zero_()
        mod.proj.weight.copy_(eye)
        mod.proj.bias.zero_()
        mod.rpb.zero_()
        base = mod(torch.tensor(_NAT_X).reshape(1, 1, 1, 5, 2)).numpy()
        x2 = _NAT_X.copy()
        x2[4] = [7.0, -7.0]
        pert = mod(torch.tensor(x2).reshape(1, 1, 1, 5, 2)).numpy()
    np.testing.assert_allclose(
        pert.reshape(5, 2)[:2], base.reshape(5, 2)[:2], atol=1e-7
    )
    assert not np.allclose(pert.reshape(5, 2)[2:], base.reshape(5, 2)[2:])


def test_natten_shim_vs_xla_random():
    """Random multi-axis cross-check (kernel (3,3,3), 2 heads): shim ==
    JAX slot-scan on shared q/k/v and bias."""
    import natten

    from graph_weather_tpu.ops.neighborhood_attention import (
        neighborhood_attention_3d_xla,
    )

    rng = np.random.default_rng(1)
    b, d, h, w, heads, ch = 1, 3, 4, 5, 2, 4
    dim = heads * ch
    x = rng.standard_normal((b, d, h, w, dim)).astype(np.float32)
    rpb = rng.standard_normal((heads, 5, 5, 5)).astype(np.float32)

    mod = natten.NeighborhoodAttention3D(
        embed_dim=dim, num_heads=heads, kernel_size=(3, 3, 3)
    )
    eye = torch.eye(dim)
    with torch.no_grad():
        mod.qkv.weight.copy_(torch.cat([eye, eye, eye], dim=0))
        mod.qkv.bias.zero_()
        mod.proj.weight.copy_(eye)
        mod.proj.bias.zero_()
        mod.rpb.copy_(torch.tensor(rpb))
        ref = mod(torch.tensor(x)).numpy()

    xq = jnp.asarray(x.reshape(b, d, h, w, heads, ch))
    out = np.asarray(
        neighborhood_attention_3d_xla(
            xq, xq, xq, (3, 3, 3), jnp.asarray(rpb), False
        )
    ).reshape(b, d, h, w, dim)
    np.testing.assert_allclose(out, ref, atol=1e-5)
