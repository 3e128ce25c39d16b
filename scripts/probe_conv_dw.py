"""Probe: XLA conv filter-grad vs im2col-matmul filter-grad for convs
with few input (or output) channels.

probe_wm_convs.py measured the WeatherMesh first-layer filter grad
(cin=4) at 11.8 ms for 23 GFLOP (~2 TFLOP/s): XLA lowers dW as a conv
whose contraction maps cin onto MXU lanes, wasting 124/128 lanes. The
im2col alternative materializes patches [N_pos, taps*cin] once and
takes dW = patches^T @ dY as one dense matmul.

    python scripts/probe_conv_dw.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench

rng = np.random.default_rng(0)


def conv(x, w, stride):
    ndim = x.ndim - 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding="SAME",
        dimension_numbers=(
            ("NDHWC", "DHWIO", "NDHWC") if ndim == 3 else ("NHWC", "HWIO", "NHWC")
        ),
    )


def im2col_dw(x, dy, k, stride):
    """dW [*k, cin, cout] via patch extraction + one matmul."""
    ndim = x.ndim - 2
    pads = [(kk // 2, kk // 2) for kk in k]
    xp = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
    # patches [B, *out_spatial, *k, cin]
    slices = []
    out_sp = dy.shape[1:-1]
    for offs in np.ndindex(*k):
        sl = xp[(slice(None),) + tuple(
            slice(o, o + s * st, st) for o, s, st in zip(offs, out_sp, stride)
        ) + (slice(None),)]
        slices.append(sl)
    pat = jnp.stack(slices, axis=-2)  # [B, *out, taps, cin]
    taps = int(np.prod(k))
    cin = x.shape[-1]
    cout = dy.shape[-1]
    npos = int(np.prod(dy.shape[:-1]))
    pat = pat.reshape(npos, taps * cin)
    dyf = dy.reshape(npos, cout)
    dw = jnp.einsum(
        "pi,po->io", pat, dyf, preferred_element_type=jnp.float32
    )
    return dw.reshape(*k, cin, cout).astype(x.dtype)


def t(name, fn, *args):
    def body(c, *a):
        first = a[0].at[(0,) * a[0].ndim].set(c.astype(a[0].dtype))
        r = fn(first, *a[1:])
        return sum(jnp.mean(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(r))

    ms = bench._time_ms(body, 8, args=args)
    print(f"  {name}: {ms:.2f} ms", flush=True)


CASES = [
    ("enc p conv1 4->128 3D", (1, 13, 180, 360, 4), (3, 3, 3), 4, 128, (1, 1, 1)),
    ("enc s conv1 8->128 2D", (1, 180, 360, 8), (3, 3), 8, 128, (1, 1)),
    ("dec p last 64->4 3D", (1, 13, 180, 360, 64), (3, 3, 3), 64, 4, (1, 1, 1)),
    ("dec s last 64->8 2D", (1, 180, 360, 64), (3, 3), 64, 8, (1, 1)),
]

for label, shp, k, cin, cout, stride in CASES:
    x = jnp.asarray(rng.standard_normal(shp), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((*k, cin, cout)) * 0.05, jnp.bfloat16)
    out_shape = jax.eval_shape(lambda a, b: conv(a, b, stride), x, w)
    dy = jnp.asarray(rng.standard_normal(out_shape.shape), jnp.bfloat16)
    print(f"-- {label}", flush=True)

    gw = jax.jit(
        jax.grad(
            lambda x, w: jnp.sum(conv(x, w, stride).astype(jnp.float32) * dy.astype(jnp.float32)),
            argnums=1,
        )
    )
    ref = gw(x, w)
    alt = jax.jit(lambda x, dy: im2col_dw(x, dy, k, stride))(x, dy)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - alt.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
    print(f"  max abs diff (rel): {err / scale:.2e}", flush=True)
    t("xla d/filter", gw, x, w)
    t("im2col d/filter", lambda x, dy: im2col_dw(x, dy, k, stride), x, dy)
