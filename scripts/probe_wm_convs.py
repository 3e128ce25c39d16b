"""Per-conv fwd/bwd timing for the WeatherMesh encoder/decoder stacks.

probe_wm_train.py found enc bwd 7.5x fwd and dec bwd 2.9x fwd at 1 deg;
this times each conv shape in isolation, splitting d/input from
d/filter, to localize the slow backward.

    python scripts/probe_wm_convs.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench

rng = np.random.default_rng(0)


def t(name, fn, *args):
    def body(c, *a):
        first = a[0].at[(0,) * a[0].ndim].set(c.astype(a[0].dtype))
        return fn(first, *a[1:])

    ms = bench._time_ms(body, 6, args=args)
    print(f"{name}: {ms:.2f} ms", flush=True)
    return ms


def conv(x, w, stride):
    ndim = x.ndim - 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding="SAME",
        dimension_numbers=(
            ("NDHWC", "DHWIO", "NDHWC") if ndim == 3 else ("NHWC", "HWIO", "NHWC")
        ),
    )


# (label, in-shape, kernel, cin, cout, stride)
CASES = [
    # encoder pressure path, hidden 64, blocks 2 (bench 1-deg config)
    ("enc p b1 conv1 s1", (1, 13, 180, 360, 4), (3, 3, 3), 4, 128, (1, 1, 1)),
    ("enc p b1 conv2 s122", (1, 13, 180, 360, 128), (3, 3, 3), 128, 128, (1, 2, 2)),
    ("enc p b2 conv1 s1", (1, 13, 90, 180, 128), (3, 3, 3), 128, 256, (1, 1, 1)),
    ("enc p b2 conv2 s122", (1, 13, 90, 180, 256), (3, 3, 3), 256, 256, (1, 2, 2)),
    ("enc s b1 conv2 s2", (1, 180, 360, 128), (3, 3), 128, 128, (2, 2)),
    # decoder upsample path works at the same resolutions in reverse
    ("dec p up1 conv", (1, 13, 90, 180, 256), (3, 3, 3), 256, 256, (1, 1, 1)),
    ("dec p up2 conv", (1, 13, 180, 360, 128), (3, 3, 3), 128, 128, (1, 1, 1)),
]

for label, shp, k, cin, cout, stride in CASES:
    x = jnp.asarray(rng.standard_normal(shp), jnp.bfloat16)
    w = jnp.asarray(
        rng.standard_normal((*k, cin, cout)) * 0.05, jnp.bfloat16
    )
    pos_out = np.prod(
        [s // st for s, st in zip(shp[1:-1], stride)]
    )
    gflop = 2 * pos_out * np.prod(k) * cin * cout / 1e9
    print(f"-- {label}: {gflop:.1f} GFLOP", flush=True)
    f = jax.jit(lambda x, w, s=stride: jnp.mean(conv(x, w, s).astype(jnp.float32)))
    t("  fwd", f, x, w)
    gx = jax.jit(jax.grad(lambda x, w, s=stride: jnp.mean(conv(x, w, s).astype(jnp.float32)), argnums=0))
    t("  d/input", gx, x, w)
    gw = jax.jit(jax.grad(lambda x, w, s=stride: jnp.mean(conv(x, w, s).astype(jnp.float32)), argnums=1))
    t("  d/filter", gw, x, w)
