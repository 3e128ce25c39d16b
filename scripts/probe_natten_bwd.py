"""Probe: NATTEN flash backward vs XLA slot-scan VJP at WeatherMesh scale.

Measures per-layer fwd and fwd+bwd cost of the 3D neighborhood attention
at the 1-degree/13-level latent shape ([1, 14, 45, 90, 4 heads, 32 ch],
kernel (3,5,5)) for: flash fwd + hand backward, and the pure XLA slot
scan. CIRC=1 uses circular longitude wrap (default: clamped, the
WeatherMesh model default). Honest-harness timing via bench._time_ms.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from graph_weather_tpu.ops.pallas import natten_flash as nf
from graph_weather_tpu.ops.neighborhood_attention import (
    neighborhood_attention_3d_xla,
)

CIRC = os.environ.get("CIRC", "0") == "1"
B, D, H, W, heads, ch = 1, 14, 45, 90, 4, 32
kernel = (3, 5, 5)
dt = jnp.bfloat16

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, D, H, W, heads, ch)), dt)
k = jnp.asarray(rng.standard_normal((B, D, H, W, heads, ch)), dt)
v = jnp.asarray(rng.standard_normal((B, D, H, W, heads, ch)), dt)
rpb = jnp.asarray(rng.standard_normal((heads, 5, 9, 9)), jnp.float32)

for kind, budget, est_fn in (
    ("bwd", nf._VMEM_BWD_BUDGET,
     lambda th, tw: nf._est_bytes_bwd(D, th, tw, kernel, heads * ch, ch, 2, CIRC, True)),
    ("fwd", nf._VMEM_MODEL_BUDGET,
     lambda th, tw: nf._est_bytes(D, th, tw, kernel, heads * ch, ch, 2, CIRC)),
):
    for th, tw in nf._candidate_tiles(D, H, W, kernel, CIRC):
        if th > H or tw > W:
            continue
        est = est_fn(th, tw)
        if est <= budget:
            print(f"{kind} tile: ({th}, {tw}) est {est/2**20:.1f} MB")
            break
    else:
        print(f"{kind} tile: NONE")


def flash(q, k, v):
    return nf.neighborhood_attention_3d_flash(
        q, k, v, kernel, rpb, circular_w=CIRC
    )


def xla(q, k, v):
    return neighborhood_attention_3d_xla(q, k, v, kernel, rpb, CIRC)


out_f = jax.jit(flash)(q, k, v)
out_x = jax.jit(xla)(q, k, v)
print(
    "fwd max abs diff flash vs xla:",
    float(jnp.max(jnp.abs(out_f.astype(jnp.float32) - out_x.astype(jnp.float32)))),
)

g_flash = lambda q, k, v: jax.grad(
    lambda a, b, c: jnp.sum(flash(a, b, c).astype(jnp.float32) ** 2), (0, 1, 2)
)(q, k, v)
g_xla = lambda q, k, v: jax.grad(
    lambda a, b, c: jnp.sum(xla(a, b, c).astype(jnp.float32) ** 2), (0, 1, 2)
)(q, k, v)

# gradient agreement (hand kernel vs XLA VJP) at this scale
gf = jax.jit(g_flash)(q, k, v)
gx = jax.jit(g_xla)(q, k, v)
for name, a, b in zip("qkv", gf, gx):
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"d{name} max abs diff: {d}")


def time_one(name, fn):
    def body(c, q, k, v):
        r = fn(q.at[0, 0, 0, 0, 0, 0].set(c.astype(dt)), k, v)
        if isinstance(r, tuple):
            return sum(jnp.mean(t.astype(jnp.float32)) for t in r)
        return jnp.mean(r.astype(jnp.float32))

    ms = bench._time_ms(body, 10, args=(q, k, v))
    print(f"{name}: {ms:.3f} ms", flush=True)


time_one("flash fwd", flash)
time_one("flash fwd+bwd (hand kernel)", g_flash)
time_one("xla fwd+bwd (VJP)", g_xla)
