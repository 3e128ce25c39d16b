"""Sweep NATTEN flash fwd/bwd VMEM budgets -> tile sizes -> wall time.

The tile picker chooses the first candidate whose modeled working set
fits the budget (_VMEM_MODEL_BUDGET / _VMEM_BWD_BUDGET). Bigger tiles
cut the halo ratio and grid steps; this sweep measures whether larger
budgets (still under the 100 MB scoped-vmem limit) pay off at the
WeatherMesh 1-deg latent shape.

    python scripts/probe_natten_tiles.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from graph_weather_tpu.ops.pallas import natten_flash as nf

B, D, H, W, heads, ch = 1, 14, 45, 90, 4, 32
kernel = (3, 5, 5)
dt = jnp.bfloat16

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, D, H, W, heads, ch)), dt)
k = jnp.asarray(rng.standard_normal((B, D, H, W, heads, ch)), dt)
v = jnp.asarray(rng.standard_normal((B, D, H, W, heads, ch)), dt)
rpb = jnp.asarray(rng.standard_normal((heads, 5, 9, 9)), jnp.float32)


def flash(q, k, v):
    return nf.neighborhood_attention_3d_flash(q, k, v, kernel, rpb)


def g_flash(q, k, v):
    return jax.grad(
        lambda a, b, c: jnp.sum(flash(a, b, c).astype(jnp.float32) ** 2),
        (0, 1, 2),
    )(q, k, v)


def time_one(name, fn, n=8):
    def body(c, q, k, v):
        r = fn(q.at[0, 0, 0, 0, 0, 0].set(c.astype(dt)), k, v)
        if isinstance(r, tuple):
            return sum(jnp.mean(t.astype(jnp.float32)) for t in r)
        return jnp.mean(r.astype(jnp.float32))

    try:
        ms = bench._time_ms(body, n, args=(q, k, v))
        print(f"  {name}: {ms:.3f} ms", flush=True)
    except Exception as e:  # compile failure (VMEM overflow etc.)
        print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


ref = jax.jit(flash)(q, k, v)
for fwd_mb, bwd_mb in ((28, 36), (48, 64), (64, 80), (80, 96)):
    nf._VMEM_MODEL_BUDGET = fwd_mb * 2**20
    nf._VMEM_BWD_BUDGET = bwd_mb * 2**20
    ft = bt = None
    for th, tw in nf._candidate_tiles(D, H, W, kernel, False):
        if th > H or tw > W:
            continue
        if ft is None and nf._est_bytes(
            D, th, tw, kernel, heads * ch, ch, 2, False,
            nf._n_cls(H, W, kernel, th, tw, False),
        ) <= nf._VMEM_MODEL_BUDGET:
            ft = (th, tw)
        if bt is None and nf._est_bytes_bwd(
            D, th, tw, kernel, heads * ch, ch, 2, False, True,
            nf._n_cls(H, W, kernel, th, tw, False),
        ) <= nf._VMEM_BWD_BUDGET:
            bt = (th, tw)
    print(f"budget fwd={fwd_mb}MB bwd={bwd_mb}MB -> tiles fwd={ft} bwd={bt}",
          flush=True)
    out = jax.jit(flash)(q, k, v)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"  fwd max abs diff vs ref: {err}", flush=True)
    time_one("fwd", flash)
    time_one("fwd+bwd", g_flash)
