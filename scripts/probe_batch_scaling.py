"""Probe: where does the batched denoiser's per-sample slowdown live?

Round-2 finding (NOTES.md): at splits 5 the denoiser forward costs
14.9 ms at batch 1 but 23.5 ms/sample at batch 4, and the standalone
clustered attention layer goes 0.84 -> 1.17 ms/sample/layer. This probe
isolates the candidates on the real splits-5 k-hop layout:

  a. clustered_flash_attention, batch-native, B in {1, 2, 4}
  b. the k/v union gather alone (same B sweep)
  c. head-folded variant: fold B into the HEAD axis instead of the
     block-grid axis ([B,N,h,c] -> [N,B*h,c]) — one wide-row gather
     instead of B narrow ones, masks fetched once per block for all
     B*h head steps
  d. gather with pre-flattened [N, B*hc] rows (transpose-then-gather)

Usage: python scripts/probe_batch_scaling.py [--splits 5 --hops 4]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jax.device_get(leaf)).ravel()[0])


def time_ms(fn, n_iter, *args):
    """Honest harness: chained scan, fresh-seed dispatch, host fetch."""

    def one(c, _):
        out = fn(c, *args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return c + 1.0 + 0.0 * leaf.astype(jnp.float32).mean(), None

    @jax.jit
    def scan_fn(c0, *a):
        (c), _ = jax.lax.scan(
            lambda c, x: one(c, x), c0, None, length=n_iter
        )
        return c

    _fetch(scan_fn(jnp.float32(0.0), *args))
    triv = jax.jit(lambda s: s + 1.0)
    _fetch(triv(jnp.float32(0.5)))
    t0 = time.perf_counter()
    _fetch(triv(jnp.float32(1.5)))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    _fetch(scan_fn(jnp.float32(1.0), *args))
    return (time.perf_counter() - t0 - overhead) / n_iter * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splits", type=int, default=5)
    ap.add_argument("--hops", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--chead", type=int, default=128)
    args = ap.parse_args()

    from graph_weather_tpu.models.gencast.graphs import build_graphcast_graphs
    from graph_weather_tpu.nn.graph_blocks import DeviceGraph
    from graph_weather_tpu.ops.pallas.clustered_flash import (
        clustered_flash_attention,
        _gather_kv,
    )

    graphs = build_graphcast_graphs(
        grid_lon=np.arange(0.0, 360.0, 360.0 / 128),
        grid_lat=np.linspace(-90.0, 90.0, 64),
        splits=args.splits,
        num_hops=args.hops,
        add_edge_features_to_khop=False,
        spatial_sort="rcb",
    )
    g = DeviceGraph.from_bundle(graphs.khop, clustered=True)
    n = int(graphs.khop.n_senders)
    h, c = args.heads, args.chead
    nb, u_pad = g.cluster_ids.shape
    print(f"n={n} nb={nb} block={g.cluster_block} u_pad={u_pad}")

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    def attn(cc, q, k, v):
        q = q.at[..., 0, 0, 0].set(cc.astype(dt))
        return clustered_flash_attention(
            q, k, v, g.cluster_ids, g.cluster_masks, block=g.cluster_block
        )

    def gather_only(cc, k):
        kf = k.reshape(k.shape[0], n, h * c)
        kf = kf.at[..., 0, 0].set(cc.astype(dt))
        return _gather_kv(kf, g.cluster_ids)

    def attn_headfold(cc, q, k, v):
        # [B,N,h,c] -> [N,B*h,c]: fold batch into the head grid axis.
        b = q.shape[0]
        q = q.at[..., 0, 0, 0].set(cc.astype(dt))
        qf, kf, vf = (
            t.transpose(1, 0, 2, 3).reshape(n, b * h, c) for t in (q, k, v)
        )
        out = clustered_flash_attention(
            qf, kf, vf, g.cluster_ids, g.cluster_masks, block=g.cluster_block
        )
        return out.reshape(n, b, h, c).transpose(1, 0, 2, 3)

    def gather_wide(cc, k):
        # transpose-then-gather: [B,N,hc] -> [N, B*hc] rows, one gather.
        b = k.shape[0]
        kf = k.reshape(b, n, h * c)
        kf = kf.at[..., 0, 0].set(cc.astype(dt))
        kw = kf.transpose(1, 0, 2).reshape(n, b * h * c)
        return jnp.take(kw, g.cluster_ids.reshape(-1), axis=0)

    for bsz in (1, 2, 4):
        q, k, v = (
            jax.random.normal(kk, (bsz, n, h, c), dtype=dt)
            for kk in jax.random.split(key, 3)
        )
        it = 40 if bsz == 1 else 20
        ms = time_ms(attn, it, q, k, v)
        print(f"B={bsz} attn(batch-native)    {ms:8.3f} ms  "
              f"{ms / bsz:7.3f} ms/sample")
        ms = time_ms(gather_only, it, k)
        print(f"B={bsz} gather k only         {ms:8.3f} ms  "
              f"{ms / bsz:7.3f} ms/sample")
        if bsz > 1:
            ms = time_ms(attn_headfold, it, q, k, v)
            print(f"B={bsz} attn(head-folded)     {ms:8.3f} ms  "
                  f"{ms / bsz:7.3f} ms/sample")
            ms = time_ms(gather_wide, it, k)
            print(f"B={bsz} gather k wide-rows    {ms:8.3f} ms  "
                  f"{ms / bsz:7.3f} ms/sample")


if __name__ == "__main__":
    main()
