"""Decompose the splits-6 GenCast denoiser TRAIN step (273.4 ms r3):
pure attention op, single CondTransformerBlock, 16-block processor,
and full train step — fwd vs fwd+bwd — to find where the backward
time beyond the ~6.5 ms/layer attention cost lives.

    python scripts/probe_gencast_train.py [--splits 6 --hops 6]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--splits", type=int, default=6)
    p.add_argument("--hops", type=int, default=6)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--parts", default="attn,block,proc,encdec,train")
    args = p.parse_args()
    parts = set(args.parts.split(","))

    import jax
    import jax.numpy as jnp

    import bench
    from graph_weather_tpu.models.gencast import Denoiser
    from graph_weather_tpu.models.gencast.layers import GenCastProcessor
    from graph_weather_tpu.models.gencast.modules import CondTransformerBlock
    from graph_weather_tpu.train import make_optimizer, make_train_step

    nlon, nlat, hid, blocks, heads = 128, 64, 512, 16, 4
    f_in, f_out = 89, 83
    den = Denoiser(
        grid_lon=np.arange(0.0, 360.0, 360.0 / nlon),
        grid_lat=np.linspace(-90.0, 90.0, nlat),
        input_features_dim=f_in,
        output_features_dim=f_out,
        hidden_dims=(hid, hid),
        num_blocks=blocks,
        num_heads=heads,
        splits=args.splits,
        num_hops=args.hops,
        use_edges_features=False,
        attention_impl="clustered_flash",
    )
    khop = den.khop
    n_mesh = khop.n_senders
    nb = khop.cluster_ids.shape[0]
    n_pad = nb * khop.cluster_block
    print(
        f"splits {args.splits}: n_mesh={n_mesh} nb={nb} "
        f"u_pad={khop.cluster_ids.shape[1]} n_pad={n_pad}",
        flush=True,
    )
    rng = np.random.default_rng(0)

    def bf16_tree(t):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            t,
        )

    def time_fwd(name, fn, *fn_args):
        def body(c, *a):
            first = a[0].at[(0,) * a[0].ndim].set(c)
            r = fn(first, *a[1:])
            return jnp.mean(
                sum(
                    jnp.mean(t.astype(jnp.float32))
                    for t in jax.tree_util.tree_leaves(r)
                )
            )

        ms = bench._time_ms(body, args.iters, args=fn_args)
        print(f"{name}: {ms:.3f} ms", flush=True)
        return ms

    def time_grad(name, loss_fn, params, *fn_args):
        """fwd+bwd wrt params; consumes every grad leaf via global norm."""

        def body(c, *a):
            first = a[0].at[(0,) * a[0].ndim].set(c)
            g = jax.grad(loss_fn)(params, first, *a[1:])
            return sum(
                jnp.sum(t.astype(jnp.float32) ** 2)
                for t in jax.tree_util.tree_leaves(g)
            )

        ms = bench._time_ms(body, args.iters, args=fn_args)
        print(f"{name}: {ms:.3f} ms", flush=True)
        return ms

    # --- A: pure clustered attention op at processor geometry -----------
    if "attn" in parts:
        from graph_weather_tpu.ops.pallas.clustered_flash import (
            clustered_flash_attention,
        )

        c = hid // heads
        q = jnp.asarray(
            rng.standard_normal((n_pad, heads, c)), jnp.bfloat16
        )

        def attn(q, k, v):
            return clustered_flash_attention(
                q, k, v,
                gather_ids=khop.cluster_ids,
                masks=khop.cluster_masks,
                block=khop.cluster_block,
                symmetric=khop.cluster_symmetric,
            )

        time_fwd("attn op fwd (x1 layer)", jax.jit(attn), q, q, q)

        def attn_loss(qkv, q2, k2, v2):
            out = attn(q2 + qkv[0], k2 + qkv[1], v2 + qkv[2])
            return jnp.sum(out.astype(jnp.float32) ** 2)

        qkv0 = jnp.zeros((3,), jnp.bfloat16)
        time_grad("attn op fwd+bwd (x1 layer)", attn_loss, qkv0, q, q, q)

    # --- B: single CondTransformerBlock ---------------------------------
    if "block" in parts:
        blk = CondTransformerBlock(
            out_channels=hid // heads, num_heads=heads, concat=True,
            beta=True, use_edge_features=False,
        )
        x = jnp.asarray(rng.standard_normal((1, n_pad, hid)), jnp.float32)
        cond = jnp.asarray(rng.standard_normal((1, 1, 16)), jnp.float32)
        bp = jax.jit(
            lambda: blk.init(jax.random.PRNGKey(0), x, khop, None, cond)
        )()

        def blk_fwd(x, p, cond):
            return blk.apply(
                bf16_tree(p), x.astype(jnp.bfloat16), khop, None,
                cond.astype(jnp.bfloat16),
            )

        time_fwd("block fwd (x1)", jax.jit(blk_fwd), x, bp, cond)

        def blk_loss(p, x, cond):
            out = blk.apply(
                bf16_tree(p), x.astype(jnp.bfloat16), khop, None,
                cond.astype(jnp.bfloat16),
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        time_grad("block fwd+bwd (x1)", blk_loss, bp, x, cond)

    # --- C: full 16-block processor --------------------------------------
    if "proc" in parts:
        proc = GenCastProcessor(
            latent_dim=hid, hidden_dims=(hid, hid), num_blocks=blocks,
            num_heads=heads, use_edge_features=False,
        )
        xm = jnp.asarray(
            rng.standard_normal((1, n_mesh, hid)), jnp.float32
        )
        noise = jnp.full((1, 1), 1.0)
        pp = jax.jit(
            lambda: proc.init(jax.random.PRNGKey(0), xm, noise, khop)
        )()

        def proc_fwd(x, p, noise):
            return proc.apply(
                bf16_tree(p), x.astype(jnp.bfloat16), noise, khop
            )

        time_fwd("processor fwd (16 blocks)", jax.jit(proc_fwd), xm, pp, noise)

        def proc_loss(p, x, noise):
            out = proc.apply(
                bf16_tree(p), x.astype(jnp.bfloat16), noise, khop
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        time_grad("processor fwd+bwd (16 blocks)", proc_loss, pp, xm, noise)

    # --- D/E: full model fwd and train step ------------------------------
    params = den.init(jax.random.PRNGKey(0))
    corrupted = jax.random.normal(jax.random.PRNGKey(1), (1, nlon, nlat, f_out))
    prev = jax.random.normal(jax.random.PRNGKey(2), (1, nlon, nlat, 2 * f_in))
    noise_l = jnp.full((1, 1), 1.0)
    fwd = den.forward_fn(compute_dtype=jnp.bfloat16)

    if "encdec" in parts:
        time_fwd(
            "full denoiser fwd",
            lambda corrupted, params, prev, noise_l: fwd(
                params, corrupted, prev, noise_l
            ),
            corrupted, params, prev, noise_l,
        )

        def den_loss(p, corrupted, prev, noise_l):
            out = fwd(p, corrupted, prev, noise_l)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        time_grad(
            "full denoiser fwd+bwd (no opt)", den_loss,
            params, corrupted, prev, noise_l,
        )

    if "train" in parts:
        optimizer = make_optimizer(learning_rate=1e-4)
        opt_state = optimizer.init(params)
        target = jax.random.normal(jax.random.PRNGKey(3), (1, nlon, nlat, f_out))

        def loss_fn(pred, tgt):
            return jnp.mean((pred - tgt) ** 2)

        step = make_train_step(fwd, loss_fn, optimizer)
        ms = bench._time_train_ms(
            step, params, opt_state, args.iters, corrupted, prev, noise_l,
            target,
        )
        print(f"full train step: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
