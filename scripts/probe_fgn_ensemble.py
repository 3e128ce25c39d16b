"""Probe FGN ensemble member-chunk scaling at reference scale.

BENCH r5 first run: 8 members / chunk 2 measured 451.8 ms/member vs
178.6 ms single-member — 2.5x anti-scaling where the GenCast batch-4
analogue costs only 1.2x. Times chunk sizes to localize the cost.

    python scripts/probe_fgn_ensemble.py [--chunks 1,2,4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunks", default="1,2,4")
    p.add_argument("--members", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from graph_weather_tpu.models.fgn import FunctionalGenerativeNetwork

    nlon, nlat, hid, blocks, splits, hops = 128, 64, 768, 24, 6, 6
    f_in, f_out, zdim = 89, 83, 32
    fgn = FunctionalGenerativeNetwork(
        grid_lon=np.arange(0.0, 360.0, 360.0 / nlon),
        grid_lat=np.linspace(-90.0, 90.0, nlat),
        input_features_dim=f_in,
        output_features_dim=f_out,
        noise_dimension=zdim,
        hidden_dims=(hid, hid),
        num_blocks=blocks,
        splits=splits,
        num_hops=hops,
        use_edges_features=False,
        attention_impl="clustered_flash",
    )
    params = fgn.init(jax.random.PRNGKey(0))
    prev = jax.random.normal(jax.random.PRNGKey(1), (1, nlon, nlat, f_in))

    # Baseline: single member
    member = jax.jit(fgn.member_fn(compute_dtype=jnp.bfloat16))
    z = jax.random.normal(jax.random.PRNGKey(2), (1, zdim))

    def body_m(c, params, prev, z):
        return member(params, prev.at[0, 0, 0, 0].set(c), z)

    ms = bench._time_ms(body_m, 6, args=(params, prev, z))
    print(f"single member: {ms:.1f} ms", flush=True)

    key = jax.random.PRNGKey(3)
    for chunk in [int(c) for c in args.chunks.split(",")]:
        # Direct vmap at the chunk size (no lax.map): isolates the vmap
        # batching cost from the sequential-map overhead.
        if chunk > 1:
            fwd_v = jax.jit(
                fgn.forward_fn(chunk, compute_dtype=jnp.bfloat16)
            )

            def body_v(c, params, prev, key):
                return fwd_v(params, prev.at[0, 0, 0, 0].set(c), key)

            ms = bench._time_ms(body_v, 3, args=(params, prev, key))
            print(
                f"vmap({chunk}) direct: {ms:.1f} ms total, "
                f"{ms / chunk:.1f} ms/member",
                flush=True,
            )
        fwd_c = jax.jit(
            fgn.forward_fn(
                args.members, compute_dtype=jnp.bfloat16, member_chunk=chunk
            )
        )

        def body_c(c, params, prev, key):
            return fwd_c(params, prev.at[0, 0, 0, 0].set(c), key)

        ms = bench._time_ms(body_c, 2, args=(params, prev, key))
        print(
            f"members={args.members} chunk={chunk}: {ms:.1f} ms total, "
            f"{ms / args.members:.1f} ms/member",
            flush=True,
        )


if __name__ == "__main__":
    main()
