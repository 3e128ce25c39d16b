"""Decompose the WeatherMesh 1-degree train step: per-component fwd and
fwd+bwd cost (encoder / processor chain / decoder) at bench shapes."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from graph_weather_tpu.models.weathermesh.model import (
    WeatherMeshDecoder,
    WeatherMeshEncoder,
    WeatherMeshProcessor,
)

h, w, levels, latent = 180, 360, 13, 128
kernel = (3, 5, 5)
heads = 4

rng = np.random.default_rng(0)
surface = jnp.asarray(rng.standard_normal((1, h, w, 8)), jnp.float32)
pressure = jnp.asarray(
    rng.standard_normal((1, levels, h, w, 4)), jnp.float32
)

enc = WeatherMeshEncoder(
    input_channels_2d=8,
    input_channels_3d=4,
    latent_dim=latent,
    n_pressure_levels=levels,
    num_conv_blocks=2,
    hidden_dim=64,
    kernel_size=kernel,
    num_heads=heads,
    num_transformer_layers=2,
)
ev = jax.jit(lambda: enc.init(jax.random.PRNGKey(0), surface, pressure))()
lat_shape = jax.eval_shape(
    lambda v, s, p: enc.apply(v, s, p), ev, surface, pressure
)
print("latent shape:", lat_shape.shape, lat_shape.dtype)
latent_x = jnp.asarray(
    rng.standard_normal(lat_shape.shape), jnp.float32
)

proc = WeatherMeshProcessor(
    latent_dim=latent, n_layers=4, kernel=kernel, num_heads=heads
)
pv = jax.jit(lambda: proc.init(jax.random.PRNGKey(0), latent_x))()

dec = WeatherMeshDecoder(
    latent_dim=latent,
    output_channels_2d=8,
    output_channels_3d=4,
    n_conv_blocks=2,
    hidden_dim=64,
    kernel_size=kernel,
    num_heads=heads,
    num_transformer_layers=2,
)
dv = jax.jit(lambda: dec.init(jax.random.PRNGKey(0), latent_x))()


def bf16(t):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        t,
    )


def time_fn(name, fn, *args):
    def body(c, *a):
        first = a[0].at[(0,) * a[0].ndim].set(c)
        r = fn(first, *a[1:])
        return jnp.mean(
            sum(jnp.mean(t.astype(jnp.float32)) for t in jax.tree_util.tree_leaves(r))
        )

    ms = bench._time_ms(body, 6, args=args)
    print(f"{name}: {ms:.2f} ms", flush=True)


# encoder
time_fn(
    "enc fwd",
    lambda s, p: enc.apply(bf16(ev), s.astype(jnp.bfloat16), p.astype(jnp.bfloat16)),
    surface, pressure,
)
time_fn(
    "enc fwd+bwd",
    lambda s, p: jax.grad(
        lambda v: jnp.sum(
            enc.apply(bf16(v), s.astype(jnp.bfloat16), p.astype(jnp.bfloat16)).astype(jnp.float32) ** 2
        )
    )(ev),
    surface, pressure,
)
# processor (4 NATTEN layers)
time_fn(
    "proc fwd",
    lambda x: proc.apply(bf16(pv), x.astype(jnp.bfloat16)),
    latent_x,
)
time_fn(
    "proc fwd+bwd",
    lambda x: jax.grad(
        lambda v: jnp.sum(
            proc.apply(bf16(v), x.astype(jnp.bfloat16)).astype(jnp.float32) ** 2
        )
    )(pv),
    latent_x,
)
# decoder
time_fn(
    "dec fwd",
    lambda x: dec.apply(bf16(dv), x.astype(jnp.bfloat16)),
    latent_x,
)
time_fn(
    "dec fwd+bwd",
    lambda x: jax.grad(
        lambda v: jnp.sum(
            sum(
                jnp.sum(t.astype(jnp.float32) ** 2)
                for t in jax.tree_util.tree_leaves(
                    dec.apply(bf16(v), x.astype(jnp.bfloat16))
                )
            )
        )
    )(dv),
    latent_x,
)
