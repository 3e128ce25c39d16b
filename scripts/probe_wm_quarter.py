"""0.25-degree WeatherMesh feasibility: per-chip latitude-slab cost.

The production WeatherMesh resolution is 0.25 deg (reference
weathermesh2.py:69-149): 720 x 1440 grid, 13 pressure levels. The
round-5 latitude-sharded runner (parallel/weathermesh_spatial.py)
splits the lat axis 8 ways with ppermute halo exchange; this probe
measures ONE chip's share on the real v5e as a standalone slab:
H = 720/8 + 6 halo-margin rows = 96, full circular W = 1440.

Reports fwd and train (fwd+bwd+AdamW, bf16) for the slab, plus the
peak-memory picture, answering "does 0.25-deg WeatherMesh train on one
chip or does it need the spatial sharding?" (VERDICT r4 item 3).

    python scripts/probe_wm_quarter.py [--full]   # --full tries the
                                                  # UNSHARDED 720x1440
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from graph_weather_tpu.models.weathermesh import WeatherMeshConfig
from graph_weather_tpu.train import make_optimizer, make_train_step


def run(h, w, label):
    levels, latent = 13, 128
    cfg = WeatherMeshConfig(
        timesteps=[6],
        surface_channels=8,
        pressure_channels=4,
        pressure_levels=levels,
        latent_dim=latent,
        encoder_num_conv_blocks=2,
        encoder_num_transformer_layers=2,
        encoder_hidden_dim=64,
        decoder_num_conv_blocks=2,
        decoder_num_transformer_layers=2,
        decoder_hidden_dim=64,
        processor_num_layers=4,
        kernel=(3, 5, 5),
        num_heads=4,
    )
    model = cfg.build()
    surface = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 8))
    pressure = jax.random.normal(
        jax.random.PRNGKey(2), (1, levels, h, w, 4)
    )
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), surface, pressure, 1)
    )()
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    @jax.jit
    def fwd(params, surface, pressure):
        out = model.apply(
            bench._wm_bf16({"params": params, **rest}),
            surface.astype(jnp.bfloat16),
            pressure.astype(jnp.bfloat16),
            1,
        )
        return out.surface.astype(jnp.float32)

    def body(c, params, surface, pressure):
        return fwd(params, surface.at[0, 0, 0, 0].set(c), pressure)

    ms = bench._time_ms(body, 6, args=(params, surface, pressure))
    print(f"{label} fwd: {ms:.1f} ms", flush=True)

    def fwd_full(p, surface, pressure):
        return model.apply(
            bench._wm_bf16({"params": p, **rest}),
            surface.astype(jnp.bfloat16),
            pressure.astype(jnp.bfloat16),
            1,
        )

    def loss_fn(pred, tgt):
        ts, tp = tgt
        return jnp.mean(
            (pred.surface.astype(jnp.float32) - ts) ** 2
        ) + jnp.mean((pred.pressure.astype(jnp.float32) - tp) ** 2)

    optimizer = make_optimizer(learning_rate=1e-4)
    opt_state = optimizer.init(params)
    step = make_train_step(fwd_full, loss_fn, optimizer)
    tgt = (
        jax.random.normal(jax.random.PRNGKey(3), surface.shape),
        jax.random.normal(jax.random.PRNGKey(4), pressure.shape),
    )
    ms = bench._time_train_ms(
        step, params, opt_state, 6, surface, pressure, tgt
    )
    print(f"{label} train: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    # One chip's 8-way share: 90 owned lat rows + 6 margin (the sharded
    # runner exchanges per-layer halos instead; the margin over-counts
    # slightly, making this an upper bound on the per-chip share).
    run(96, 1440, "quarter-slab 96x1440x13")
    if "--full" in sys.argv:
        run(720, 1440, "UNSHARDED 720x1440x13")
