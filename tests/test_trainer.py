"""Trainer: loss decreases, NaN-skip, checkpoint save/resume round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_weather_tpu import GraphWeatherForecaster, NormalizedMSELoss
from graph_weather_tpu.train import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def setup():
    lat_lons = [
        (float(a), float(b)) for a in range(-80, 81, 40) for b in range(0, 360, 60)
    ]
    model = GraphWeatherForecaster(
        lat_lons, feature_dim=4, aux_dim=2, node_dim=16, edge_dim=16, num_blocks=1,
        hidden_dim_processor_node=16, hidden_dim_processor_edge=16, hidden_dim_decoder=8,
    )
    params = model.init(jax.random.PRNGKey(0))
    loss = NormalizedMSELoss(np.ones(4), lat_lons, normalize=True)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, len(lat_lons), 6)).astype(np.float32)
    y = (x[..., :4] + 0.1).astype(np.float32)
    return model, params, loss, x, y


def test_loss_decreases(setup):
    model, params, loss, x, y = setup
    trainer = Trainer(
        model.forward_fn(), loss,
        TrainerConfig(peak_lr=1e-2, warmup_steps=2, total_steps=50, log_every=5),
    )
    batches = [(x, y)] * 30
    params2, _, history = trainer.fit(params, batches, num_steps=30)
    assert history[-1]["loss"] < history[0]["loss"]
    assert history[-1]["steps_per_sec"] > 0


def test_nan_batch_skipped(setup):
    model, params, loss, x, y = setup
    trainer = Trainer(
        model.forward_fn(), loss,
        TrainerConfig(peak_lr=1e-3, warmup_steps=1, total_steps=10, log_every=1),
    )
    bad_x = x.copy()
    bad_x[0, 0, 0] = np.nan
    batches = [(x, y), (bad_x, y), (x, y)]
    params2, _, history = trainer.fit(params, batches, num_steps=3)
    leaves = jax.tree_util.tree_leaves(params2)
    assert all(np.isfinite(np.asarray(p)).all() for p in leaves)


def test_checkpoint_roundtrip(setup, tmp_path):
    model, params, loss, x, y = setup
    cfg = TrainerConfig(
        peak_lr=1e-3, warmup_steps=1, total_steps=10,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=2, log_every=1,
    )
    trainer = Trainer(model.forward_fn(), loss, cfg)
    params2, opt_state, _ = trainer.fit(params, [(x, y)] * 4, num_steps=4)

    trainer2 = Trainer(model.forward_fn(), loss, cfg)
    step, rparams, ropt = trainer2.resume(params)
    assert step == 4
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        params2, rparams,
    )


def test_scan_rollout_matches_python_loop(setup):
    from graph_weather_tpu.train.rollout import make_rollout_fn

    model, params, _, x, _ = setup
    x = jnp.asarray(x)
    roll = jax.jit(make_rollout_fn(model.forward_fn(), 3))
    traj = roll(params, x)
    fwd = model.forward_fn()
    state = x
    outs = []
    for _ in range(3):
        o = fwd(params, state)
        outs.append(o)
        state = jnp.concatenate([o, state[..., 4:]], axis=-1)
    ref = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(ref), atol=1e-5)


def test_save_load_params_roundtrip(setup, tmp_path):
    """Mirror of the reference's save/load round-trip tests."""
    from graph_weather_tpu.train import load_params, save_params

    model, params, _, x, _ = setup
    path = str(tmp_path / "weights.msgpack")
    save_params(path, params)
    fresh = model.init(jax.random.PRNGKey(42))  # different init
    restored = load_params(path, fresh)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, restored,
    )
    out1 = model.apply(params, jnp.asarray(x))
    out2 = model.apply(restored, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_distributed_init_single_process_noop():
    """Multi-host init is a safe no-op on single-process runs."""
    from graph_weather_tpu.parallel import distributed_init

    assert distributed_init() is False
    # Explicit process count > 1 without a coordinator must raise, not hang.
    with pytest.raises(ValueError):
        distributed_init(num_processes=4)


def test_place_process_batch_single_process():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graph_weather_tpu.parallel import make_mesh, place_process_batch

    mesh = make_mesh(4)
    x = np.arange(16, dtype=np.float32).reshape(4, 4)
    sharding = NamedSharding(mesh, P("data"))
    out = place_process_batch(x, sharding)
    np.testing.assert_array_equal(np.asarray(out), x)
    assert out.sharding.is_equivalent_to(sharding, 2)


def test_wandb_hook_logs_via_mock(monkeypatch):
    """make_wandb_hook lazily inits a run and logs per step (wandb mocked)."""
    import sys
    import types

    logged = []
    run = types.SimpleNamespace(
        log=lambda m, step: logged.append((step, m)), finish=lambda: None
    )
    fake = types.SimpleNamespace(init=lambda **kw: run)
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from graph_weather_tpu.train.wandb_hook import make_wandb_hook

    hook = make_wandb_hook(project="test-project", config={"a": 1})
    hook(10, {"loss": 0.5})
    hook(20, {"loss": 0.25})
    assert logged == [(10, {"loss": 0.5}), (20, {"loss": 0.25})]


def test_trainer_sample_hook_cadence(setup):
    """sample_hook fires every sample_every steps with the live params."""
    model, params, loss, x, y = setup
    calls = []
    trainer = Trainer(
        model.forward_fn(), loss,
        TrainerConfig(peak_lr=1e-3, warmup_steps=1, total_steps=10,
                      log_every=100, sample_every=3),
        sample_hook=lambda step, p: calls.append(step),
    )
    trainer.fit(params, [(x, y)] * 7, num_steps=7)
    assert calls == [3, 6]


def test_gencast_sampling_hook_renders_figures():
    """make_gencast_sampling_hook samples the diffusion model and hands the
    prediction-vs-truth figures to the injected sink (reference
    models/gencast/train.py:189-239 SamplingCallback analogue)."""
    from graph_weather_tpu.models.gencast import Denoiser
    from graph_weather_tpu.train.wandb_hook import make_gencast_sampling_hook

    nlon, nlat, f_in, f_out = 16, 8, 3, 2
    den = Denoiser(
        grid_lon=np.arange(0.0, 360.0, 360.0 / nlon),
        grid_lat=np.linspace(-90.0, 90.0, nlat),
        input_features_dim=f_in,
        output_features_dim=f_out,
        hidden_dims=(16, 16),
        num_blocks=1,
        num_heads=2,
        splits=1,
        num_hops=1,
        use_edges_features=False,
    )
    params = den.init(jax.random.PRNGKey(0))
    prev = jax.random.normal(jax.random.PRNGKey(1), (1, nlon, nlat, 2 * f_in))
    target = jax.random.normal(jax.random.PRNGKey(2), (1, nlon, nlat, f_out))
    sunk = []
    hook = make_gencast_sampling_hook(
        den, prev, target,
        channels=(0, 1), channel_names=("a", "b"), num_steps=3,
        log_fn=lambda step, figs: sunk.append((step, figs)),
    )
    hook(5, params)
    assert len(sunk) == 1
    step, figs = sunk[0]
    assert step == 5 and set(figs) == {"a", "b"}
    import matplotlib.pyplot as plt

    for fig in figs.values():
        assert len(fig.axes) == 2
        plt.close(fig)
