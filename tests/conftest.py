"""Test configuration: run on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must run
on local CPU devices — eager flax init over the tunnel is pathologically
slow and multi-device sharding tests need 8 virtual devices. The env var is
overridden at import by the axon site customization, so we also force the
platform through jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Tests exercise the real graph builders; only TestGraphCache opts back in
# (monkeypatch) to cover the cache itself.
os.environ.setdefault("GRAPH_WEATHER_TPU_GRAPH_CACHE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
