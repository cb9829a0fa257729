"""Test configuration: run the suite on a simulated 8-device CPU mesh.

The container pre-sets JAX_PLATFORMS=axon (a remote TPU tunnel) and a
sitecustomize that imports JAX at interpreter startup, so by the time
conftest runs a backend may already be initialized against the tunnel —
which makes every device->host transfer a remote round-trip.  We force the
platform to CPU with 8 virtual devices and clear any pre-initialized
backends so sharding tests exercise real collectives locally.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax._src.xla_bridge.backends.cache_clear()  # drop any axon backend
except Exception:
    pass

jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
