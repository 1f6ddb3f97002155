"""Test config: force an 8-virtual-device CPU platform.

The container boots with JAX_PLATFORMS=axon (single real TPU chip via a
tunnel) and a sitecustomize that imports jax *before* pytest runs, so env
vars are too late -- override through jax.config instead.  Multi-chip
sharding is validated on the virtual CPU mesh (the driver separately
dry-runs the multichip path); bench.py runs on the real chip.
"""

import os

# Must be set before the CPU backend is initialized (first jax.devices()).
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8, jax.devices()
