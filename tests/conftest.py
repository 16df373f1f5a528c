"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere.

Note: this machine's site hook (/root/.axon_site/sitecustomize.py) registers
the axon TPU backend at interpreter start and programmatically sets
jax_platforms, so the JAX_PLATFORMS env var alone is NOT enough — we must
override via jax.config before any device is touched.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
