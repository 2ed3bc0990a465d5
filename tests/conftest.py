"""Test harness config: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised hermetically.

The ambient environment registers the tunneled 'axon' TPU backend from
``sitecustomize`` at interpreter startup and pins ``JAX_PLATFORMS=axon``,
so env vars alone are not enough — we override the jax config directly
(this runs before any backend is initialised because no test module
touches jax at import time).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
