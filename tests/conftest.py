"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware (and without paying
per-op TPU compile round-trips for tiny test problems)."""

import os

os.environ["PPS_NO_COMPILE_CACHE"] = "1"  # CPU AOT artifacts are not portable

# The session environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests
# must override it, not setdefault it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
