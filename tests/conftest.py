"""Test harness: force CPU with 8 virtual devices so sharding paths are
exercised without TPU hardware (the driver's dryrun does the same)."""

import os

# The session environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests
# must run locally on CPU, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
