"""Test harness: force CPU with 8 virtual devices so sharding paths are
exercised without TPU hardware (the driver's dryrun does the same)."""

import os

# 8 virtual CPU devices for the sharding tests. XLA_FLAGS is read at
# backend-initialization time, so setting it here works even though the
# session's sitecustomize already imported jax.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The session environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and
# sitecustomize imports jax at interpreter start, so the env var is already
# baked into jax.config — override the CONFIG, not the env, or every test
# op round-trips through the tunnel (~90 ms/sync).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NOTE: do NOT enable the persistent compilation cache here — this image's
# remote-compile service pollutes it with AOT entries built for a different
# machine (cpu_aot_loader then warns about feature mismatch and kernels can
# mis-execute), which produced flaky numerics in the suite.
