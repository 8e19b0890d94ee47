"""Test environment: force CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual host-platform mesh (the
pattern the reference uses for testing parallel scheduling without parallel
hardware — its broadphase tests run every build at numThreads 0 and 1,
``Tests/PlayModeTests/Collision/World/BroadphaseTests.cs:69``).

The session sitecustomize registers a TPU PJRT plugin and forces
``jax_platforms`` via jax.config (which beats the env var), so we must
override through jax.config as well — before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
