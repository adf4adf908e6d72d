"""Test harness: run JAX on CPU with 8 virtual devices (multi-chip testing).

Force-override JAX_PLATFORMS: this machine's profile exports
JAX_PLATFORMS=axon (the tunneled TPU), and tests must never contend for the
single real chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# the jaxtyping pytest plugin imports jax BEFORE this conftest runs, which
# freezes jax_platforms from the profile's JAX_PLATFORMS=axon -- update the
# live config too (backends have not initialized yet at conftest time)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
