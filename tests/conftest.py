"""Test harness: run everything on an 8-device virtual CPU mesh.

The reference ships zero tests (SURVEY.md §4); this suite is the framework's
test pyramid. Multi-chip sharding paths are exercised with
xla_force_host_platform_device_count=8 as the stand-in for a v5p-8 slice.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Something in this image pre-sets jax_platforms="axon,cpu"; the env var alone
# does not win, so force it through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
