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


import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _free_jax_memory_between_modules():
    """Release each module's compiled executables (and the device buffers
    their constants pin) once the module finishes. The suite grew to the
    point where ~200 accumulated CPU-mesh programs made the 32k-token SP
    test abort inside XLA (reproducible in-suite, passes standalone) —
    per-module cache clearing keeps the peak bounded while leaving
    within-module reuse intact."""
    yield
    jax.clear_caches()
    gc.collect()
