"""Test configuration: run on a virtual 8-device CPU mesh with x64.

Correctness goldens follow hypre's default double-precision build;
TPU runs use f32 (the --enable-single analog) and are exercised by
bench.py on real hardware instead.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The environment's sitecustomize may pre-register a TPU plugin; tests
# always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """The full suite accumulates hundreds of compiled CPU executables
    across modules; the XLA CPU backend eventually SIGABRTs inside
    backend_compile (observed at ~47% of the suite, test_parallel).
    Dropping the compilation caches between modules keeps it stable."""
    yield
    jax.clear_caches()
