"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
paths (`qcss_tpu.parallel`) are exercised without TPU hardware; the real-chip
path is covered by `bench.py` and the graft entry points.

Must run before jax initializes, hence environment setup at import time.
The environment may preset JAX_PLATFORMS (e.g. to a TPU tunnel), so the
override is unconditional.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's site customization may register an external TPU plugin
# that wins over JAX_PLATFORMS; the config update below is authoritative.
import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The suite performs ~700 XLA CPU compilations in one process; past a
    threshold the CPU backend's compiler segfaults inside
    backend_compile_and_load on an otherwise-fine program (reproduced on
    jax 0.9: the full suite crashed in whichever module compiled next,
    while any ~90% subset passed). Dropping the live-executable caches
    between modules keeps the process under that edge; per-module
    recompiles of shared helpers cost far less than the lost run.
    """
    yield
    jax.clear_caches()
