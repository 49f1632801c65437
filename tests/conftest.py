"""Test config: run on a virtual 8-device CPU mesh (no TPU needed).

The axon TPU PJRT plugin in this image ignores the JAX_PLATFORMS env var, so
force the platform through the config API before any test module imports jax
numerics.  The 8 virtual CPU devices let sharding tests run without a pod.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope='module')
def _bound_jax_cache_growth():
    """Drop jit caches after every test MODULE.

    The full suite compiles ~200 distinct executables; around the ~160th
    the XLA CPU compiler aborts/segfaults inside backend_compile_and_load
    (reproduced twice at the same alphabetical position, never in
    isolation — cumulative compiler state, not a test bug).  Modules
    rarely share jitted shapes anyway, so clearing per module bounds the
    growth at negligible recompile cost."""
    yield
    jax.clear_caches()
