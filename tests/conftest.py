import os

# Tests run on a virtual 8-device CPU mesh regardless of attached accelerators,
# so sharding paths are exercised without a pod. The container's sitecustomize
# force-selects the 'axon' TPU platform via jax.config, so we must override the
# config value (the env var alone is not enough) before any backend init.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The full suite compiles several hundred XLA:CPU programs in one
    process; past a cumulative threshold this jaxlib's CPU backend
    segfaults inside ``backend_compile_and_load`` on the next large
    compile (reproduced deterministically at the same test across runs;
    any half of the suite alone passes). Dropping JAX's executable caches
    at module boundaries keeps the process under the threshold — at the
    cost of some cross-module recompiles, which the suite's timings
    already absorb."""
    yield
    import jax

    jax.clear_caches()
