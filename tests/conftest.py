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
