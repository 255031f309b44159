import os

# Multi-device CPU simulation for sharding tests; also keeps unit tests off
# the (single, shared) TPU chip.  The axon TPU plugin in this environment
# ignores the JAX_PLATFORMS env var, so set the config flag explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
