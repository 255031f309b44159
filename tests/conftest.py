import os

# Multi-device CPU simulation for sharding tests; also keeps unit tests off
# the (single, shared) TPU chip.  The axon TPU plugin in this environment
# ignores the JAX_PLATFORMS env var, so set the config flag explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "collective_timeout" not in flags:
    # XLA:CPU collectives abort if a virtual device's thread misses the
    # rendezvous (40 s default) — loaded 1-core hosts starve routinely
    flags = (flags + " --xla_cpu_collective_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
