"""Host-offload memory management.

TPU-native replacement for the reference's ``DynamicSwapInstaller`` weight
streaming and memory-preserving moves (utils/memory.py:13-146): large,
rarely-used parameter trees (the umT5 encoder in low-memory mode,
inference.py:62,135-136) live in host memory and are transferred per-use.
"""

from __future__ import annotations

from typing import Any

import jax


def host_sharding():
    """Pinned-host placement for the default device."""
    dev = jax.devices()[0]
    return jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")


def offload_to_host(tree: Any) -> Any:
    """Moves a param pytree to pinned host memory (keeps it addressable by
    later device_put without a host round-trip)."""
    try:
        sh = host_sharding()
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    except Exception:
        # backends without pinned_host: plain host numpy
        import numpy as np

        return jax.tree.map(lambda x: np.asarray(x), tree)


def to_device(tree: Any) -> Any:
    return jax.tree.map(jax.device_put, tree)


def hbm_bytes(tree: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def log_memory(tag: str = ""):
    """Device memory stats printout (reference log_gpu_memory,
    utils/memory.py:86-91)."""
    try:
        stats = jax.devices()[0].memory_stats()
        used = stats.get("bytes_in_use", 0) / 2**30
        limit = stats.get("bytes_limit", 0) / 2**30
        print(f"[mem] {tag}: {used:.2f} / {limit:.2f} GiB in use")
    except Exception:
        print(f"[mem] {tag}: memory_stats unavailable")
