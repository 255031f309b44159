"""Host-offload memory management.

TPU-native replacement for the reference's ``DynamicSwapInstaller`` weight
streaming and memory-preserving moves (utils/memory.py:13-146): large,
rarely-used parameter trees (the umT5 encoder in low-memory mode,
inference.py:62,135-136) live in host memory and are transferred per-use.
"""

from __future__ import annotations

from typing import Any

import jax


_MEMORY_KINDS: dict = {}


def supports_memory_kinds(dev=None) -> bool:
    """One cached capability probe per device: can this backend place a
    tiny array with an explicit memory kind?  Keeping the probe separate
    from the real transfers means a genuine paging failure (e.g.
    RESOURCE_EXHAUSTED halfway through a multi-GB tree) PROPAGATES instead
    of being mistaken for a capability gap and silently retried."""
    import numpy as np

    dev = dev if dev is not None else jax.devices()[0]
    key = repr(dev)
    if key not in _MEMORY_KINDS:
        try:
            sh = jax.sharding.SingleDeviceSharding(
                dev, memory_kind="pinned_host")
            jax.device_put(np.zeros((1,), np.float32), sh).block_until_ready()
            _MEMORY_KINDS[key] = True
        except Exception:
            _MEMORY_KINDS[key] = False
    return _MEMORY_KINDS[key]


def host_sharding():
    """Pinned-host placement for the default device."""
    dev = jax.devices()[0]
    return jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")


def offload_to_host(tree: Any) -> Any:
    """Moves a param pytree to pinned host memory (keeps it addressable by
    later device_put without a host round-trip)."""
    if supports_memory_kinds():
        sh = host_sharding()
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    # backends without pinned_host: plain host numpy
    import numpy as np

    return jax.tree.map(lambda x: np.asarray(x), tree)


def to_device(tree: Any) -> Any:
    return jax.tree.map(jax.device_put, tree)


def fetch_from_host(tree: Any, device=None) -> Any:
    """Explicit pinned-host → device-HBM fetch.

    ``jax.device_put(x)`` with no target is a no-op for an array already
    committed to a pinned-host sharding, so paging host-resident params
    back to HBM needs the device memory kind spelled out."""
    dev = device if device is not None else jax.devices()[0]
    if supports_memory_kinds(dev):
        sh = jax.sharding.SingleDeviceSharding(dev, memory_kind="device")
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    # backend without memory kinds (offload fell back to numpy there too)
    return jax.tree.map(lambda x: jax.device_put(x, dev), tree)


def hbm_bytes(tree: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def blocks_to_host(params: dict, key: str = "blocks", device=None) -> dict:
    """Per-access weight streaming, part 1: move the layer-stacked block
    params (every leaf [L, ...]) to host memory, pinning the small
    embedding/head params on device.  The TPU-native counterpart of the
    reference's ``DynamicSwapInstaller.install_model`` (utils/memory.py:13-58),
    which swaps individual submodule tensors on ``__getattr__``: here the
    unit of streaming is one transformer layer's slice of the stacked tree,
    fetched one layer ahead of compute by :func:`stream_scan`.

    Accepts trees loaded host-side (utils.loading.load_base_dit
    ``on_host=True`` — the only way a never-fits model reaches here): the
    blocks stay in host RAM, and the explicit device_put below moves ONLY
    the small parts to HBM (otherwise each eager use would re-transfer
    them)."""
    import numpy as np

    dev = device if device is not None else jax.devices()[0]
    out = {k: (jax.tree.map(lambda x: jax.device_put(x, dev), v)
               if k != key else v) for k, v in params.items()}
    # numpy (not pinned-host jax arrays): slicing a host jax array is a
    # device computation, which would pull the whole stack back to HBM;
    # a numpy slice is a view and device_put streams just that layer
    out[key] = jax.tree.map(lambda x: np.asarray(x), params[key])
    return out


def stream_scan(step, carry, host_xs, device=None):
    """Double-buffered host→device layer streaming — the compute side of
    per-access weight streaming (reference DynamicSwapInstaller,
    utils/memory.py:13-58).

    ``step(carry, xs_l) -> carry`` runs per layer (callers pass a jitted
    module-level function so it compiles once); ``host_xs`` is a pytree
    whose leaves are stacked [L, ...] and may live on host (numpy or
    pinned-host jax arrays) or device.  Layer l+1's slice is dispatched
    (async) to ``device`` before layer l's compute, so the H2D copy of the
    next layer overlaps the current layer's FLOPs; peak HBM holds two
    layers of weights instead of L.

    Exact-equivalence contract: identical math to
    ``jax.lax.scan(lambda c, xs: (step(c, xs), None), carry, device_xs)``
    (tests/test_weight_streaming.py).
    """
    leaves = jax.tree.leaves(host_xs)
    if not leaves:
        return carry
    length = leaves[0].shape[0]
    if device is None:
        device = jax.devices()[0]

    def fetch(i):
        return jax.device_put(
            jax.tree.map(lambda a: a[i], host_xs), device)

    buf = fetch(0)
    for l in range(length):
        nxt = fetch(l + 1) if l + 1 < length else None
        carry = step(carry, buf)
        buf = nxt
    return carry


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
