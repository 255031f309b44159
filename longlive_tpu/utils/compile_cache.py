"""Persistent XLA compilation cache shared by every entry point.

The reference's only compile cost is ``torch.compile(flex_attention)``
(seconds — /root/reference/wan/modules/causal_model.py:28-29); here a cold
start compiles the whole serving graph plus Mosaic kernels (~169 s measured
e2e, and 1000+ s for the staged train probes), so every CLI, the bench, the
graft entry, and the probe scripts route through :func:`enable` to reuse
compiled executables across processes.

Cache location (first hit wins):
  1. ``LONGLIVE_JAX_CACHE`` env var (``0``/empty string disables),
  2. ``<repo>/.jax_cache`` (gitignored, shared by all tools in the repo).

``jax_persistent_cache_min_compile_time_secs`` is tuned low (2 s): the
serving path is many medium-sized programs (per-segment scans, recache
prefills, VAE stages) rather than one giant jit, so a high threshold would
leave most of the cold-start cost uncached.
"""

from __future__ import annotations

import os

_REPO_DEFAULT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))


def enable(cache_dir: str | None = None) -> str | None:
    """Turn on the persistent compilation cache; returns the dir (or None
    when disabled via ``LONGLIVE_JAX_CACHE=0``).  Idempotent, cheap, safe
    to call before or after backend init."""
    import jax

    env = os.environ.get("LONGLIVE_JAX_CACHE")
    if env is not None and env in ("", "0"):
        return None
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu") and not env:
        # CPU-forced runs (tests, multiproc sims): XLA:CPU AOT cache
        # entries are host-machine-feature-bound — entries written by
        # processes with different feature preferences load with
        # "Machine type ... doesn't match" and can SIGILL (observed as a
        # fatal native crash mid-suite).  The cache's value is the TPU
        # path; CPU tiny-config compiles are seconds anyway.  Set
        # LONGLIVE_JAX_CACHE explicitly to force-enable on CPU.
        return None
    path = cache_dir or env or _REPO_DEFAULT
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:  # persist XLA-internal caches (autotune etc.) too where supported
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass
    return path
