"""AOT serialized-executable cache for the serving path.

The persistent XLA compilation cache (utils/compile_cache.py) removes
recompiles but still pays Python tracing + lowering + cache lookup per
program (~35 s of the measured 52 s warm start).  This layer serializes the
fully-compiled TPU executable (``jax.experimental.serialize_executable``)
keyed by function identity + abstract argument signature + package-source
hash + device fingerprint, so a warm process start skips tracing and
compilation entirely (measured deserialize: ~2 ms).

The reference has no analogue — its only compile is
``torch.compile(flex_attention)`` (wan/modules/causal_model.py:28-29);
this closes the cold-start gap a fully-jitted design otherwise opens.

Correctness: the key includes a content hash of every ``.py`` in the
package (any source edit invalidates), the repr of the closed-over configs
(callers pass it), every ``LONGLIVE_*`` env var (they gate traced code
paths), the jax version, and the device kind.  Any load/compile error
falls back to plain ``jax.jit`` — this cache can only ever cost a compile,
never correctness.

Disabled with ``LONGLIVE_AOT=0``.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Optional

import jax

_FP: Optional[str] = None


def _package_fingerprint() -> str:
    """Content hash of the package's .py sources (stable across clones)."""
    global _FP
    if _FP is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(os.path.relpath(p, root).encode())
                    with open(p, "rb") as f:
                        h.update(hashlib.sha256(f.read()).digest())
        _FP = h.hexdigest()[:16]
    return _FP


def enabled() -> bool:
    return os.environ.get("LONGLIVE_AOT", "1") == "1"


def _cache_dir() -> str:
    from . import compile_cache

    base = (jax.config.jax_compilation_cache_dir
            or compile_cache.enable() or "/tmp/longlive_jax_cache")
    return os.path.join(base, "aot")


def _abstract_sig(args) -> str:
    def leaf(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return (tuple(x.shape), str(x.dtype),
                    bool(getattr(x, "weak_type", False)))
        return ("py", repr(x))

    leaves, treedef = jax.tree.flatten(args)
    return repr((treedef, [leaf(x) for x in leaves]))


def _env_sig() -> str:
    return repr(sorted((k, v) for k, v in os.environ.items()
                       if k.startswith("LONGLIVE_")))


class _AOTJit:
    """jit wrapper that persists compiled executables to disk."""

    def __init__(self, fn, key: str, donate_argnums=()):
        self._jit = jax.jit(fn, donate_argnums=donate_argnums)
        self._key = key
        self._calls = {}  # sig -> callable

    def _path(self, sig: str) -> str:
        dev = jax.devices()[0]
        ident = "|".join((self._key, sig, _env_sig(), jax.__version__,
                          getattr(dev, "device_kind", str(dev)), dev.platform,
                          _package_fingerprint()))
        return os.path.join(
            _cache_dir(), hashlib.sha256(ident.encode()).hexdigest() + ".aot")

    def _load_or_compile(self, args, sig: str):
        from jax.experimental import serialize_executable as se

        path = self._path(sig)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                return se.deserialize_and_load(payload, in_tree, out_tree)
            except Exception:
                pass  # stale/corrupt entry: fall through to recompile
        compiled = self._jit.lower(*args).compile()

        def _store():  # serializing GB-scale executables costs tens of
            # seconds — off the critical path (daemon thread; a killed
            # process just loses the cache entry, never corrupts it)
            try:
                blob = pickle.dumps(se.serialize(compiled))
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)
                _prune(os.path.dirname(path))
            except Exception:
                pass  # non-serializable program or read-only cache

        import threading

        threading.Thread(target=_store, daemon=True).start()
        return compiled

    def __call__(self, *args):
        sig = _abstract_sig(args)
        call = self._calls.get(sig)
        if call is None:
            # TPU-only: XLA:CPU AOT results are host-machine-feature-bound
            # (SIGILL risk) and break under virtual-device test meshes
            if jax.devices()[0].platform != "tpu":
                call = self._jit
            else:
                try:
                    call = self._load_or_compile(args, sig)
                except Exception:
                    call = self._jit  # AOT must never break the serving path
            self._calls[sig] = call
        return call(*args)


def _prune(aot_dir: str) -> None:
    """Bound the AOT dir (default 6 GB, LONGLIVE_AOT_CACHE_GB): source
    edits change the package fingerprint, orphaning prior entries — oldest
    entries are deleted first."""
    cap = float(os.environ.get("LONGLIVE_AOT_CACHE_GB", "6")) * 1e9
    entries = []
    total = 0
    for name in os.listdir(aot_dir):
        if name.endswith(".aot"):
            p = os.path.join(aot_dir, name)
            st = os.stat(p)
            entries.append((st.st_mtime, st.st_size, p))
            total += st.st_size
    entries.sort()
    for _, size, p in entries:
        if total <= cap:
            break
        try:
            os.remove(p)
            total -= size
        except OSError:
            pass


def aot_jit(fn, key: str, donate_argnums=()):
    """``jax.jit`` with persistent compiled-executable reuse.  ``key`` must
    capture everything the closure captures (config reprs etc.) — argument
    shapes/dtypes are keyed automatically."""
    if not enabled():
        return jax.jit(fn, donate_argnums=donate_argnums)
    return _AOTJit(fn, key, donate_argnums)
