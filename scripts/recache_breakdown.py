"""Prompt-switch KV-recache breakdown on the real chip.

The recache (pipeline/causal_inference.build_recache_fn) is one dense
9-frame (14 040-token at the 9/3 serving window) teacher-noise forward
that rewrites the KV window under the new prompt
(reference interactive_causal_inference.py:34-106).  BENCH measures it at
600-620 ms; its FLOP floor (linears ~3x the 4 680-token pass + a causal
14k x 14k flash attention) is ~400 ms on v5e.  This probe splits the
measured time into attention / linears / dispatch-RTT via the same
ablation-timing method as scripts/dit_breakdown.py.

Usage: python scripts/recache_breakdown.py    (env RC_WINDOW="9,3")
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):  # axon plugin ignores the bare env var
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from longlive_tpu.config import CacheConfig, DiTConfig, LatentGeometry
from longlive_tpu.models import dit as D
from longlive_tpu.ops import kv_cache as kvc
from longlive_tpu.ops.quant import quantize_dit_params
from longlive_tpu.ops.rope import make_rope_tables
from longlive_tpu.pipeline.causal_inference import build_recache_fn


def main():
    local, sink = (int(s) for s in os.environ.get("RC_WINDOW", "9,3").split(","))
    use_int8 = os.environ.get("RC_INT8", "1") == "1"
    geom = LatentGeometry(
        height=int(os.environ.get("RC_H", "60")),
        width=int(os.environ.get("RC_W", "104")),
    )
    cfg = DiTConfig(local_attn_size=local, sink_size=sink)
    cache_cfg = CacheConfig.from_model(cfg, geom, 120)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)

    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    if use_int8:
        params = quantize_dit_params(params)
    cross = D.prepare_cross_kv(params, cfg,
                               jnp.zeros((1, 512, 4096), jnp.bfloat16))
    cache = kvc.init_cache(cache_cfg, cfg.num_layers, 1, cfg.num_heads,
                           cfg.head_dim, jnp.bfloat16)
    s = 30  # frames generated before the switch
    for st in range(0, local + sink, 3):
        cache = kvc.advance(cache_cfg, cache, st, 3)
    n = min(local, s)
    replay = jax.random.normal(
        jax.random.PRNGKey(3),
        (1, n, geom.channels, geom.height, geom.width), jnp.float32)
    start = jnp.asarray(s - n, jnp.int32)

    def make_fn(attn_impl="auto"):
        fn = build_recache_fn(cfg, cache_cfg, tables, 0.0, n, True, False,
                              local + sink, attn_impl=attn_impl)
        return jax.jit(lambda p, cc, rp: fn(p, cc, cross, rp, start))

    def timeit(fn, n_reps=4, warmup=1):
        for _ in range(warmup):
            out = fn(params, cache, replay)
        _ = float(jnp.sum(out.k[0, 0, :4, 0, :2].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n_reps):
            out = fn(params, cache, replay)
        _ = float(jnp.sum(out.k[0, 0, :4, 0, :2].astype(jnp.float32)))
        return (time.perf_counter() - t0) / n_reps

    saved = {}

    def patch(mod, name, val):
        saved[(mod, name)] = getattr(mod, name)
        setattr(mod, name, val)

    def unpatch():
        for (mod, name), val in saved.items():
            setattr(mod, name, val)
        saved.clear()

    def emit(row):
        # print incrementally: one OOM'd variant must not eat the others
        rows.append(row)
        print(json.dumps({**row, "window": f"{local},{sink}",
                          "int8": use_int8, "n_frames": n}), flush=True)

    rows = []
    base = timeit(make_fn())
    emit({"variant": "full", "ms": round(base * 1e3, 1)})

    def run(name, setup=None, attn_impl="auto"):
        if setup:
            setup()
        try:
            dt = timeit(make_fn(attn_impl))
        except Exception as e:  # OOM at full scale (e.g. dense attention)
            emit({"variant": name, "error": type(e).__name__})
            return
        finally:
            unpatch()
        emit({"variant": name, "ms": round(dt * 1e3, 1),
              "delta_ms": round((base - dt) * 1e3, 1)})

    run("no_self_attn",
        lambda: patch(D, "attend", lambda q, k, v, *a, **kw: q))
    run("no_rope",
        lambda: patch(D, "apply_rotary",
                      lambda x, c, s, premul=None, layout="interleaved": x))
    if jax.default_backend() == "tpu":
        # int8-QK lost at the DECODE shape (per-forward K-requant streams,
        # PERF.md negative result #2) but a prefill quantizes K once and
        # its kernel is MXU-bound — the calculus may flip here
        run("pallas_qk8_attn", attn_impl="pallas_qk8")

    # dispatch RTT: chained double call (second call's dispatch overlaps the
    # first's execution; delta vs 2x single ~= one RTT)
    fn = make_fn()
    t0 = time.perf_counter()
    o1 = fn(params, cache, replay)
    o2 = fn(params, cache, replay)
    _ = float(jnp.sum(o2.k[0, 0, :4, 0, :2].astype(jnp.float32)))
    chained2 = time.perf_counter() - t0
    emit({"variant": "rtt_estimate",
          "ms": round((2 * base - chained2) * 1e3, 1)})


if __name__ == "__main__":
    main()
