"""DiT cached-forward component breakdown on the real chip.

Ablation timing: re-jit the forward with individual components replaced by
passthroughs (monkeypatched in the dit module namespace) and report the
delta vs the full forward.  Numerics of ablated variants are garbage by
construction — only the timing matters.  The deltas approximate each
component's cost INCLUDING its fusion interactions, which per-op xprof
sums miss.

Serving-default shape: 9/3 window, int8 DiT linears, 3-frame block at
480x832 (Sq=4680).  Usage: python scripts/dit_breakdown.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from longlive_tpu.config import CacheConfig, DiTConfig, LatentGeometry
from longlive_tpu.models import dit as D
from longlive_tpu.models import nn as NN
from longlive_tpu.ops import kv_cache as kvc
from longlive_tpu.ops.quant import quantize_dit_params
from longlive_tpu.ops.rope import make_rope_tables


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    local, sink = (int(s) for s in os.environ.get("BD_WINDOW", "9,3").split(","))
    use_int8 = os.environ.get("BD_INT8", "1") == "1"
    cfg = DiTConfig(local_attn_size=local, sink_size=sink)
    geom = LatentGeometry()
    cache_cfg = CacheConfig.from_model(cfg, geom, 120)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)

    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    if use_int8:
        params = quantize_dit_params(params)
    cross = D.prepare_cross_kv(params, cfg,
                               jnp.zeros((1, 512, 4096), jnp.bfloat16))
    cache = kvc.init_cache(cache_cfg, cfg.num_layers, 1, cfg.num_heads,
                           cfg.head_dim, jnp.bfloat16)
    for s in range(0, local + sink, 3):  # steady-state fill
        cache = kvc.advance(cache_cfg, cache, s, 3)
    x = jax.random.normal(jax.random.PRNGKey(3),
                          (1, 3, geom.channels, geom.height, geom.width),
                          jnp.float32)
    t = jnp.full((1, 3), 937.5, jnp.float32)
    start = jnp.asarray(local + sink, jnp.int32)

    def make_fwd(write=True, contig=True):
        # contig=True mirrors the serving pipeline default (sink and ring are
        # both block multiples at 9/3 and 12/3 — CausalInferencePipeline._contig)
        kw = {"contig_writes": contig} if write else {"write_frames": ()}
        return jax.jit(lambda p, xx, cc: D.dit_forward_cached(
            p, cfg, cache_cfg, tables, xx, t, cross, cc, start, **kw)[0])

    saved = {}

    def patch(mod, name, val):
        saved[(mod, name)] = getattr(mod, name)
        setattr(mod, name, val)

    def unpatch():
        for (mod, name), val in saved.items():
            setattr(mod, name, val)
        saved.clear()

    base = timeit(make_fwd(), params, x, cache, n=8)
    rows = [{"variant": "full", "ms": round(base * 1e3, 2)}]

    variants = []

    def v_no_layernorm():
        patch(NN, "layer_norm",
              lambda x, eps=1e-6, scale=None, bias=None: x)

    def v_no_rmsnorm():
        patch(NN, "rms_norm", lambda x, w, eps=1e-6: x)

    def v_no_rope():
        patch(D, "apply_rotary",
              lambda x, c, s, premul=None, layout="interleaved": x)

    def v_no_attn():
        patch(D, "attend", lambda q, k, v, *a, **kw: q)

    def v_cross_flash():
        # the (reverted) flash-kernel route for cross-attention; the shipped
        # default is the XLA einsum (measured faster at Skv=512)
        real = D._cross_attention_layer
        patch(D, "_cross_attention_layer",
              lambda lp, cf, x, ck, cv, impl="xla": real(lp, cf, x, ck, cv,
                                                         "pallas"))

    variants = [
        ("no_layernorm", v_no_layernorm, True, True),
        ("no_rmsnorm", v_no_rmsnorm, True, True),
        ("no_rope", v_no_rope, True, True),
        ("no_kv_writes", None, False, True),
        ("per_frame_writes", None, True, False),
        ("no_self_attn", v_no_attn, True, True),
        ("cross_attn_flash", v_cross_flash, True, True),
    ]

    for name, setup, write, contig in variants:
        if setup:
            setup()
        try:
            dt = timeit(make_fwd(write=write, contig=contig), params, x,
                        cache, n=8)
        finally:
            unpatch()
        rows.append({"variant": name, "ms": round(dt * 1e3, 2),
                     "delta_ms": round((base - dt) * 1e3, 2)})

    # rope-layout A/B: same weights, other channel basis (outputs identical;
    # only the rotation's data movement differs — halfsplit removes the
    # stride-2 pair gather)
    import dataclasses

    other = ("interleaved" if cfg.rope_layout == "halfsplit" else "halfsplit")
    cfg2 = dataclasses.replace(cfg, rope_layout=other)
    params2 = D.init_dit_params(jax.random.PRNGKey(0), cfg2, jnp.bfloat16)
    if use_int8:
        params2 = quantize_dit_params(params2)
    fwd2 = jax.jit(lambda p, xx, cc: D.dit_forward_cached(
        p, cfg2, cache_cfg, tables, xx, t, cross, cc, start)[0])
    dt = timeit(fwd2, params2, x, cache, n=8)
    rows.append({"variant": f"rope_layout={other}", "ms": round(dt * 1e3, 2),
                 "delta_ms": round((base - dt) * 1e3, 2)})

    for r in rows:
        print(json.dumps({**r, "window": f"{local},{sink}",
                          "rope_layout": cfg.rope_layout,
                          "int8": use_int8}), flush=True)


if __name__ == "__main__":
    main()
