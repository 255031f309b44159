"""Standalone attention-kernel sweep on the real chip.

Times the flash-attention variants at the decode shape in isolation
(chained differential timing inside one jit where possible), so kernel
effects are separable from e2e noise:

  stages (each guarded by its own subprocess-level timeout when run via
  --stage, so a wedged Mosaic compile/execute can't take down the rest):
    bf16        single-segment bf16 (the production kernel)
    qk8         int8-QK with per-token scales
    twoseg      two-segment bf16 (cache ++ block operands)
    twoseg_qk8  two-segment int8-QK

Run all:   python scripts/attn_kernel_sweep.py
Run one:   python scripts/attn_kernel_sweep.py --stage twoseg --small
(--small uses a 4x-reduced shape to smoke compile/execute first.)
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from longlive_tpu.ops import attention as A

    b, n, d = 1, 12, 128
    if args.small:
        sq, skv1, skv2 = 1560, 3120, 1560
    else:
        sq, skv1, skv2 = 4680, 14040, 4680  # 9/3-window decode shape
    q = jax.random.normal(jax.random.PRNGKey(0), (b, sq, n, d), jnp.bfloat16)
    k1 = jax.random.normal(jax.random.PRNGKey(1), (b, skv1, n, d), jnp.bfloat16)
    v1 = jax.random.normal(jax.random.PRNGKey(2), (b, skv1, n, d), jnp.bfloat16)
    k2 = jax.random.normal(jax.random.PRNGKey(3), (b, skv2, n, d), jnp.bfloat16)
    v2 = jax.random.normal(jax.random.PRNGKey(4), (b, skv2, n, d), jnp.bfloat16)
    kc = jnp.concatenate([k1, k2], axis=1)
    vc = jnp.concatenate([v1, v2], axis=1)
    bias = jnp.zeros((b, skv1), jnp.float32)

    fs = 1560

    def fn_for(stage):
        if stage == "bf16":
            return lambda: A.flash_attention(q, kc, vc, frame_seq=fs)
        if stage.startswith("serving"):
            # the TRUE write-then-attend serving shape at 9/3: the block's 3
            # frames are written INTO the 9-frame ring, so Skv = 14040 (the
            # 18720-token stages above model the two-segment layout)
            bkv = (int(stage.rsplit("_", 1)[-1])
                   if stage[-1].isdigit() else 1024)
            return lambda: A.flash_attention(q, k1, v1, frame_seq=fs,
                                             block_kv=bkv)
        if stage == "qk8":
            return lambda: A.flash_attention(q, kc, vc, frame_seq=fs,
                                             qk_int8=True)
        if stage == "twoseg":
            return lambda: A.flash_attention(q, k1, v1, bias, frame_seq=fs,
                                             k2=k2, v2=v2)
        if stage == "twoseg_qk8":
            return lambda: A.flash_attention(q, k1, v1, bias, frame_seq=fs,
                                             qk_int8=True, k2=k2, v2=v2)
        if stage.startswith("twoseg_skip"):
            # REAL decode layout: the cache operand is the FULL ring buffer
            # (skv1 + skv2 tokens) with the block's own skv2-token slot range
            # dead (bias-masked AND kernel-elided); the fresh block rides as
            # the second segment.  Compare against `bf16` (the
            # write-then-attend attend cost) + the measured ~22 ms/forward
            # of cache writes it additionally pays.
            bkv = int(stage.rsplit("_", 1)[-1]) if stage[-1].isdigit() else 1024
            # the real decode's dead ranges are the block's own ring slots,
            # whose offsets are multiples of frame_seq — keep the synthetic
            # layout frame-aligned too (kv_cache.block_write_offsets)
            dead_lo = ((skv1 + skv2) // 2) // fs * fs
            ranges = jnp.asarray([[dead_lo, dead_lo + skv2]], jnp.int32)
            biasf = jnp.zeros((b, skv1 + skv2), jnp.float32)
            biasf = biasf.at[:, dead_lo:dead_lo + skv2].set(-1e30)
            return lambda: A.flash_attention(
                q, kc, vc, biasf, frame_seq=fs, block_kv=bkv,
                k2=k2, v2=v2, skip_ranges=ranges)
        if stage.startswith("bq"):
            # explicit q/kv tile pair, e.g. "bq4680_512": whole-query-resident
            # q tile (scratch m/l/acc ~9.6 MB f32 at bq=4680 — fits VMEM)
            bq_s, bkv_s = stage[2:].split("_")
            return lambda: A.flash_attention(q, kc, vc, frame_seq=fs,
                                             block_q=int(bq_s),
                                             block_kv=int(bkv_s))
        if stage.startswith("bf16_"):
            # single-segment baseline at a non-default kv tile
            bkv = int(stage.rsplit("_", 1)[-1])
            return lambda: A.flash_attention(q, kc, vc, frame_seq=fs,
                                             block_kv=bkv)
        raise ValueError(stage)

    def measure(stage):
        f = fn_for(stage)
        t0 = time.perf_counter()
        o = f()
        _ = float(jnp.sum(o[:, ::512, 0, 0]))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _i in range(args.reps):
            o = f()
        _ = float(jnp.sum(o[:, ::512, 0, 0]))
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(json.dumps({"stage": stage, "ms": round(ms, 3),
                          "compile_s": round(compile_s, 1),
                          "small": args.small}), flush=True)

    def check_trainable():
        """Value + gradient parity of flash_attention_trainable (upstream
        VJP kernel) vs XLA dense at a reduced shape."""
        bs, sq_s, skv_s = 1, 640, 1664
        qs = jax.random.normal(jax.random.PRNGKey(10), (bs, sq_s, n, d),
                               jnp.float32)
        ks = jax.random.normal(jax.random.PRNGKey(11), (bs, skv_s, n, d),
                               jnp.float32)
        vs = jax.random.normal(jax.random.PRNGKey(12), (bs, skv_s, n, d),
                               jnp.float32)
        valid = jnp.arange(skv_s) < (skv_s - 200)

        def loss(fn, qq):
            return jnp.sum(fn(qq) ** 2)

        f_tr = lambda qq: A.attend(qq, ks, vs, valid, impl="pallas_train")
        f_ref = lambda qq: A.attend(qq, ks, vs, valid, impl="xla")
        o_tr, o_ref = f_tr(qs), f_ref(qs)
        import numpy as np
        verr = float(jnp.abs(o_tr - o_ref).max())
        g_tr = jax.grad(lambda qq: loss(f_tr, qq))(qs)
        g_ref = jax.grad(lambda qq: loss(f_ref, qq))(qs)
        gerr = float(jnp.abs(g_tr - g_ref).max() /
                     (jnp.abs(g_ref).max() + 1e-9))
        print(json.dumps({"stage": "trainable_parity",
                          "value_max_abs_err": round(verr, 6),
                          "grad_rel_err": round(gerr, 6)}), flush=True)

    def measure_trainable():
        f = lambda: A.attend(q.astype(jnp.float32), kc.astype(jnp.float32),
                             vc.astype(jnp.float32), None,
                             impl="pallas_train")
        t0 = time.perf_counter()
        o = f(); _ = float(jnp.sum(o[:, ::512, 0, 0]))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _i in range(args.reps):
            o = f()
        _ = float(jnp.sum(o[:, ::512, 0, 0]))
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(json.dumps({"stage": "trainable_fwd", "ms": round(ms, 3),
                          "compile_s": round(compile_s, 1)}), flush=True)

    stages = ([args.stage] if args.stage != "all"
              else ["bf16", "qk8", "twoseg", "twoseg_qk8"])
    for s in stages:
        if s == "trainable":
            check_trainable()
            measure_trainable()
        else:
            measure(s)


if __name__ == "__main__":
    main()
