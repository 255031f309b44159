"""Flash-kernel tile sweep at the prompt-switch recache shape.

The 9/3-window recache replays the whole window in ONE kv_only forward:
dense self-attention at Sq = Skv = 14040 (9 frames x 1560).  PERF.md
measured it at ~62% of the bf16 MXU roofline vs the decode kernel's 73%;
`_auto_block_q`'s 2048-row cap pins bq=1560 there, so larger frame-aligned
q tiles (4680 = 3 frames) were never tried at this shape.  Chained in-jit
differential timing (tunnel-safe).  Prints one JSON line per (bq, bkv).
"""

import itertools
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
    from longlive_tpu.ops import attention as A

    b, n, d, fs = 1, 12, 128, 1560
    s = 9 * fs  # 14040
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, n, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, n, d), jnp.bfloat16)
    flops = 4.0 * b * n * s * s * d  # QK^T + PV

    def time_reps(bq, bkv, reps):
        def chain(qq):
            def body(c, _):
                o = A.flash_attention(qq * (1.0 + c * 1e-6), k, v,
                                      block_q=bq, block_kv=bkv, frame_seq=fs)
                return jnp.mean(o.astype(jnp.float32)), None

            r, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=reps)
            return r

        f = jax.jit(chain, static_argnames=())
        r = float(f(q))  # compile + run
        t0 = time.perf_counter()
        r = float(f(q))
        return (time.perf_counter() - t0) / reps, r

    for bq, bkv in itertools.product((1560, 4680), (512, 1024, 2048)):
        try:
            dt_hi, _ = time_reps(bq, bkv, 12)
            dt_lo, _ = time_reps(bq, bkv, 3)
            per = (dt_hi * 12 - dt_lo * 3) / 9
            print(json.dumps({
                "bq": bq, "bkv": bkv,
                "ms": round(per * 1e3, 3),
                "tf_per_s": round(flops / per / 1e12, 1),
            }), flush=True)
        except Exception as e:  # VMEM overflow etc — report and continue
            print(json.dumps({"bq": bq, "bkv": bkv,
                              "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
