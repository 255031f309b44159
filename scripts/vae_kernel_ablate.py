"""Attribute the fused VAE-conv kernel's step time on chip.

Times ONE full-res 96-channel res-block conv (the res96 stage shape that
is 91.5 ms of the 206 ms decode) under LONGLIVE_VAE_ABLATE variants that
each remove one kernel component (timing-only; outputs are wrong):

  full     — production kernel
  no_dma   — skip the HBM->VMEM stage loads (and nx emit)
  no_pack  — skip the 9 VMEM shift-copies building the K-packed operand
  no_norm  — skip the norm+silu prologue VPU pass
  no_gemm  — skip the MXU contraction
  no_roll  — skip the dx sublane rolls + adds

The deltas tell whether the ~40%-of-padded-roofline gap is DMA
serialization (fix: batched-t loads / double buffering), pack-copy
bandwidth (fix: tau-only packing with dy as output rolls), or MXU-bound
(stop optimizing).  Differential chained timing (the tunnel's
block_until_ready is unreliable; see PERF.md measurement notes).

Usage: python scripts/vae_kernel_ablate.py [reps]
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
import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from longlive_tpu.ops import vae_conv as VC

    # the res96 full-res res-block conv: 4 pixel frames per latent frame,
    # 480x832, 96 -> 96, norm+silu prologue, residual epilogue
    rng = np.random.RandomState(0)
    T, H, W, C, O = 4, 480, 832, 96, 96
    x = jnp.asarray(rng.randn(T, H, W, C), jnp.bfloat16)
    cache = jnp.asarray(rng.randn(2, H, W, C) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.randn(O, C, 3, 3, 3) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.randn(O) * 0.1, jnp.bfloat16)
    gamma = jnp.asarray(rng.rand(C) + 0.5, jnp.bfloat16)
    res = jnp.asarray(rng.randn(T, H, W, 128) * 0.1, jnp.bfloat16)

    macs = T * H * W * 27 * C * O

    def make_chain(n):
        # n chained kernel calls inside ONE jit (each link consumes the
        # previous output, so none can be elided); differential hi-lo
        # timing removes dispatch/fetch overhead.  The operands MUST be
        # jit arguments and the chain a lax.scan: closure-captured
        # [T,H,W,C] constants get embedded in the StableHLO (~1.1 GB of
        # text for this shape), which the axon tunnel's remote compiler
        # rejects with HTTP 413.
        import jax.lax as lax

        def f(x0, cache, w, b, gamma, res):
            def body(xx, _):
                out, _ = VC.fused_causal_conv(xx, cache, w, b, gamma, res)
                return out[..., :C].astype(jnp.bfloat16), ()
            xx, _ = lax.scan(body, x0, None, length=n)
            return jnp.sum(xx[-1, ::64, ::64, 0])
        return jax.jit(f)

    lo = max(1, reps // 10)
    for ablate in ("full", "no_dma", "no_pack", "no_norm", "no_gemm",
                   "no_roll"):
        os.environ["LONGLIVE_VAE_ABLATE"] = "" if ablate == "full" else ablate
        f_hi, f_lo = make_chain(reps), make_chain(lo)
        args = (cache, w, b, gamma, res)
        float(f_hi(x, *args)); float(f_lo(x, *args))  # compile both
        t0 = time.perf_counter(); float(f_hi(x, *args)); t_hi = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f_lo(x, *args)); t_lo = time.perf_counter() - t0
        dt = (t_hi - t_lo) / (reps - lo)
        print(json.dumps({
            "ablate": ablate, "ms": round(dt * 1e3, 3),
            "tf_per_s": round(2 * macs / dt / 1e12, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
