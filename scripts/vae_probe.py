"""Streaming-VAE decode A/B probe on the real chip.

Measures ms/latent-frame of the full streaming decode (vae_decode_scan,
real 480x832 geometry, random bf16 weights) under kernel-dispatch
variants, with chained in-jit timing (the tunnel makes per-call timing
unreliable):

  fused=1                the default (Pallas fused convs incl. (3,1,1)
                         time convs)
  fused=1,timeconv=0     fused (3,3,3) res-block convs only
  fused=0                pure XLA concat path

Prints one JSON line per variant.
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


def main():
    frames = int(os.environ.get("VAE_PROBE_FRAMES", "8"))
    from longlive_tpu.models import vae as V

    vcfg = V.VAEConfig()
    vp = V.init_vae_params(jax.random.PRNGKey(0), vcfg, jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, frames, 16, 60, 104),
                          jnp.bfloat16)

    base = {"LONGLIVE_VAE_FUSED": "1", "LONGLIVE_VAE_FUSED_TIMECONV": "1",
            "LONGLIVE_VAE_FUSED_96": "0", "LONGLIVE_VAE_VMEM_BUDGET": "20e6",
            "LONGLIVE_VAE_INT8": "0", "LONGLIVE_VAE_PAIR": "0",
            "LONGLIVE_VAE_PAIR_TH": ""}
    variants = [
        ("fused", {}),
        ("fused_bigtiles", {"LONGLIVE_VAE_VMEM_BUDGET": "45e6"}),
        ("fused_bigtiles_96", {"LONGLIVE_VAE_VMEM_BUDGET": "45e6",
                               "LONGLIVE_VAE_FUSED_96": "1"}),
        ("fused_96", {"LONGLIVE_VAE_FUSED_96": "1"}),
        # mid budgets: 22e6 flips ONLY the 96ch stage th 2->4 (halving its
        # halo redundancy); 45e6 ("bigtiles", th=8 everywhere) lost — the
        # in-between point was never measured (r4)
        ("fused_96_22", {"LONGLIVE_VAE_FUSED_96": "1",
                         "LONGLIVE_VAE_VMEM_BUDGET": "22e6"}),
        ("fused_96_25", {"LONGLIVE_VAE_FUSED_96": "1",
                         "LONGLIVE_VAE_VMEM_BUDGET": "25e6"}),
        ("fused_no_timeconv", {"LONGLIVE_VAE_FUSED_TIMECONV": "0"}),
        # res_block pair fusion (ops/vae_conv.fused_res_block): both convs
        # of each no-shortcut res block in one kernel, the intermediate
        # activation resident in VMEM (VERDICT r4 item 6).  _TH forces the
        # row tile (stages whose H it doesn't divide fall back per-block).
        ("fused_96_pair", {"LONGLIVE_VAE_FUSED_96": "1",
                           "LONGLIVE_VAE_PAIR": "1"}),
        ("fused_96_pair_th4", {"LONGLIVE_VAE_FUSED_96": "1",
                               "LONGLIVE_VAE_PAIR": "1",
                               "LONGLIVE_VAE_PAIR_TH": "4"}),
        ("fused_96_pair_th6", {"LONGLIVE_VAE_FUSED_96": "1",
                               "LONGLIVE_VAE_PAIR": "1",
                               "LONGLIVE_VAE_PAIR_TH": "6"}),
        ("fused_96_pair_th8", {"LONGLIVE_VAE_FUSED_96": "1",
                               "LONGLIVE_VAE_PAIR": "1",
                               "LONGLIVE_VAE_PAIR_TH": "8"}),
        ("xla", {"LONGLIVE_VAE_FUSED": "0"}),
        # int8 MXU pipe inside the fused kernel (quantization-bounded;
        # quality row in scripts/quality_delta.py)
        ("fused_96_int8", {"LONGLIVE_VAE_FUSED_96": "1",
                           "LONGLIVE_VAE_INT8": "1"}),
    ]
    variants = [(n, {**base, **env}) for n, env in variants]
    only = os.environ.get("VAE_PROBE_ONLY")
    if only:
        variants = [(n, e) for n, e in variants if n in only.split(",")]
    for name, env in variants:
        os.environ.update(env)
        fn = jax.jit(lambda p, zz: V.vae_decode_scan(p, vcfg, zz, None, True))
        px, _ = fn(vp, z)  # compile
        _ = float(jnp.sum(px[:, -1, :, ::64, ::64]))
        t0 = time.perf_counter()
        px, _ = fn(vp, z)
        _ = float(jnp.sum(px[:, -1, :, ::64, ::64]))
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(2):
            px, _ = fn(vp, z)
        _ = float(jnp.sum(px[:, -1, :, ::64, ::64]))
        dt2 = (time.perf_counter() - t0) / 2
        print(json.dumps({
            "variant": name,
            "ms_per_latent_frame": round(min(dt1, dt2) / frames * 1e3, 1),
            "frames": frames,
        }), flush=True)


if __name__ == "__main__":
    main()
