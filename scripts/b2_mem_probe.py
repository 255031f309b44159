"""Compile-only HBM accounting for B=2 e2e serving (no execution).

The B=2 full-VAE e2e rows keep failing on the 16 GB v5e (r3a: runtime
ResourceExhausted with kernel_cache; r3b: compile-time OOM from the
kv_only [:-1] slices — fixed; r3d: ABORTED std / runtime OOM kl).  This
lowers + compiles the same programs bench.py would run and prints each
program's XLA memory analysis plus the resident-buffer ledger, so the
gap is attributed instead of guessed.

Run on the chip:  python scripts/b2_mem_probe.py [--batch 2] [--kl]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["LONGLIVE_AOT"] = "0"  # plain jit: .lower() needed

import jax

from longlive_tpu.utils import compile_cache

compile_cache.enable()

import jax.numpy as jnp


def gb(n):
    return round(n / 2**30, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--kl", action="store_true", help="kernel_cache on")
    ap.add_argument("--kv_int8", action="store_true")
    ap.add_argument("--frames", type=int, default=18)
    ap.add_argument("--window", default="9,3")
    args = ap.parse_args()

    from longlive_tpu.config import DiTConfig, LatentGeometry, PipelineConfig
    from longlive_tpu.models import dit as D
    from longlive_tpu.models import vae as V
    from longlive_tpu.ops.quant import quantize_dit_params
    from longlive_tpu.pipeline import CausalInferencePipeline

    local, sink = (int(s) for s in args.window.split(","))
    cfg = DiTConfig(local_attn_size=local, sink_size=sink)
    geom = LatentGeometry()
    b = args.batch
    pc = PipelineConfig(num_output_frames=6 + args.frames,
                        local_attn_size=local, sink_size=sink,
                        global_sink=False, kv_int8=args.kv_int8,
                        kernel_cache=args.kl if args.kl else False,
                        fused_rope=args.kl)
    params = quantize_dit_params(
        D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    pipe = CausalInferencePipeline(pc, params, geometry=geom, dit_config=cfg)

    resident = {}
    resident["dit_params"] = sum(x.size * x.dtype.itemsize
                                 for x in jax.tree.leaves(params))
    cache = pipe.init_cache(b, jnp.bfloat16)
    resident["kv_cache"] = sum(x.size * x.dtype.itemsize
                               for x in jax.tree.leaves(cache))
    vcfg = V.VAEConfig()
    vae_params = V.init_vae_params(jax.random.PRNGKey(3), vcfg, jnp.bfloat16)
    resident["vae_params"] = sum(x.size * x.dtype.itemsize
                                 for x in jax.tree.leaves(vae_params))
    noise = jnp.zeros((b, args.frames, geom.channels, geom.height,
                       geom.width), jnp.float32)
    resident["noise+latents(f32 x2)"] = 2 * noise.size * 4
    prompt = jnp.zeros((b, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    cross = pipe.prepare_condition(prompt)
    resident["cross_kv"] = sum(x.size * x.dtype.itemsize
                               for x in jax.tree.leaves(cross))
    print(json.dumps({f"resident_{k}_gb": gb(v) for k, v in resident.items()}
                     | {"resident_total_gb": gb(sum(resident.values()))}),
          flush=True)

    def report(tag, compiled):
        m = compiled.memory_analysis()
        row = {"program": tag}
        for f in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
            v = getattr(m, f, None)
            if v is not None:
                row[f.replace("_in_bytes", "_gb")] = gb(v)
        print(json.dumps(row), flush=True)

    nb = args.frames // pipe.frame_block
    seg = pipe._segment_fn(nb)
    rng = jax.random.PRNGKey(5)
    report(f"segment[{nb} blocks, B={b}]",
           seg.lower(pipe.params, cache, cross, noise,
                     jnp.asarray(0, jnp.int32), rng).compile())

    z1 = jnp.zeros((1, args.frames, geom.channels, geom.height, geom.width),
                   jnp.bfloat16)
    dec = jax.jit(lambda p, z: V.vae_decode_scan(p, vcfg, z, None, True))
    report("vae_decode_first[B=1 per-stream]",
           dec.lower(vae_params, z1).compile())


if __name__ == "__main__":
    main()
