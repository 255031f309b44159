"""Round-4 in-model attention-knob A/B: steady-state block timing at the
production serving configuration (kernel_cache + fused_rope + int8 linears +
fast mode, 9/3 window) under the kernel env knobs:

  LONGLIVE_BQ / LONGLIVE_BKV   tile geometry
  LONGLIVE_EXP2                exp -> exp2 with folded log2(e)
  LONGLIVE_MXU_LSUM            row-sum l on the MXU

Run one variant per process (the pipeline's jitted block program bakes the
env at trace time):  LONGLIVE_EXP2=1 python scripts/r4_attn_ab.py
Prints one JSON line with ms/block.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from longlive_tpu.utils import compile_cache

compile_cache.enable()

import jax.numpy as jnp

from longlive_tpu.config import LatentGeometry, PipelineConfig
from longlive_tpu.models import dit as D
from longlive_tpu.ops.quant import quantize_dit_params
from longlive_tpu.pipeline import CausalInferencePipeline


def main():
    reps = int(os.environ.get("AB_REPS", "10"))
    local, sink = (int(s) for s in os.environ.get("AB_WINDOW", "9,3").split(","))
    pconfig = PipelineConfig(
        local_attn_size=local, sink_size=sink, num_output_frames=120,
        reuse_last_denoise_kv=os.environ.get("AB_FAST", "1") == "1",
        kernel_cache=None, fused_rope=True, global_sink=False)
    cfg = pconfig.dit_config()
    geom = LatentGeometry()
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    if os.environ.get("AB_INT8", "1") == "1":
        params = quantize_dit_params(params)
    pipe = CausalInferencePipeline(pconfig, params, geometry=geom,
                                   dit_config=cfg)
    cross = pipe.prepare_condition(jnp.zeros((1, 512, 4096), jnp.bfloat16))
    warm = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, 15, geom.channels, geom.height, geom.width), jnp.float32)
    t0 = time.perf_counter()
    lat, cache, rng = pipe.generate_latents_scanned(warm, cross)
    jax.block_until_ready(lat)
    compile_s = time.perf_counter() - t0

    nb = jax.random.normal(
        jax.random.PRNGKey(2),
        (1, 3, geom.channels, geom.height, geom.width), jnp.float32)
    start0 = 15
    x0, cache, rng = pipe._block_fn(pipe.params, cache, cross, nb,
                                    jnp.asarray(start0, jnp.int32), rng)
    jax.block_until_ready(x0)
    t0 = time.perf_counter()
    for i in range(reps):
        x0, cache, rng = pipe._block_fn(
            pipe.params, cache, cross, nb,
            jnp.asarray(start0 + (i + 1) * 3, jnp.int32), rng)
    jax.block_until_ready(x0)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(json.dumps({
        "variant": {k: os.environ.get(k) for k in
                    ("LONGLIVE_BQ", "LONGLIVE_BKV", "LONGLIVE_EXP2",
                     "LONGLIVE_MXU_LSUM") if os.environ.get(k)},
        "block_ms": round(ms, 1),
        "ms_per_forward": round(ms / (4 if pconfig.reuse_last_denoise_kv else 5), 1),
        "compile_s": round(compile_s, 1),
        "window": f"{local},{sink}",
    }))


if __name__ == "__main__":
    main()
