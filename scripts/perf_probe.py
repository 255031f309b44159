"""Full-scale (Wan-1.3B geometry, random bf16 weights) per-block latency probe
on the real TPU chip.  Usage: python scripts/perf_probe.py [num_blocks]"""

import sys
import time

import jax
import jax.numpy as jnp

from longlive_tpu.config import DiTConfig, LatentGeometry, PipelineConfig
from longlive_tpu.models import dit as D
from longlive_tpu.pipeline import CausalInferencePipeline


def main():
    num_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print("devices:", jax.devices())
    cfg = DiTConfig()
    geom = LatentGeometry()
    pc = PipelineConfig(num_output_frames=num_blocks * 3)

    t0 = time.perf_counter()
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    params = jax.device_put(params)
    jax.block_until_ready(params)
    print(f"params init: {time.perf_counter() - t0:.1f}s")
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"param count: {n_params/1e9:.3f}B")

    pipe = CausalInferencePipeline(pc, params, geometry=geom, dit_config=cfg)
    prompt = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    t0 = time.perf_counter()
    cross = pipe.prepare_condition(prompt)
    jax.block_until_ready(cross)
    print(f"cross-kv prep (incl compile): {time.perf_counter() - t0:.1f}s")

    noise = jax.random.normal(
        jax.random.PRNGKey(2), (1, num_blocks * 3, geom.channels, geom.height, geom.width),
        jnp.float32,
    )
    t0 = time.perf_counter()
    lat = pipe.generate_latents(noise, cross, profile=True)
    jax.block_until_ready(lat)
    print(f"total gen (incl compile): {time.perf_counter() - t0:.1f}s")
    print("latents:", lat.shape, lat.dtype, "finite:", bool(jnp.isfinite(lat).all()))


if __name__ == "__main__":
    main()
