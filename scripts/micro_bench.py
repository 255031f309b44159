"""Microbenchmarks: flash attention kernel, single DiT pass, VAE chunk."""

import time

import jax
import jax.numpy as jnp

from longlive_tpu.config import CacheConfig, DiTConfig, LatentGeometry
from longlive_tpu.models import dit as D
from longlive_tpu.models import vae as V
from longlive_tpu.ops import kv_cache as kvc
from longlive_tpu.ops.attention import flash_attention
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
    cfg = DiTConfig()
    geom = LatentGeometry()
    cache_cfg = CacheConfig.from_model(cfg, geom, 120)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)

    # attention kernel: decode shape
    B, Sq, Skv, N, Dh = 1, 4680, 18720, 12, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, Sq, N, Dh), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, Skv, N, Dh), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, Skv, N, Dh), jnp.bfloat16)
    bias = jnp.zeros((B, Skv), jnp.float32)
    flops = 4 * Sq * Skv * Dh * N
    for bq, bkv in [(256, 1024), (512, 1024), (512, 2048), (1024, 1024), (256, 2048)]:
        fn = jax.jit(lambda q, k, v, b: flash_attention(q, k, v, b, block_q=bq, block_kv=bkv))
        dt = timeit(fn, q, k, v, bias)
        print(f"flash bq={bq} bkv={bkv}: {dt*1e3:.2f} ms  {flops/dt/1e12:.1f} TF/s")

    # single DiT cached pass (bf16 vs int8)
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    cross = D.prepare_cross_kv(params, cfg, jnp.zeros((1, 512, 4096), jnp.bfloat16))
    cache = kvc.init_cache(cache_cfg, cfg.num_layers, 1, cfg.num_heads, cfg.head_dim, jnp.bfloat16)
    cache = kvc.advance(cache_cfg, kvc.advance(cache_cfg, cache, 0, 9), 9, 3)  # pretend steady
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 16, 60, 104), jnp.float32)
    t = jnp.full((1, 3), 937.5, jnp.float32)

    fwd = jax.jit(lambda p, xx, cc: D.dit_forward_cached(
        p, cfg, cache_cfg, tables, xx, t, cross, cc, jnp.asarray(12, jnp.int32))[0])
    dt = timeit(fwd, params, x, cache, n=5)
    print(f"dit pass bf16: {dt*1e3:.1f} ms  ({28.0/dt/1e3:.0f} TF/s-equiv of 28TF)")

    qparams = quantize_dit_params(params)
    dt = timeit(fwd, qparams, x, cache, n=5)
    print(f"dit pass int8-linears: {dt*1e3:.1f} ms")

    # VAE decode chunk (1 latent frame)
    vcfg = V.VAEConfig()
    vp = V.init_vae_params(jax.random.PRNGKey(1), vcfg, jnp.bfloat16)
    caches = V.init_decoder_caches(vp, vcfg, 1, 60, 104, jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 16, 60, 104), jnp.bfloat16)
    dec = jax.jit(lambda p, zz, cc: V.vae_decode_chunk(p, vcfg, zz, cc, False))
    dt = timeit(dec, vp, z, caches, n=5)
    print(f"vae decode 1 latent frame: {dt*1e3:.1f} ms (~12.3TF -> {12.3/dt/1e3:.0f} TF/s)")


if __name__ == "__main__":
    main()
