"""Streaming-VAE decode component breakdown on the real chip.

Same ablation-timing method as scripts/dit_breakdown.py: re-jit the
whole-segment streaming decode (vae_decode_scan, real 480x832 geometry)
with individual components monkeypatched to cache-preserving passthroughs
and report the delta vs the full decode.  Numerics of ablated variants
are garbage by construction — only the timing matters.  Every passthrough
pulls and pushes the SAME cache entries so the scan carry structure (and
all downstream component shapes) are unchanged.

Usage: python scripts/vae_breakdown.py       (env VAE_BD_FRAMES=8)
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

from longlive_tpu.models import vae as V


def _adapt_channels(x, o):
    c = x.shape[-1]
    if c == o:
        return x
    if c > o:
        return x[..., :o]
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, o - c)])


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.sum(out[0][:, -1, :, ::64, ::64]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out[0][:, -1, :, ::64, ::64]))
    return (time.perf_counter() - t0) / n


def main():
    frames = int(os.environ.get("VAE_BD_FRAMES", "8"))
    lh = int(os.environ.get("VAE_BD_H", "60"))  # latent dims; shrink for a
    lw = int(os.environ.get("VAE_BD_W", "104"))  # CPU smoke run
    vcfg = V.VAEConfig()
    vp = V.init_vae_params(jax.random.PRNGKey(0), vcfg, jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, frames, 16, lh, lw),
                          jnp.bfloat16)

    def make_fn():
        return jax.jit(lambda p, zz: V.vae_decode_scan(p, vcfg, zz, None, True))

    saved = {}

    def patch(name, val):
        saved[name] = getattr(V, name)
        setattr(V, name, val)

    def unpatch():
        for name, val in saved.items():
            setattr(V, name, val)
        saved.clear()

    real_res_block = V.res_block
    real_nsc = V.norm_silu_causal_conv
    real_upconv = V.upsample_conv2d_subpixel
    real_resample_up = V.resample_up

    def skip_res_block_for(out_chs):
        def rb(x, p, thread):
            o = int(p["conv1"]["w"].shape[0])
            if o not in out_chs:
                return real_res_block(x, p, thread)
            thread.push(thread.pull())  # conv1 cache
            thread.push(thread.pull())  # conv2 cache
            return _adapt_channels(x, o)
        patch("res_block", rb)

    def v_no_attn():
        patch("attention_block", lambda x, p: x)

    def v_no_head():
        def nsc(x, gamma, p, thread, residual=None):
            o = int(p["w"].shape[0])
            if o != 3:
                return real_nsc(x, gamma, p, thread, residual=residual)
            thread.push(thread.pull())
            return _adapt_channels(x, 3)
        patch("norm_silu_causal_conv", nsc)

    def v_no_upconv():
        def up(x2d, w, b=None):
            y = V.upsample2d_nearest(x2d)
            return _adapt_channels(y, int(w.shape[0]))
        patch("upsample_conv2d_subpixel", up)

    def v_no_timeconv():
        def ru(x, p, thread, temporal, first_frame):
            if not temporal or "time_conv" not in p or thread.caches is None:
                return real_resample_up(x, p, thread, temporal, first_frame)
            tc = p["time_conv"]
            ci = tc["w"].shape[1] if "w" in tc else tc["w_int8"].shape[3]
            if x.shape[-1] != ci:
                x = x[..., :ci]
            thread.push(thread.pull())
            if not first_frame:
                x = jnp.repeat(x, 2, axis=1)  # stand-in for the 2x time up
            if os.environ.get("LONGLIVE_VAE_SUBPIXEL", "1") == "1":
                return V._spatial(
                    lambda zz: V.upsample_conv2d_subpixel(
                        zz, p["conv"]["w"], p["conv"]["b"]), x)
            return V._spatial(
                lambda zz: V.conv2d(V.upsample2d_nearest(zz),
                                    p["conv"]["w"], p["conv"]["b"]), x)
        patch("resample_up", ru)

    base = timeit(make_fn(), vp, z)
    rows = [{"variant": "full",
             "ms_per_latent_frame": round(base / frames * 1e3, 1)}]

    variants = [
        ("no_res96", lambda: skip_res_block_for({96})),
        ("no_res192", lambda: skip_res_block_for({192})),
        ("no_res384", lambda: skip_res_block_for({384})),
        ("no_attn", v_no_attn),
        ("no_head", v_no_head),
        ("no_upconv", v_no_upconv),
        ("no_timeconv", v_no_timeconv),
    ]
    for name, setup in variants:
        setup()
        try:
            dt = timeit(make_fn(), vp, z)
        finally:
            unpatch()
        rows.append({
            "variant": name,
            "ms_per_latent_frame": round(dt / frames * 1e3, 1),
            "delta_ms_per_frame": round((base - dt) / frames * 1e3, 1),
        })
    for r in rows:
        print(json.dumps({**r, "frames": frames,
                          "fused": os.environ.get("LONGLIVE_VAE_FUSED", "1"),
                          "fused_96": os.environ.get("LONGLIVE_VAE_FUSED_96",
                                                     "1")}), flush=True)


if __name__ == "__main__":
    main()
