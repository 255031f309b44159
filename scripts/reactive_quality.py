"""Quality disclosure for the reduced-window REACTIVE switch
(PipelineConfig.reactive_recache_frames): at a mid-run prompt switch,
compare the reference-exact full-window replay against reduced replays.

Post-switch latents necessarily diverge numerically (AR feedback — any
context perturbation compounds into different-but-valid content), so the
decision metrics are the VBench-style proxies (temporal flicker, motion
smoothness) computed on each variant's own decoded pixels, plus the
pre-switch prefix check (must be bitwise identical).  Random weights
caveat applies as everywhere in this environment; re-run at real weights
before changing defaults.

Usage (chip): python scripts/reactive_quality.py [--post_frames 12]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from longlive_tpu.utils import compile_cache

compile_cache.enable()

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pre_frames", type=int, default=12)
    ap.add_argument("--post_frames", type=int, default=12)
    ap.add_argument("--window", default="9,3")
    ap.add_argument("--replays", default="full,6,3")
    ap.add_argument("--skip_vae", action="store_true")
    args = ap.parse_args()

    from longlive_tpu.config import (LatentGeometry, PipelineConfig,
                                     tiny_dit_config, tiny_geometry)
    from longlive_tpu.eval import metrics as EM
    from longlive_tpu.models import dit as D
    from longlive_tpu.models import vae as V
    from longlive_tpu.pipeline import CausalInferencePipeline

    tiny = os.environ.get("LONGLIVE_QD_TINY") == "1"
    local, sink = (int(s) for s in args.window.split(","))
    if tiny:
        cfg = tiny_dit_config()
        geom = tiny_geometry()
        local, sink = cfg.local_attn_size, cfg.sink_size
    else:
        from longlive_tpu.config import DiTConfig

        cfg = DiTConfig(local_attn_size=local, sink_size=sink)
        geom = LatentGeometry()
    fpb = cfg.num_frame_per_block
    pre, post = args.pre_frames, args.post_frames
    pc = PipelineConfig(local_attn_size=local, sink_size=sink,
                        num_frame_per_block=fpb, global_sink=False,
                        num_output_frames=pre + post)
    # zero_head=False: the reference zero-inits the head, which makes every
    # output a context-independent transform of the noise — useless for a
    # context-perturbation delta (same trap quality_delta.py documents)
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16,
                               zero_head=False)
    pipe = CausalInferencePipeline(pc, params, geometry=geom, dit_config=cfg,
                                   attn_impl="xla" if tiny else "auto")
    pa = pipe.prepare_condition(jax.random.normal(
        jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim), jnp.bfloat16))
    pb = pipe.prepare_condition(jax.random.normal(
        jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim), jnp.bfloat16))
    noise = jax.random.normal(
        jax.random.PRNGKey(3),
        (1, pre + post, geom.channels, geom.height, geom.width), jnp.float32)

    lat_pre, cache0, rng0 = pipe.generate_latents_scanned(
        noise[:, :pre], pa, rng=jax.random.PRNGKey(4))
    lat_pre = np.asarray(lat_pre.astype(jnp.float32))

    # phase 1: all latent rows (generation-resident HBM only — decoding
    # inside this loop OOMed a 16 GB chip at the second variant's recache)
    rows = []
    lat_by_spec = {}
    ref_post = None
    for spec in args.replays.split(","):
        frames = None if spec == "full" else int(spec)
        cache = pipe.reactive_switch(jax.tree.map(jnp.copy, cache0),
                                     jnp.asarray(lat_pre), pb, pre,
                                     frames=frames)
        lat_post, _, _ = pipe.generate_latents_scanned(
            noise[:, pre:], pb, rng=rng0, cache=cache, start_frame=pre)
        del cache
        lat_post = np.asarray(lat_post.astype(jnp.float32))
        lat_by_spec[spec] = lat_post
        row = {"replay": spec, "pre_frames": pre, "post_frames": post,
               "window": f"{local},{sink}"}
        if ref_post is None:
            ref_post = lat_post
        else:
            d = lat_post - ref_post
            row["post_latent_rel_rms_vs_full"] = [
                round(float(np.sqrt((d[:, f] ** 2).mean())
                            / (np.sqrt((ref_post[:, f] ** 2).mean()) + 1e-12)), 4)
                for f in range(post)]
        rows.append(row)

    # phase 2: decode + proxies, VAE loaded only now
    if not args.skip_vae:
        del cache0
        vcfg = V.tiny_vae_config() if tiny else V.VAEConfig()
        vae_params = V.init_vae_params(jax.random.PRNGKey(5), vcfg,
                                       jnp.bfloat16)
        dec = jax.jit(lambda vp, z: V.vae_decode_scan(vp, vcfg, z, None, True))
        for row in rows:
            lat_post = lat_by_spec[row["replay"]]
            px, _ = dec(vae_params,
                        jnp.asarray(lat_post[:, :, : vcfg.z_dim], jnp.bfloat16))
            v01 = np.clip(np.asarray(px.astype(jnp.float32))[0].transpose(
                0, 2, 3, 1) * 0.5 + 0.5, 0, 1)
            row["temporal_flicker"] = float(EM.temporal_flicker(v01))
            row["motion_smoothness"] = float(EM.motion_smoothness(v01))
    for row in rows:
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
