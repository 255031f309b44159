"""Vanilla Wan2.1 bidirectional sampler CLI — text-to-video and
image-to-video with the 50-step UniPC / DPM++ solvers.

The TPU-native stand-in for the original Wan `generate.py` driving
``WanT2V.generate`` / ``WanI2V.generate`` (reference wan/text2video.py:110,
wan/image2video.py:129 — vendored in LongLive but without a CLI there).

Usage:
  python -m longlive_tpu.run_t2v --prompt "..." [--image img.png]
      [--model_name Wan2.1-T2V-1.3B] [--size 832x480] [--frame_num 81]
      [--steps 50] [--solver unipc|dpm++] [--guide_scale 5.0] [--shift 5.0]
      [--negative_prompt "..."] [--seed 0] [--output out.mp4]
"""

from __future__ import annotations

import argparse
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .config import DiTConfig, PipelineConfig
from .models import clip as C
from .models import vae as V
from .pipeline.image2video import (Image2VideoPipeline,
                                   encode_first_frame_condition)
from .pipeline.text2video import DEFAULT_NEGATIVE_PROMPT, Text2VideoPipeline
from .utils import compile_cache

compile_cache.enable()
from .utils import loading
from .utils.video_io import to_video_array, write_video


def _read_image(path: str) -> np.ndarray:
    """[H, W, 3] uint8 -> [1, 3, H, W] f32 in [-1, 1]."""
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    img = img[..., :3].astype(np.float32) / 255.0
    return (img * 2.0 - 1.0).transpose(2, 0, 1)[None]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--image", default=None, help="first frame (switches to i2v)")
    ap.add_argument("--model_name", default="Wan2.1-T2V-1.3B")
    ap.add_argument("--size", default="832x480", help="WxH pixels")
    ap.add_argument("--frame_num", type=int, default=81, help="4n+1 pixel frames")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--solver", default="unipc", choices=["unipc", "dpm++"])
    ap.add_argument("--guide_scale", type=float, default=5.0)
    ap.add_argument("--shift", type=float, default=5.0)
    ap.add_argument("--negative_prompt", default="")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--output", default="videos/t2v.mp4")
    ap.add_argument("--sp", type=int, default=1,
                    help="Ulysses sequence-parallel degree (t2v only; the "
                         "reference wires xDiT SP into exactly this path, "
                         "wan/text2video.py:87-97)")
    ap.add_argument("--offload_blocks", action="store_true",
                    help="stream DiT block weights from host per layer "
                         "(the reference's offload_model=True / "
                         "DynamicSwapInstaller low-HBM path — fits the 14B "
                         "model on one 16 GB chip; t2v only)")
    ap.add_argument("--tiny_debug", action="store_true",
                    help="tiny random-weight model (CI / smoke runs)")
    args = ap.parse_args()

    w, h = (int(x) for x in args.size.split("x"))
    i2v = args.image is not None

    config = PipelineConfig(model_name=args.model_name, seed=args.seed)
    if args.tiny_debug:
        vcfg = V.tiny_vae_config()
        vae_params = V.init_vae_params(jax.random.PRNGKey(0), vcfg)
    else:
        vae_params, vcfg = loading.load_vae_params(config)
    stride_t = 2 ** sum(vcfg.temperal_downsample)
    spatial = 2 ** (len(vcfg.dim_mult) - 1)
    assert (args.frame_num - 1) % stride_t == 0, \
        f"frame_num must be {stride_t}*n+1"
    lat_h, lat_w = h // spatial, w // spatial
    f_lat = (args.frame_num - 1) // stride_t + 1

    if args.tiny_debug:
        from .config import tiny_dit_config

        base = tiny_dit_config()
        import dataclasses as _dc

        cfg = _dc.replace(base, local_attn_size=-1, sink_size=0,
                          in_dim=vcfg.z_dim, out_dim=vcfg.z_dim)
        if i2v:
            cfg = _dc.replace(cfg, model_type="i2v",
                              in_dim=2 * vcfg.z_dim + stride_t,
                              clip_dim=C.tiny_clip_vision_config().dim)
        from .models import dit as D

        params = D.init_dit_params(jax.random.PRNGKey(args.seed), cfg,
                                   jnp.float32, zero_head=False)
        text_encoder = None
    else:
        cfg = DiTConfig(local_attn_size=-1, sink_size=0)
        if i2v:
            cfg = DiTConfig(local_attn_size=-1, sink_size=0, model_type="i2v",
                            in_dim=16 + stride_t + vcfg.z_dim)
        # offload_blocks: build the tree in host RAM — a 14B model must
        # never be materialized in HBM just to be offloaded again
        params = loading.load_base_dit(
            os.path.join("wan_models", args.model_name), cfg,
            on_host=args.offload_blocks and not i2v)
        text_encoder = loading.load_text_encoder(config)

    neg = args.negative_prompt or DEFAULT_NEGATIVE_PROMPT
    if text_encoder is not None:
        cond = text_encoder([args.prompt])["prompt_embeds"]
        null = text_encoder([neg])["prompt_embeds"]
    else:  # random-weight smoke mode (no downloaded assets)
        cond = jax.random.normal(jax.random.PRNGKey(1),
                                 (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
        null = jnp.zeros_like(cond)

    rng = jax.random.PRNGKey(args.seed)
    shape = (1, f_lat, vcfg.z_dim, lat_h, lat_w)
    if i2v:
        if args.tiny_debug:
            ccfg = C.tiny_clip_vision_config()
            clip_params = C.init_clip_vision_params(jax.random.PRNGKey(2), ccfg)
        else:
            clip_params, ccfg = loading.load_clip_vision(config)
        img = jnp.asarray(_read_image(args.image))
        if img.shape[-2:] != (h, w):
            img = jax.image.resize(img, (1, 3, h, w), method="bicubic")
        clip_fea = C.encode_image(clip_params, ccfg, img)
        y = encode_first_frame_condition(
            vae_params, vcfg, img.astype(jnp.bfloat16), args.frame_num)
        pipe = Image2VideoPipeline(params, cfg)
        latents = pipe.generate_latents(
            cond, null, clip_fea, y, rng=rng, latent_shape=shape,
            sampling_steps=args.steps, shift=args.shift,
            guide_scale=args.guide_scale, solver=args.solver)
    else:
        mesh = None
        if args.sp > 1:
            from .parallel import mesh as M

            assert len(jax.devices()) >= args.sp, "not enough devices for --sp"
            mesh = M.make_mesh(dp=1, fsdp=1, sp=args.sp,
                               devices=jax.devices()[: args.sp])
        pipe = Text2VideoPipeline(params, cfg, mesh=mesh,
                                  offload_blocks=args.offload_blocks)
        # the pipeline owns the (possibly host-resident) tree now; keeping
        # this reference alive would pin a full device copy next to it
        del params
        latents = pipe.generate_latents(
            cond, null, rng=rng, latent_shape=shape,
            sampling_steps=args.steps, shift=args.shift,
            guide_scale=args.guide_scale, solver=args.solver)

    pixels = V.vae_decode(vae_params, vcfg, latents.astype(jnp.bfloat16))
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    write_video(args.output, to_video_array(pixels), fps=16)
    print(f"wrote {args.output} ({args.frame_num} frames @ {w}x{h}, "
          f"{'i2v' if i2v else 't2v'}, {args.solver} {args.steps} steps)")


if __name__ == "__main__":
    main()
