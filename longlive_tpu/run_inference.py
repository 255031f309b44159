"""Single-prompt generation CLI (reference inference.py).

Usage:  python -m longlive_tpu.run_inference --config_path configs/longlive_inference.yaml
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from .config import LatentGeometry, load_pipeline_config
from .models import vae as V
from .pipeline import CausalInferencePipeline
from .utils import loading
from .utils.dataset import TextDataset, shard
from .utils.video_io import to_video_array, write_video
from .utils import compile_cache

compile_cache.enable()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", required=True)
    ap.add_argument("--use_ema", action="store_true")
    ap.add_argument("--max_prompts", type=int, default=None)
    ap.add_argument("--num_output_frames", type=int, default=None)
    ap.add_argument("--sp", type=int, default=1,
                    help="sequence-parallel degree for the DiT (devices 0..sp-1)")
    ap.add_argument("--decode_device", type=int, default=None,
                    help="device index for the VAE stream; decode of segment "
                         "n overlaps generation of segment n+1 when it is "
                         "not a generation device")
    ap.add_argument("--segment_frames", type=int, default=12,
                    help="latent frames per pipelined segment")
    ap.add_argument("--per_stream_decode", action="store_true",
                    help="batched serving: decode each stream as a "
                         "separate B=1 VAE call (halves the decode "
                         "device's peak HBM; throughput unchanged)")
    args = ap.parse_args()

    config = load_pipeline_config(args.config_path)
    if args.num_output_frames:
        import dataclasses as _dc
        config = _dc.replace(config, num_output_frames=args.num_output_frames)
    cfg = config.dit_config()
    geom = LatentGeometry()

    use_ema = args.use_ema or config.use_ema  # CLI flag OR yaml key
    params = loading.load_dit_params(config, cfg, use_ema=use_ema)
    vae_params, vcfg = loading.load_vae_params(config)
    text_encoder = loading.load_text_encoder(config)

    mesh = None
    if args.sp > 1:
        from .parallel import mesh as M

        assert len(jax.devices()) >= args.sp, "not enough devices for --sp"
        mesh = M.make_mesh(dp=1, fsdp=1, sp=args.sp,
                           devices=jax.devices()[: args.sp])
    pipe = CausalInferencePipeline(config, params, geometry=geom,
                                   dit_config=cfg, mesh=mesh)
    renderer = None
    if args.decode_device is not None:
        from .pipeline import PipelinedRenderer

        renderer = PipelinedRenderer(
            pipe, vae_params, vcfg, segment_frames=args.segment_frames,
            decode_device=jax.devices()[args.decode_device],
            per_stream_decode=args.per_stream_decode)

    if config.data_path and os.path.exists(config.data_path) and text_encoder:
        rows = shard(TextDataset(config.data_path), jax.process_index(),
                     jax.process_count())
    else:
        rows = [{"prompts": "(random prompt embedding)", "idx": 0}]
    if args.max_prompts:
        rows = rows[: args.max_prompts]
    if config.inference_iter != -1:
        # reference inference.py:246 breaks AFTER processing batch i when
        # i >= inference_iter — i.e. inference_iter + 1 batches run
        rows = rows[: config.inference_iter + 1]

    # frame-by-frame scanned decode: larger chunks exceed v5e HBM at 480p
    decode = jax.jit(lambda p, z: V.vae_decode_scan(p, vcfg, z)[0])

    # encode all prompts up front, then evict the 11 GB T5 from HBM so the
    # generation loop has headroom — the reference's DynamicSwapInstaller
    # low-mem analogue (inference.py:62,135-136; utils/memory.py:13-58)
    conds = []
    for row in rows:
        if text_encoder is not None:
            conds.append(text_encoder([row["prompts"]])["prompt_embeds"])
        else:
            conds.append(jax.random.normal(
                jax.random.PRNGKey(config.seed), (1, cfg.text_len, cfg.text_dim)))
    if text_encoder is not None:
        from .utils import memory

        text_encoder.params = memory.offload_to_host(text_encoder.params)

    rng = jax.random.PRNGKey(config.seed)
    out_dir = config.output_folder or "videos/long"
    rank = jax.process_index()
    # reference filename scheme (inference.py:231-244): LoRA > EMA > regular
    model_type = ("lora" if config.lora_ckpt else
                  "ema" if use_ema else "regular")
    ns = max(1, config.num_samples)
    for row, cond in zip(rows, conds):
        # num_samples seeds per prompt share the condition
        # (inference.py:189-195: prompts = [prompt] * num_samples)
        cross = pipe.prepare_condition(jnp.repeat(cond, ns, axis=0)
                                       if ns > 1 else cond)
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(
            sub, (ns, config.num_output_frames, geom.channels, geom.height,
                  geom.width), jnp.float32)
        if renderer is not None:
            pixels = renderer.render(noise, cross, rng=sub)
        else:
            latents = pipe.generate_latents(noise, cross, rng=sub,
                                            profile=config.profile)
            # per-stream decode bounds the VAE peak to one stream's temps
            pixels = jnp.concatenate(
                [decode(vae_params, latents[i : i + 1].astype(jnp.bfloat16))
                 for i in range(ns)], axis=0)
        for seed_idx in range(ns):
            if config.save_with_index:
                name = f"rank{rank}-{row['idx']}-{seed_idx}_{model_type}.mp4"
            else:
                stem = row["prompts"][:100].replace(os.sep, "_")
                name = f"rank{rank}-{stem}-{seed_idx}.mp4"
            path = os.path.join(out_dir, name)
            write_video(path, to_video_array(pixels[seed_idx : seed_idx + 1]),
                        fps=16)
            print(f"wrote {path}")


if __name__ == "__main__":
    main()
