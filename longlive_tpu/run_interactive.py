"""Interactive (streaming prompt-switch) generation CLI
(reference interactive_inference.py).

Usage:  python -m longlive_tpu.run_interactive --config_path configs/longlive_interactive_inference.yaml
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from .config import LatentGeometry, load_pipeline_config
from .models import vae as V
from .pipeline import InteractiveCausalInferencePipeline
from .utils import loading
from .utils.dataset import MultiTextDataset, shard
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
    pipe = InteractiveCausalInferencePipeline(config, params, geometry=geom,
                                              dit_config=cfg, mesh=mesh)
    switch_indices = list(config.switch_frame_indices)

    if config.data_path and os.path.exists(config.data_path) and text_encoder:
        rows = shard(MultiTextDataset(config.data_path), jax.process_index(),
                     jax.process_count())
    else:
        n_seg = len(switch_indices) + 1
        rows = [{"prompts": ["(random)"] * n_seg, "idx": 0}]
    if args.max_prompts:
        rows = rows[: args.max_prompts]
    if config.inference_iter != -1:
        # reference semantics: break AFTER batch i when i >= inference_iter
        # (inference.py:246) — inference_iter + 1 batches run
        rows = rows[: config.inference_iter + 1]

    # frame-by-frame scanned decode: larger chunks exceed v5e HBM at 480p
    decode = jax.jit(lambda p, z: V.vae_decode_scan(p, vcfg, z)[0])

    # encode every row's prompt segments up front (the reference encodes all
    # segments before generation, interactive_causal_inference.py:158), then
    # evict T5 from HBM (low-mem DynamicSwapInstaller analogue)
    all_conds = []
    for row in rows:
        prompts = row["prompts"]
        assert len(prompts) == len(switch_indices) + 1, (
            f"{len(prompts)} segments vs {len(switch_indices)} switches")
        conds = []
        for i, p in enumerate(prompts):
            if text_encoder is not None:
                conds.append(text_encoder([p])["prompt_embeds"])
            else:
                conds.append(jax.random.normal(
                    jax.random.PRNGKey(config.seed + i),
                    (1, cfg.text_len, cfg.text_dim)))
        all_conds.append(conds)
    if text_encoder is not None:
        from .utils import memory

        text_encoder.params = memory.offload_to_host(text_encoder.params)

    rng = jax.random.PRNGKey(config.seed)
    out_dir = config.output_folder or "videos/interactive"
    for row, conds in zip(rows, all_conds):
        cross_list = [pipe.prepare_condition(c) for c in conds]
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(
            sub, (1, config.num_output_frames, geom.channels, geom.height, geom.width),
            jnp.float32,
        )
        if config.profile:
            latents = pipe.generate_latents_interactive(
                noise, cross_list, switch_indices, rng=sub, profile=True)
        else:
            latents = pipe.generate_latents_interactive_scanned(
                noise, cross_list, switch_indices, rng=sub)
        pixels = decode(vae_params, latents.astype(jnp.bfloat16))
        # reference filename scheme (inference.py:231-244)
        rank = jax.process_index()
        model_type = ("lora" if config.lora_ckpt else
                      "ema" if use_ema else "regular")
        if config.save_with_index:
            name = f"rank{rank}-{row['idx']}-0_{model_type}.mp4"
        else:
            # same prompt-based rank-prefixed scheme as run_inference
            # (reference inference.py:242) — first segment names the video
            stem = row["prompts"][0][:100].replace(os.sep, "_")
            name = f"rank{rank}-{stem}-0.mp4"
        path = os.path.join(out_dir, name)
        write_video(path, to_video_array(pixels), fps=16)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
