"""End-to-end benchmark on the real TPU chip.

Measures sustained 480p generation speed (pixel FPS including streaming VAE
decode) of the LongLive-1.3B-geometry causal DiT with frame-sink +
ring-window KV attention — the reference's headline metric (20.7 FPS on one
H100, README.md:50; 172.97 ms/latent-frame steady state, reports.md:21).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/20.7, ...}

Env knobs: BENCH_FRAMES (default 30 latent frames measured after warmup),
BENCH_SWITCHES=1 to exercise the interactive prompt-switch path,
BENCH_SKIP_VAE=1 to exclude VAE decode.
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from longlive_tpu.config import DiTConfig, LatentGeometry, PipelineConfig
    from longlive_tpu.models import dit as D
    from longlive_tpu.models import vae as V
    from longlive_tpu.pipeline import InteractiveCausalInferencePipeline

    frames = int(os.environ.get("BENCH_FRAMES", "30"))
    warmup_frames = 6
    use_switches = os.environ.get("BENCH_SWITCHES", "0") == "1"
    skip_vae = os.environ.get("BENCH_SKIP_VAE", "0") == "1"

    cfg = DiTConfig()
    geom = LatentGeometry()
    total_frames = warmup_frames + frames
    pc = PipelineConfig(num_output_frames=total_frames, global_sink=False)

    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    pipe = InteractiveCausalInferencePipeline(pc, params, geometry=geom, dit_config=cfg)

    prompt_a = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    cross_a = pipe.prepare_condition(prompt_a)
    cross_list = [cross_a]
    switches = []
    if use_switches:
        prompt_b = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
        cross_list.append(pipe.prepare_condition(prompt_b))
        switches = [warmup_frames + frames // 2]

    vcfg = V.VAEConfig()
    vae_params = None
    vae_chunk_fn = None
    if not skip_vae:
        vae_params = V.init_vae_params(jax.random.PRNGKey(3), vcfg, jnp.bfloat16)
        vae_params["mean"] = jnp.asarray(V.WAN_LATENT_MEAN, jnp.float32)
        vae_params["std"] = jnp.asarray(V.WAN_LATENT_STD, jnp.float32)
        fpb = pc.num_frame_per_block

        first_fn = jax.jit(lambda p, z, c: V.vae_decode_chunk(p, vcfg, z, c, True))
        rest_fn = jax.jit(lambda p, z, c: V.vae_decode_chunk(p, vcfg, z, c, False))

    noise = jax.random.normal(
        jax.random.PRNGKey(4), (1, total_frames, geom.channels, geom.height, geom.width),
        jnp.float32,
    )

    # streaming decode state threaded through a block callback
    state = {"caches": None, "pixels": 0}

    def decode_block(start, latents_block):
        # one latent frame per decode step: full-res conv activations for
        # larger chunks exceed v5e HBM alongside the DiT + KV cache
        if skip_vae:
            return
        lat = latents_block.astype(jnp.bfloat16)
        for i in range(lat.shape[1]):
            if state["caches"] is None:
                state["caches"] = V.init_decoder_caches(
                    vae_params, vcfg, 1, geom.height, geom.width, jnp.bfloat16)
                px, state["caches"] = first_fn(vae_params, lat[:, :1], state["caches"])
            else:
                px, state["caches"] = rest_fn(
                    vae_params, lat[:, i : i + 1], state["caches"])
            state["pixels"] += px.shape[1]
            state["last"] = px

    # warmup (compile everything: block fn, recache fn, vae fns)
    t0 = time.perf_counter()
    warm_lat = pipe.generate_latents_interactive(
        noise[:, :warmup_frames], cross_list[:1], [], rng=jax.random.PRNGKey(5),
        block_callback=decode_block,
    )
    if not skip_vae:
        jax.block_until_ready(state["last"])
    jax.block_until_ready(warm_lat)
    compile_time = time.perf_counter() - t0

    # measured run (fresh caches, includes one prompt switch if requested)
    state["caches"] = None
    state["pixels"] = 0
    t0 = time.perf_counter()
    lat = pipe.generate_latents_interactive(
        noise, cross_list, switches, rng=jax.random.PRNGKey(6),
        block_callback=decode_block,
    )
    jax.block_until_ready(lat)
    if not skip_vae:
        jax.block_until_ready(state["last"])
    elapsed = time.perf_counter() - t0

    pixel_frames = 1 + 4 * (total_frames - 1) if not skip_vae else 4 * total_frames
    fps = pixel_frames / elapsed
    ms_per_latent_frame = elapsed / total_frames * 1e3

    baseline_fps = 20.7  # H100 reference (README.md:50)
    result = {
        "metric": "sustained 480p pixel FPS (e2e: 4-step AR denoise + streaming VAE decode)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / baseline_fps, 4),
        "ms_per_latent_frame": round(ms_per_latent_frame, 2),
        "latent_frames": total_frames,
        "prompt_switches": len(switches),
        "include_vae": not skip_vae,
        "compile_s": round(compile_time, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
