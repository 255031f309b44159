"""Quantify the serving-mode quality delta: bf16 vs int8 linears vs
int8 linears + int8-QK attention.

Same weights, same seed, same noise; generates N latent frames in each
mode and reports latent divergence vs the bf16 reference plus
pixel-domain eval proxies (eval/metrics.py) after VAE decode.  Random
weights (no released checkpoints in this environment) — the numbers
quantify NUMERIC divergence of the quantized paths, which upper-bounds
what real weights would see at the same activation statistics.

Prints one JSON line per mode.  Run on the TPU chip:
    python scripts/quality_delta.py --frames 12
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--window", default="9,3")
    ap.add_argument("--skip_vae", action="store_true")
    ap.add_argument("--drift_interval", type=int, default=0,
                    help="report latent rel-RMS vs bf16 PER SEGMENT of this "
                         "many frames — the long-horizon compounding check "
                         "for the fast mode (run with --frames 240)")
    ap.add_argument("--modes", default=None,
                    help="comma-separated substrings: run only matching "
                         "modes (bf16 always runs as the reference)")
    ap.add_argument("--dmd_steps", type=int, default=0,
                    help="tiny mode only: pre-train the generator with this "
                         "many DMD steps and measure at the TRAINED weights "
                         "(random-weight activation statistics are not "
                         "representative; a distilled model is the gate's "
                         "operating point)")
    args = ap.parse_args()

    from longlive_tpu.config import DiTConfig, LatentGeometry, PipelineConfig
    from longlive_tpu.eval import metrics as EM
    from longlive_tpu.models import dit as D
    from longlive_tpu.models import vae as V
    from longlive_tpu.ops.quant import quantize_dit_params
    from longlive_tpu.pipeline import CausalInferencePipeline

    if os.environ.get("LONGLIVE_QD_TINY") == "1":  # CPU smoke of the script
        from longlive_tpu.config import tiny_dit_config, tiny_geometry
        jax.config.update("jax_platforms", "cpu")
        cfg, geom = tiny_dit_config(), tiny_geometry()
        local, sink = cfg.local_attn_size, cfg.sink_size
        args.frames = min(args.frames, 4)
        # tiny VAE (z_dim matches tiny_geometry channels) keeps the pixel
        # rows — incl. the int8-VAE adoption-gate row — CPU-exercisable
        pc = PipelineConfig(num_output_frames=args.frames,
                            num_frame_per_block=cfg.num_frame_per_block,
                            local_attn_size=local, sink_size=sink,
                            global_sink=False)
    else:
        local, sink = (int(s) for s in args.window.split(","))
        cfg = DiTConfig(local_attn_size=local, sink_size=sink)
        geom = LatentGeometry()
        pc = PipelineConfig(num_output_frames=args.frames,
                            local_attn_size=local,
                            sink_size=sink, global_sink=False)
    # zero_head=False: the reference zero-inits the head, which would make
    # every mode output identical zero flow — useless for a numeric delta
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16,
                               zero_head=False)
    if args.dmd_steps:
        assert os.environ.get("LONGLIVE_QD_TINY") == "1", \
            "--dmd_steps needs the tiny fixture (no released weights here)"
        from longlive_tpu.training.trainer import (ScoreDistillationTrainer,
                                                   TrainerConfig)
        tc = TrainerConfig(num_training_frames=4, min_num_training_frames=4,
                           slice_last_frames=4, attn_impl="xla",
                           ema_on_host=False)
        g0 = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32,
                               zero_head=False)
        tr = ScoreDistillationTrainer(tc, cfg, geom, g0,
                                      jax.tree.map(jnp.copy, g0),
                                      jax.tree.map(jnp.copy, g0))
        tr_prompt = jax.random.normal(jax.random.PRNGKey(11),
                                      (1, cfg.text_len, cfg.text_dim))
        for i in range(args.dmd_steps):
            tr_noise = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(12), i),
                (1, 4, geom.channels, geom.height, geom.width), jnp.float32)
            m = tr.train_step(tr_noise, tr_prompt, tr_prompt,
                              jax.random.PRNGKey(13))
        print(json.dumps({"dmd_fixture_steps": args.dmd_steps,
                          "final_generator_loss": m.get("generator_loss"),
                          "final_critic_loss": m.get("critic_loss")}),
              flush=True)
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                              tr.state["gen_params"])
    params_q = quantize_dit_params(params)
    prompt = jax.random.normal(jax.random.PRNGKey(1),
                               (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    noise = jax.random.normal(
        jax.random.PRNGKey(2),
        (1, args.frames, geom.channels, geom.height, geom.width), jnp.float32)

    vcfg = (V.tiny_vae_config()
            if os.environ.get("LONGLIVE_QD_TINY") == "1" else V.VAEConfig())
    vae_params = None
    if not args.skip_vae:
        vae_params = V.init_vae_params(jax.random.PRNGKey(3), vcfg, jnp.bfloat16)

    def gen(p, attn_impl, pcfg=None):
        pipe = CausalInferencePipeline(pcfg or pc, p, geometry=geom,
                                       dit_config=cfg, attn_impl=attn_impl)
        cross = pipe.prepare_condition(prompt)
        seg = args.drift_interval or args.frames
        if seg >= args.frames:
            lat, _, _ = pipe.generate_latents_scanned(
                noise, cross, rng=jax.random.PRNGKey(4),
                cache=pipe.init_cache(1, jnp.bfloat16), start_frame=0)
            return np.asarray(lat.astype(jnp.float32))
        # long-horizon runs: generate segment-by-segment with cache
        # continuation (identical rng chain — the carry passes through),
        # offloading each segment to host — constant device memory instead
        # of one 240-frame program (a single big program crashed the
        # tunneled TPU worker, chip session r3b stage 2)
        cache = pipe.init_cache(1, jnp.bfloat16)
        rng = jax.random.PRNGKey(4)
        out = []
        for s in range(0, args.frames, seg):
            lat, cache, rng = pipe.generate_latents_scanned(
                noise[:, s : s + seg], cross, rng=rng, cache=cache,
                start_frame=s)
            out.append(np.asarray(lat.astype(jnp.float32)))
        return np.concatenate(out, axis=1)

    import dataclasses as _dc

    tiny = os.environ.get("LONGLIVE_QD_TINY") == "1"
    modes = [
        ("bf16", params, "xla" if tiny else "auto", None),
        ("int8_linears", params_q, "xla" if tiny else "auto", None),
        # kernel_cache=False: the qk8 attend consumes per-token scales and
        # does not support the stacked kernel-layout (kv_layer) cache
        ("int8_linears+qk8_attn", params_q,
         "pallas_qk8_interpret" if tiny else "pallas_qk8",
         _dc.replace(pc, kernel_cache=False)),
        # Block-Cascading-style fast mode: skip the clean-context commit
        # pass, keep the last denoise forward's K/V (5->4 forwards/block).
        # The delta here is ALGORITHMIC (slightly-noisy context), not
        # numeric-precision noise.
        ("int8_linears+reuse_last_denoise_kv", params_q,
         "xla" if tiny else "auto",
         _dc.replace(pc, reuse_last_denoise_kv=True)),
    ]

    if args.modes:
        keep = [s.strip() for s in args.modes.split(",")]
        modes = [m for m in modes
                 if m[0] == "bf16" or any(k in m[0] for k in keep)]
    ref_lat = None
    ref_px = None
    for name, p, impl, pcfg in modes:
        lat = gen(p, impl, pcfg)
        row = {"mode": name, "frames": args.frames, "window": args.window}
        if ref_lat is None:
            ref_lat = lat
        else:
            d = lat - ref_lat
            row["latent_rel_rms_vs_bf16"] = float(
                np.sqrt((d ** 2).mean()) / (np.sqrt((ref_lat ** 2).mean()) + 1e-12))
            row["latent_max_abs_vs_bf16"] = float(np.abs(d).max())
            if args.drift_interval:
                # per-segment divergence: a mode whose error COMPOUNDS over
                # the horizon shows a rising series (the fast mode's
                # KV-context perturbation feeds back through the cache;
                # numeric-precision modes stay flat)
                seg = args.drift_interval
                row["drift_rel_rms_per_segment"] = [
                    round(float(np.sqrt((d[:, s:s + seg] ** 2).mean())
                                / (np.sqrt((ref_lat[:, s:s + seg] ** 2).mean())
                                   + 1e-12)), 5)
                    for s in range(0, lat.shape[1], seg)]
        if vae_params is not None:
            px, _ = jax.jit(
                lambda vp, z: V.vae_decode_scan(vp, vcfg, z, None, True))(
                vae_params, jnp.asarray(lat, jnp.bfloat16))
            v01 = np.clip(np.asarray(px.astype(jnp.float32))[0].transpose(
                0, 2, 3, 1) * 0.5 + 0.5, 0, 1)
            row["temporal_flicker"] = float(EM.temporal_flicker(v01))
            row["motion_smoothness"] = float(EM.motion_smoothness(v01))
            row["imaging_quality"] = float(EM.imaging_quality(v01))
            if ref_px is None:
                ref_px = v01
            else:
                row["pixel_mae_vs_bf16"] = float(np.abs(v01 - ref_px).mean())
                row["pixel_psnr_vs_bf16"] = float(
                    -10 * np.log10(((v01 - ref_px) ** 2).mean() + 1e-12))
        print(json.dumps(row), flush=True)

    if vae_params is not None and ref_lat is not None:
        # isolate the int8 VAE kernel (LONGLIVE_VAE_INT8): decode the SAME
        # bf16 latents, compare pixels vs the bf16-kernel decode above
        prev = {k: os.environ.get(k)
                for k in ("LONGLIVE_VAE_INT8", "LONGLIVE_VAE_FUSED")}
        os.environ["LONGLIVE_VAE_INT8"] = "1"
        if tiny:
            os.environ["LONGLIVE_VAE_FUSED"] = "interpret"
        try:
            px, _ = jax.jit(
                lambda vp, z: V.vae_decode_scan(vp, vcfg, z, None, True))(
                vae_params, jnp.asarray(ref_lat, jnp.bfloat16))
        finally:
            for k, v in prev.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        v01 = np.clip(np.asarray(px.astype(jnp.float32))[0].transpose(
            0, 2, 3, 1) * 0.5 + 0.5, 0, 1)
        print(json.dumps({
            "mode": "bf16_latents+int8_vae_decode",
            "pixel_mae_vs_bf16": float(np.abs(v01 - ref_px).mean()),
            "pixel_psnr_vs_bf16": float(
                -10 * np.log10(((v01 - ref_px) ** 2).mean() + 1e-12)),
            "temporal_flicker": float(EM.temporal_flicker(v01)),
            "imaging_quality": float(EM.imaging_quality(v01)),
        }), flush=True)


if __name__ == "__main__":
    main()
