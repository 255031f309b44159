"""Full-geometry 1.3B training-step probe on the real chip.

Round-1 verdict: "full-scale training is unproven on the real chip" — all
training tests run tiny shapes.  This script measures, at the REAL
Wan-1.3B geometry (dim 1536, 30 layers, 480x832 latents, random bf16
weights), on whatever single device is live:

  --mode lora_step    one full DMD train step (generator rollout + DMD loss
                      + AdamW) with LoRA-r256 adapters on generator+critic —
                      the shipped long-tuning configuration
                      (longlive_train_long.yaml; adapters are the only
                      trained/optimizer-state-bearing params, so the three
                      bf16 1.3B models + f32 adapter opt states fit HBM).
  --mode grad_gen     generator loss + gradient only (full fine-tune grads,
                      no optimizer state) — the HBM-feasibility probe for
                      full-FT init training (longlive_train_init.yaml).
  --mode grad_critic  critic loss + gradient only.

Reports one JSON line: {mode, frames, ms_per_step, hbm_peak_gb, ...}.
Falls back through smaller --frames on OOM when --auto_shrink is set.

Reference match: trainer/distillation.py:1172-1298 (train loop),
model/streaming_training.py:407-548 (chunk step).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def hbm_peak_gb():
    try:
        st = jax.local_devices()[0].memory_stats()
        return round(st.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        return None


_STAGE = ["start"]


def mem(tag):
    _STAGE[0] = tag
    try:
        st = jax.local_devices()[0].memory_stats() or {}
        print(json.dumps({"mem": tag,
                          "in_use_gb": round(st.get("bytes_in_use", 0) / 2**30, 2),
                          "peak_gb": round(st.get("peak_bytes_in_use", 0) / 2**30, 2)}),
              flush=True)
    except Exception as e:  # axon may not expose memory_stats
        print(json.dumps({"mem": tag, "stats_error": str(e)[:60]}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="lora_step",
                    choices=["lora_step", "stream_chunk", "grad_gen",
                             "grad_critic", "mem_analysis"])
    ap.add_argument("--frames", type=int, default=21)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--auto_shrink", action="store_true")
    ap.add_argument("--page_gen", action="store_true",
                    help="page the generator to host during the loss-grad "
                         "phase (TrainerConfig.page_generator; staged only)")
    ap.add_argument("--cache_int8", action="store_true",
                    help="int8 rollout KV cache (k+v, per-token scales) — "
                         "the PERF.md squeeze for the 9/21-frame gap")
    ap.add_argument("--block_vjp", action="store_true",
                    help="eager per-block generator VJP (exact; peak HBM "
                         "one block's residuals instead of all blocks' — "
                         "the 21-frame OOM fix; implies --staged)")
    ap.add_argument("--opt_async", action="store_true",
                    help="overlap the critic's host AdamW (grad D2H + numpy "
                         "math + param H2D) with the next step's rollout "
                         "dispatch (TrainerConfig.opt_async; exact)")
    ap.add_argument("--staged", action="store_true",
                    help="staged_phases: 3-jit DMD split with the teacher + "
                         "frozen critic base paged to host between phases "
                         "(~5.2 GB off the rollout residency; lora_step only)")
    ap.add_argument("--ledger", action="store_true",
                    help="per-phase device-time ledger "
                         "(TrainerConfig.phase_ledger): prints phase_ms "
                         "per step — the measured compute-vs-transfer "
                         "split (VERDICT r4 item 4).  Implies --staged; "
                         "the syncs serialize the async overlap, so the "
                         "total is an upper bound on the production step.")
    ap.add_argument("--teacher_14b", action="store_true",
                    help="REAL 14B teacher geometry (dim 5120, ffn 13824, "
                         "40 heads, 40 layers — config.WAN_MODEL_CONFIGS), "
                         "host-resident and layer-streamed during the DMD "
                         "loss (teacher_stream).  Probe weights repeat one "
                         "random layer across the stack (memory/latency "
                         "probe; implies --staged).  lora_step only.")
    args = ap.parse_args()
    if args.teacher_14b and args.mode != "lora_step":
        ap.error("--teacher_14b is wired for --mode lora_step only (the "
                 "streamed teacher/teacher_cfg are not passed to the "
                 f"{args.mode} trainer construction)")

    from longlive_tpu.config import DiTConfig, LatentGeometry
    from longlive_tpu.models import dit as D
    from longlive_tpu.training import dmd as dmd_mod
    from longlive_tpu.training import rollout as ro
    from longlive_tpu.training.trainer import (ScoreDistillationTrainer,
                                               TrainerConfig)
    from longlive_tpu.config import CacheConfig
    from longlive_tpu.ops import scheduler as S
    from longlive_tpu.ops.rope import make_rope_tables

    if os.environ.get("LONGLIVE_PROBE_TINY") == "1":  # CPU smoke of the script
        from longlive_tpu.config import tiny_dit_config, tiny_geometry
        jax.config.update("jax_platforms", "cpu")
        cfg, geom = tiny_dit_config(), tiny_geometry()
        args.frames = min(args.frames, 4)
        cfg = type(cfg)(**{**cfg.__dict__, "num_frame_per_block": 1})
    else:
        cfg = DiTConfig()  # 1.3B @ 480x832, local 12 / sink 3
        geom = LatentGeometry()

    def run(frames):
        import dataclasses as dc

        import numpy as np

        gen = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16, zero_head=False)
        critic = D.init_dit_params(jax.random.PRNGKey(1), cfg, jnp.bfloat16, zero_head=False)
        teacher_cfg = None
        if args.teacher_14b:
            # real 14B head/layer geometry (config.WAN_MODEL_CONFIGS); blocks
            # built host-side as one random layer broadcast across the stack
            # (stream_scan slices per layer, so views stream fine)
            from longlive_tpu.config import WAN_MODEL_CONFIGS
            tg = dict(WAN_MODEL_CONFIGS["Wan2.1-T2V-14B"])
            if os.environ.get("LONGLIVE_PROBE_TINY") == "1":
                tg = dict(dim=2 * cfg.dim, ffn_dim=2 * cfg.ffn_dim,
                          num_heads=2 * cfg.num_heads, num_layers=4)
            teacher_cfg = dc.replace(cfg, **tg)
            one_cfg = dc.replace(teacher_cfg, num_layers=1)
            tp1 = D.init_dit_params(jax.random.PRNGKey(2), one_cfg,
                                    jnp.bfloat16, zero_head=False)
            L = tg["num_layers"]
            blocks = jax.tree.map(
                lambda a: np.broadcast_to(np.asarray(a), (L,) + a.shape[1:]),
                tp1["blocks"])
            teacher = {**tp1, "blocks": blocks}
        else:
            teacher = D.init_dit_params(jax.random.PRNGKey(2), cfg,
                                        jnp.bfloat16, zero_head=False)
        mem("models_initialized")
        noise = jax.random.normal(
            jax.random.PRNGKey(3),
            (1, frames, geom.channels, geom.height, geom.width), jnp.float32)
        pe_c = jax.random.normal(jax.random.PRNGKey(4),
                                 (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
        pe_u = pe_c * 0.1
        extra = {}

        if args.mode == "mem_analysis":
            # AOT allocation dump for the staged LoRA step: compile each
            # staged phase (rollout fwd, DMD loss-grad, rollout VJP, critic
            # rollout, critic grad) at the requested --frames and print its
            # XLA memory_analysis — exact HBM temp/arg/output bytes WITHOUT
            # executing anything.  This is the diagnostic the 21-frame chip
            # run could not produce (the runtime OOM surfaces as a bare
            # 'TPU backend error (ResourceExhausted)' over the axon tunnel,
            # with the failing phase hidden by async dispatch).
            tcfg = TrainerConfig(
                num_frame_per_block=cfg.num_frame_per_block,
                num_training_frames=frames, min_num_training_frames=frames,
                slice_last_frames=-1, lora_rank=256, lora_alpha=256.0,
                dfake_gen_update_ratio=1, opt_on_host=True,
                cache_int8=args.cache_int8, staged_phases=True,
                teacher_stream=args.teacher_14b,
                page_generator=args.page_gen)
            tr = ScoreDistillationTrainer(tcfg, cfg, geom, gen, critic,
                                          teacher, teacher_cfg=teacher_cfg)
            del gen, critic, teacher
            mem("trainer_ready")

            def abst(t):
                return jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                                   jnp.result_type(x)), t)

            def report(tag, jfn, *a):
                t0 = time.perf_counter()
                ca = jfn.lower(*a).compile()
                ma = ca.memory_analysis()
                if ma is None:  # backend doesn't expose it
                    print(json.dumps({"phase": tag, "memory_analysis": None,
                                      "compile_s": round(
                                          time.perf_counter() - t0, 1)}),
                          flush=True)
                    return
                gib = lambda n: round(n / 2**30, 3)
                print(json.dumps({
                    "phase": tag,
                    "args_gib": gib(ma.argument_size_in_bytes),
                    "out_gib": gib(ma.output_size_in_bytes),
                    "temp_gib": gib(ma.temp_size_in_bytes),
                    "alias_gib": gib(ma.alias_size_in_bytes),
                    "peak_est_gib": gib(ma.argument_size_in_bytes
                                        + ma.output_size_in_bytes
                                        + ma.temp_size_in_bytes
                                        - ma.alias_size_in_bytes),
                    "compile_s": round(time.perf_counter() - t0, 1),
                }), flush=True)

            # replicate train_step's host-side sampling at step 0 / key 5
            rng = jax.random.fold_in(jax.random.PRNGKey(5), 0)
            (rng_exit, rng_len, rng_g, rng_exit2, rng_len2,
             rng_c) = jax.random.split(rng, 6)
            exit_idx, nb, use_mask = tr._sample_rollout_geometry(
                noise, rng_exit, rng_len)
            exit_c, nb_c, _ = tr._sample_rollout_geometry(
                noise, rng_exit2, rng_len2)
            rng_roll, rng_dmd = jax.random.split(rng_g)
            print(json.dumps({"exit_idx": int(exit_idx),
                              "exit_c": int(exit_c), "frames": frames}),
                  flush=True)

            gt = abst(tr.state["gen_lora"])
            gb = abst(tr.state["gen_params"])
            an = abst(noise[:, : nb * cfg.num_frame_per_block])
            pc, pu = abst(pe_c), abst(pe_u)
            rkey = (exit_idx, 0)
            lat_s = jax.eval_shape(tr._latents_fn(*rkey), gt, gb, an, pc,
                                   rng_roll)
            report("rollout_fwd", tr._staged_roll(rkey), gt, gb, an, pc,
                   rng_roll)
            ct = abst(tr.state[
                "critic_lora" if tr.critic_lora_on else "critic_params"])
            cb = (abst(tr.state["critic_params"]) if tr.critic_lora_on
                  else {})
            stream = tcfg.teacher_stream
            tch = (lat_s if stream else abst(tr.teacher_params))
            report("dmd_loss_grad",
                   tr._staged_dmd_grad(exit_idx, use_mask, stream),
                   lat_s, ct, cb, tch, pc, pu, rng_dmd)
            report("rollout_vjp", tr._staged_vjp(rkey), gt, gb, an, pc,
                   rng_roll, lat_s)
            rkey_c = (exit_c, nb_c * cfg.num_frame_per_block + 1)
            an_c = abst(noise[:, : nb_c * cfg.num_frame_per_block])
            lat_c = jax.eval_shape(tr._latents_fn(*rkey_c), gt, gb, an_c,
                                   pc, rng_c)
            report("critic_rollout", tr._staged_roll(rkey_c), gt, gb, an_c,
                   pc, rng_c)
            report("critic_grad", tr._staged_critic_grad(exit_c), ct, cb,
                   lat_c, pc, rng_c)
            return 0.0, {"frames": frames}

        if args.mode == "lora_step":
            tcfg = TrainerConfig(
                num_frame_per_block=cfg.num_frame_per_block,
                num_training_frames=frames, min_num_training_frames=frames,
                slice_last_frames=-1, lora_rank=256, lora_alpha=256.0,
                dfake_gen_update_ratio=1,  # step 0 = generator AND critic
                # 16 GB chip: bf16 adapters (reference adapter.dtype) +
                # ZeRO-Offload-style host AdamW — on-device f32 master+
                # moments for 2x540M adapter params alone would be ~13 GB
                opt_on_host=True, opt_async=args.opt_async,
                cache_int8=args.cache_int8,
                staged_phases=(args.staged or args.teacher_14b
                               or args.block_vjp or args.ledger),
                block_vjp=args.block_vjp,
                teacher_stream=args.teacher_14b,
                page_generator=args.page_gen,
                phase_ledger=args.ledger)
            tr = ScoreDistillationTrainer(tcfg, cfg, geom, gen, critic,
                                          teacher, teacher_cfg=teacher_cfg)
            del gen, critic, teacher  # trainer owns them; free the dup refs
            mem("trainer_ready")
            t0 = time.perf_counter()
            m = tr.train_step(noise, pe_c, pe_u, jax.random.PRNGKey(5))
            tr.finish_pending()
            _ = float(jnp.asarray(m["critic_loss"]))
            mem("first_step_done")
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            ledgers = []
            for r in range(args.reps):
                m = tr.train_step(noise, pe_c, pe_u, jax.random.PRNGKey(5))
                if args.ledger and "phase_ms" in m:
                    ledgers.append(m["phase_ms"])
                    print(json.dumps({"step_ledger": m["phase_ms"]}),
                          flush=True)
            tr.finish_pending()  # include the trailing async update
            _ = float(jnp.asarray(m["critic_loss"]))
            dt = (time.perf_counter() - t0) / args.reps
            extra = {"generator_loss": float(m.get("generator_loss", float("nan"))),
                     "critic_loss": float(m["critic_loss"]),
                     "compile_s": round(compile_s, 1)}
            if ledgers:
                # mean per phase over the timed reps
                keys = sorted({k for l in ledgers for k in l})
                extra["phase_ms"] = {
                    k: round(sum(l.get(k, 0.0) for l in ledgers)
                             / len(ledgers), 1) for k in keys}
            return dt, extra

        if args.mode == "stream_chunk":
            # streaming long-tuning chunk step at full geometry: persistent
            # KV cache + overlapped 21-frame supervised chunk — the shipped
            # longlive_train_long.yaml configuration
            # (model/streaming_training.py:407-548)
            from longlive_tpu.training.streaming import (StreamingConfig,
                                                         StreamingTrainer)

            tcfg = TrainerConfig(
                num_frame_per_block=cfg.num_frame_per_block,
                num_training_frames=frames, min_num_training_frames=frames,
                slice_last_frames=-1, lora_rank=256, lora_alpha=256.0,
                dfake_gen_update_ratio=1, opt_on_host=True,
                opt_async=args.opt_async, cache_int8=args.cache_int8,
                staged_phases=args.staged or args.block_vjp,
                block_vjp=args.block_vjp)
            scfg = StreamingConfig(chunk_size=frames, max_length=frames * 4,
                                   min_new_frame=max(frames - 3, 3))
            tr = StreamingTrainer(tcfg, cfg, geom, gen, critic, teacher,
                                  streaming_cfg=scfg)
            del gen, critic, teacher
            tr.start_new_sequence(pe_c, pe_u, jax.random.PRNGKey(11))
            restart = lambda: tr.start_new_sequence(pe_c, pe_u,
                                                    jax.random.PRNGKey(99))
            mem("trainer_ready")
            t0 = time.perf_counter()
            m = tr.streaming_train_step(jax.random.PRNGKey(12),
                                        new_sequence_cb=restart)
            _ = float(jnp.asarray(m["critic_loss"]))
            mem("first_step_done")
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for r in range(args.reps):
                m = tr.streaming_train_step(jax.random.PRNGKey(13 + r),
                                            new_sequence_cb=restart)
            tr.finish_pending()  # include the trailing async update
            _ = float(jnp.asarray(m["critic_loss"]))
            mem("steady_step_done")
            dt = (time.perf_counter() - t0) / args.reps
            extra = {"generator_loss": float(m.get("generator_loss", float("nan"))),
                     "critic_loss": float(m["critic_loss"]),
                     "current_length": int(m["current_length"]),
                     "compile_s": round(compile_s, 1)}
            return dt, extra

        # grad-only probes (full fine-tune feasibility — no opt/EMA trees)
        sched = S.make_schedule(1000, shift=5.0, sigma_min=0.0,
                                extra_one_step=True, training=True)
        steps = tuple(float(x) for x in
                      S.warp_denoising_steps(sched, (1000, 750, 500, 250)))
        rcfg = ro.RolloutConfig(denoise_timesteps=steps,
                                frame_block=cfg.num_frame_per_block,
                                window_frames=cfg.local_attn_size, remat=True,
                                cache_int8=args.cache_int8)
        kv_frames = min(cfg.local_attn_size + 21, frames)
        cache_cfg = CacheConfig(sink_frames=cfg.sink_size,
                                ring_frames=kv_frames - cfg.sink_size,
                                frame_seq=geom.frame_seq_length)
        tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
        dcfg = dmd_mod.DMDConfig(timestep_shift=5.0, real_guidance_scale=3.0)

        if args.mode == "grad_gen":
            def loss_fn(gp, rng):
                r1, r2 = jax.random.split(rng)
                cross = D.prepare_cross_kv(gp, cfg, pe_c, jnp.bfloat16)
                lat, _, _ = ro.rollout_trajectory(
                    gp, cfg, cache_cfg, tables, sched, rcfg, noise, cross,
                    r1, exit_idx=1,
                    start_gradient_frame=frames - cfg.num_frame_per_block)
                loss, aux = dmd_mod.distribution_matching_loss(
                    lat, critic, teacher, cfg, tables, sched, dcfg,
                    pe_c, pe_u, r2)
                return loss, aux

            step = jax.jit(lambda gp, rng: jax.value_and_grad(
                loss_fn, has_aux=True)(gp, rng))
            t0 = time.perf_counter()
            (loss, aux), grads = step(gen, jax.random.PRNGKey(6))
            gn = float(jax.tree.reduce(
                lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)), grads, 0.0))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.reps):
                (loss, aux), grads = step(gen, jax.random.PRNGKey(6))
            _ = float(loss)
            dt = (time.perf_counter() - t0) / args.reps
            return dt, {"loss": float(loss), "grad_l1": gn,
                        "compile_s": round(compile_s, 1)}

        # grad_critic
        cross = jax.jit(lambda p: D.prepare_cross_kv(p, cfg, pe_c, jnp.bfloat16))(gen)
        lat, _, _ = jax.jit(lambda gp, c, r: ro.rollout_trajectory(
            gp, cfg, cache_cfg, tables, sched, rcfg, noise, c, r,
            exit_idx=1, start_gradient_frame=frames + 1))(
            gen, cross, jax.random.PRNGKey(7))
        lat = jax.lax.stop_gradient(lat)

        def closs_fn(cp, rng):
            loss, aux = dmd_mod.critic_denoising_loss(
                cp, lat, cfg, tables, sched, dcfg, pe_c, rng,
                attn_impl="train_auto")
            return loss, aux

        step = jax.jit(lambda cp, rng: jax.value_and_grad(
            closs_fn, has_aux=True)(cp, rng))
        t0 = time.perf_counter()
        (loss, aux), grads = step(critic, jax.random.PRNGKey(8))
        _ = float(loss)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            (loss, aux), grads = step(critic, jax.random.PRNGKey(8))
        _ = float(loss)
        dt = (time.perf_counter() - t0) / args.reps
        return dt, {"loss": float(loss), "compile_s": round(compile_s, 1)}

    import gc

    frames = args.frames
    while True:
        try:
            dt, extra = run(frames)
            break
        except Exception as e:
            msg = str(e)
            low = msg.lower()
            oom = ("resource_exhausted" in low or "out of memory" in low
                   or "exceeded hbm capacity" in low
                   # axon tunnels compile-time HBM OOM as an HTTP 500
                   or "tpu_compile_helper subprocess exit code" in low)
            if args.auto_shrink and oom and frames > 3:
                used = next((ln for ln in msg.splitlines()
                             if "Ran out of memory" in ln or "hbm" in ln), "")[:200]
                print(json.dumps({"mode": args.mode, "frames": frames,
                                  "oom": True, "stage": _STAGE[0],
                                  "detail": used}), flush=True)
                frames -= 3 if frames <= 12 else 6
                # RE-EXEC at the smaller size: in-process retry is poisoned
                # on the axon tunnel (buffers from the failed compile linger
                # past gc+clear_caches — measured: a fresh 6-frame staged run
                # fits, the same size OOMs on retry after a 21-frame OOM)
                argv = [a for a in sys.argv if not a.startswith("--frames")]
                if "--frames" in sys.argv:
                    i = sys.argv.index("--frames")
                    argv = sys.argv[:i] + sys.argv[i + 2:]
                sys.stdout.flush()
                os.execv(sys.executable,
                         [sys.executable] + argv + ["--frames", str(frames)])
            raise

    print(json.dumps({
        "mode": args.mode,
        "frames": frames,
        "cache_int8": args.cache_int8,
        "staged": args.staged,
        "teacher_14b": args.teacher_14b,
        "ms_per_step": round(dt * 1e3, 1),
        "hbm_peak_gb": hbm_peak_gb(),
        "device": str(jax.devices()[0]),
        **extra,
    }))


if __name__ == "__main__":
    main()
