"""Training CLI (reference train.py + trainer/distillation.py run-loop).

Usage:
  python -m longlive_tpu.run_train --config_path configs/longlive_train_init.yaml
  python -m longlive_tpu.run_train --config_path configs/longlive_train_long.yaml

Dispatches on ``distribution_loss``: ``dmd`` -> batch DMD training
(Self-Forcing init), ``dmd_switch`` + ``streaming_training`` -> streaming
long tuning.  Auto-resume scans the logdir like the reference
(distillation.py:605-629).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from .config import LatentGeometry, pipeline_config_from_dict
from .models import dit as D
from .parallel import mesh as M
from .training.streaming import StreamingConfig, StreamingTrainer
from .training.trainer import ScoreDistillationTrainer, TrainerConfig
from .utils import loading, orbax_io
from .utils import compile_cache

compile_cache.enable()
from .utils.dataset import (ShardedCheckpointableLoader, TextDataset,
                            TwoTextDataset, cycle)
from .utils.metrics import MetricsLogger


def build_trainer_config(raw: dict) -> TrainerConfig:
    mk = raw.get("model_kwargs", {}) or {}
    return TrainerConfig(
        lr=float(raw.get("lr", 2e-6)),
        lr_critic=float(raw.get("lr_critic", 4e-7)),
        beta1=float(raw.get("beta1", 0.0)),
        beta2=float(raw.get("beta2", 0.999)),
        beta1_critic=float(raw.get("beta1_critic", 0.0)),
        beta2_critic=float(raw.get("beta2_critic", 0.999)),
        weight_decay=float(raw.get("weight_decay", 0.01)),
        dfake_gen_update_ratio=int(raw.get("dfake_gen_update_ratio", 5)),
        gradient_accumulation_steps=int(raw.get("gradient_accumulation_steps", 1)),
        ema_weight=float(raw.get("ema_weight", 0.99)),
        ema_start_step=int(raw.get("ema_start_step", 200)),
        denoising_step_list=tuple(raw.get("denoising_step_list", (1000, 750, 500, 250))),
        warp_denoising_step=bool(raw.get("warp_denoising_step", True)),
        timestep_shift=float(mk.get("timestep_shift", 5.0)),
        guidance_scale=float(raw.get("guidance_scale", 3.0)),
        num_frame_per_block=int(raw.get("num_frame_per_block", 3)),
        num_training_frames=int(raw.get("num_training_frames", 21)),
        min_num_training_frames=int(raw.get("min_num_training_frames",
                                            raw.get("num_training_frames", 21))),
        slice_last_frames=int(raw.get("slice_last_frames", 21)),
        context_noise=float(raw.get("context_noise", 0)),
        last_step_only=bool(raw.get("last_step_only", False)),
        ts_schedule=bool(raw.get("ts_schedule", False)),
        ts_schedule_max=bool(raw.get("ts_schedule_max", False)),
        seed=int(raw.get("seed", 0)),
        # adapter section (longlive_train_long.yaml): LoRA training
        lora_rank=int((raw.get("adapter") or {}).get("rank", 0)
                      if (raw.get("adapter") or {}).get("type") == "lora" else 0),
        lora_alpha=float((raw.get("adapter") or {}).get("alpha", 256)),
        lora_apply_to_critic=bool((raw.get("adapter") or {}).get(
            "apply_to_critic", True)),
        lora_dtype=str((raw.get("adapter") or {}).get("dtype", "bfloat16")),
        # single-chip HBM levers (no reference analogue — it trains on
        # 80 GB H100s): host-resident AdamW state and EMA shadow
        opt_on_host=bool(raw.get("opt_on_host", False)),
        opt_async=bool(raw.get("opt_async", False)),
        ema_on_host=bool(raw.get("ema_on_host", True)),
        cache_int8=bool(raw.get("cache_int8", False)),
        staged_phases=bool(raw.get("staged_phases", False))
        or bool(raw.get("block_vjp", False)),
        block_vjp=bool(raw.get("block_vjp", False)),
        page_generator=bool(raw.get("page_generator", False)),
        teacher_stream=bool(raw.get("teacher_stream", False)),
        phase_ledger=bool(raw.get("phase_ledger", False)),
    )


def resolve_score_models(raw: dict, dit_cfg, tcfg: TrainerConfig, mesh=None,
                         strict: bool = False):
    """Teacher (real_score) / critic (fake_score) initialization.

    Matches the reference's DMD wiring (model/base.py:29-49 + the shipped
    configs/longlive_train_init.yaml:5-7): ``real_name``/``fake_name`` select
    FRESH base-Wan checkpoints for the real/fake score models — they are NOT
    copies of the (distilled) generator, which ``generator_ckpt`` loads into
    the generator only (trainer/distillation.py:158,476-478).  The 14B
    teacher (``real_name: Wan2.1-T2V-14B``) composes with ``teacher_stream``:
    its tree is built in host RAM and streamed per-layer during the loss
    phase (never resident in HBM).

    Returns ``(teacher_params, teacher_cfg, critic_params)``.
    """
    import dataclasses as _dc

    from .config import WAN_MODEL_CONFIGS

    real_name = raw.get("real_name", "Wan2.1-T2V-1.3B")
    fake_name = raw.get("fake_name", "Wan2.1-T2V-1.3B")
    seed = int(raw.get("seed", 0))

    if raw.get("tiny_debug"):
        # fresh random score models (distinct seeds — the invariant that the
        # teacher is NOT the generator holds even without artifacts)
        teacher = D.init_dit_params(jax.random.PRNGKey(seed + 1), dit_cfg,
                                    jnp.float32, zero_head=False)
        critic = D.init_dit_params(jax.random.PRNGKey(seed + 2), dit_cfg,
                                   jnp.float32, zero_head=False)
        return teacher, dit_cfg, critic

    # teacher geometry: real_name's released arch, with the run's
    # latent/text geometry carried over (the 14B teacher keeps the
    # generator's resolution — train_probe_1p3b.py --teacher_14b wiring)
    tgeom = WAN_MODEL_CONFIGS.get(real_name)
    if tgeom is None:
        raise KeyError(
            f"real_name {real_name!r} unknown; known: {list(WAN_MODEL_CONFIGS)}")
    teacher_cfg = _dc.replace(dit_cfg, **tgeom)
    big_teacher = teacher_cfg.dim != dit_cfg.dim or (
        teacher_cfg.num_layers != dit_cfg.num_layers)
    if big_teacher and not tcfg.teacher_stream:
        raise ValueError(
            f"real_name {real_name!r} is a larger teacher "
            f"(dim {teacher_cfg.dim}); set teacher_stream: true (and "
            "staged_phases: true) so it streams from host RAM")
    # teacher_stream => build the tree in HOST RAM unconditionally: the
    # trainer pages/streams it from there, and materializing a 14B f32
    # tree on one 16 GB device just to shard or offload it again would
    # OOM at load (the whole point of the flag)
    teacher = loading.load_base_dit(
        os.path.join("wan_models", real_name), teacher_cfg, jnp.float32,
        seed=seed + 1, on_host=bool(tcfg.teacher_stream), strict=strict)

    # critic (fake_score) is TRAINED with the generator's arch; a
    # different-geometry fake_name has no trainer wiring (the reference
    # never ships one either — fake_name is 1.3B in every config)
    fgeom = WAN_MODEL_CONFIGS.get(fake_name)
    if fgeom is None:
        raise KeyError(
            f"fake_name {fake_name!r} unknown; known: {list(WAN_MODEL_CONFIGS)}")
    if fgeom["dim"] != dit_cfg.dim or fgeom["num_layers"] != dit_cfg.num_layers:
        raise ValueError(
            f"fake_name {fake_name!r} geometry {fgeom} differs from the "
            "generator arch; the critic must share the generator's config")
    critic = loading.load_base_dit(
        os.path.join("wan_models", fake_name), dit_cfg, jnp.float32,
        seed=seed + 2, strict=strict)
    return teacher, teacher_cfg, critic


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", required=True)
    ap.add_argument("--logdir", default="checkpoints/run")
    ap.add_argument("--max_iters", type=int, default=None)
    ap.add_argument("--no_auto_resume", action="store_true")
    ap.add_argument("--allow_random_weights", action="store_true",
                    help="proceed with random init when model artifacts are "
                         "missing (benches/probes only — a real distillation "
                         "run against a random teacher is silently ruined)")
    args = ap.parse_args()

    # multi-host rendezvous — XLA-collective analogue of the reference's
    # NCCL TCP-store init (utils/distributed.py:75-88); a no-op single-host.
    # torchrun-style env contract: JAX_COORDINATOR_ADDRESS (+ optional
    # JAX_NUM_PROCESSES / JAX_PROCESS_ID for explicit rendezvous — the
    # 2-process CPU simulation uses these; cloud TPU infers them).
    coord = (os.environ.get("JAX_COORDINATOR_ADDRESS")
             or os.environ.get("COORDINATOR_ADDRESS"))
    if coord:
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            # cross-process collectives on the CPU backend ride gloo; and
            # the axon TPU plugin ignores the JAX_PLATFORMS env var, so
            # honor it via the config flag BEFORE the backend initializes
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
            jax.config.update("jax_platforms", "cpu")
        kw = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kw = dict(coordinator_address=coord,
                      num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                      process_id=int(os.environ["JAX_PROCESS_ID"]))
        jax.distributed.initialize(**kw)
        print(f"[dist] process {jax.process_index()}/{jax.process_count()} "
              f"local_devices={jax.local_device_count()} "
              f"global_devices={jax.device_count()}", flush=True)
        if jax.process_count() > 1:
            # establish the cross-process collective context NOW, while the
            # ranks are still in lockstep — gloo pair connections have a
            # fixed timeout, and the first training step's collectives can
            # otherwise be minutes apart under compile-time skew
            from jax.experimental import multihost_utils as _mh

            _mh.sync_global_devices("longlive_train_start")
            print("[dist] global barrier ok", flush=True)

    with open(args.config_path) as f:
        raw = yaml.safe_load(f)
    from .config import warn_unknown_keys

    warn_unknown_keys(raw, source=args.config_path)
    pconfig = pipeline_config_from_dict(raw)
    tcfg = build_trainer_config(raw)
    if raw.get("tiny_debug"):
        # CI/smoke: tiny geometry exercising every code path
        from .config import tiny_dit_config, tiny_geometry

        dit_cfg = tiny_dit_config()
        geom = tiny_geometry()
        tcfg.num_frame_per_block = dit_cfg.num_frame_per_block
        tcfg.num_training_frames = min(tcfg.num_training_frames, 4)
        tcfg.min_num_training_frames = min(tcfg.min_num_training_frames, 4)
        tcfg.slice_last_frames = min(tcfg.slice_last_frames, 4)
        tcfg.attn_impl = "xla"
    else:
        dit_cfg = pconfig.dit_config()
        geom = LatentGeometry()
    max_iters = args.max_iters or int(raw.get("max_iters", 10000))
    log_iters = int(raw.get("log_iters", 100))
    max_ckpts = int(raw.get("max_checkpoints", 5))

    # fail-fast artifact policy (VERDICT r4 Missing #4): a real training
    # launch with a typo'd wan_models/ path must crash like the reference
    # (inference.py:72 unconditional torch.load), not silently distill
    # against a random teacher.  `--allow_random_weights` (or the yaml key)
    # restores warn-and-random for benches/probes; tiny_debug implies it.
    strict = not (args.allow_random_weights
                  or bool(raw.get("allow_random_weights", False))
                  or bool(raw.get("tiny_debug")))

    # models: generator (causal), teacher + critic (bidirectional, same arch)
    if raw.get("tiny_debug"):
        from .models import dit as _dit
        from .models import vae as _vae

        gen_params = _dit.init_dit_params(jax.random.PRNGKey(0), dit_cfg,
                                          jnp.float32, zero_head=False)
        vcfg = _vae.tiny_vae_config()
        vae_params = None  # skip re-encode paths needing matched geometry
        text_encoder = None
    else:
        gen_params = loading.load_dit_params(pconfig, dit_cfg, jnp.float32,
                                             strict=strict)
        vae_params, vcfg = loading.load_vae_params(pconfig, jnp.float32,
                                                   strict=strict)
        text_encoder = loading.load_text_encoder(pconfig, strict=strict)

    mesh = None
    ndev = len(jax.devices())
    if ndev > 1:
        # mesh layout from yaml: parallel: {dp: N, fsdp: M}; default = pure
        # FSDP over all devices (reference `sharding_strategy: full/hybrid`,
        # longlive_train_init.yaml:26).  dp*fsdp may select a subset of the
        # visible devices; dp=fsdp=1 forces a single-device run (useful on
        # hosts where many-virtual-device CPU collectives starve).
        par = raw.get("parallel") or {}
        dp = int(par.get("dp", 1))
        fsdp_n = int(par.get("fsdp", ndev // dp))
        if dp * fsdp_n == 1:
            mesh = None
        else:
            mesh = M.make_mesh(dp=dp, fsdp=fsdp_n,
                               devices=jax.devices()[: dp * fsdp_n])
    # real/fake score models: FRESH base-Wan weights via real_name/fake_name
    # (reference model/base.py:30-39) — generator_ckpt never touches them
    teacher_params, teacher_cfg, critic_params = resolve_score_models(
        raw, dit_cfg, tcfg, mesh=mesh, strict=strict)

    if mesh is not None:
        gen_params = M.shard_params(gen_params, mesh)
        if not tcfg.teacher_stream:  # streamed teacher stays host-resident
            teacher_params = M.shard_params(teacher_params, mesh)
        critic_params = M.shard_params(critic_params, mesh)

    streaming = bool(raw.get("streaming_training", False))
    if streaming:
        scfg = StreamingConfig(
            chunk_size=int(raw.get("streaming_chunk_size", 21)),
            max_length=int(raw.get("streaming_max_length", 240)),
            min_new_frame=int(raw.get("streaming_min_new_frame", 18)),
            switch_choices=tuple(raw.get("switch_choices", ()) or ()),
            global_sink=bool(raw.get("global_sink", False)),
        )
        trainer = StreamingTrainer(
            tcfg, dit_cfg, geom, gen_params, critic_params, teacher_params,
            mesh=mesh, streaming_cfg=scfg, vae_params=vae_params, vae_cfg=vcfg,
            teacher_cfg=teacher_cfg)
    else:
        trainer = ScoreDistillationTrainer(
            tcfg, dit_cfg, geom, gen_params, critic_params, teacher_params,
            mesh=mesh, teacher_cfg=teacher_cfg)

    if not args.no_auto_resume:
        restored = orbax_io.restore_train_state(args.logdir, trainer.state)
        if restored is not None:
            trainer.state.update(restored)
            print(f"[resume] restored step {int(trainer.state['step'])}")

    # prompt stream
    data_path = raw.get("data_path")
    switch_path = raw.get("switch_prompt_path")
    loader = None
    if data_path and os.path.exists(data_path):
        if switch_path and os.path.exists(switch_path):
            ds = TwoTextDataset(data_path, switch_path)
        else:
            ds = TextDataset(data_path)
        # per-host-sharded, per-epoch-shuffled, CHECKPOINTABLE loader
        # (DistributedSampler shuffle+set_epoch semantics + mid-epoch
        # resume — the reference restarts each resume from the epoch head,
        # repeating samples).  Loader position is saved beside every
        # checkpoint and restored with it.
        lstate = (None if args.no_auto_resume
                  else orbax_io.load_loader_state(args.logdir))
        loader = ShardedCheckpointableLoader(
            ds, jax.process_index(), jax.process_count(),
            seed=int(raw.get("seed", 0)), state=lstate)
        if lstate is not None:
            print(f"[resume] loader at epoch {loader.epoch} "
                  f"index {loader.index}")
        prompt_iter = loader
    else:
        prompt_iter = cycle([{"prompts": "(random)", "idx": 0}])
    neg_prompt = raw.get("negative_prompt", "")

    def encode(p):
        if text_encoder is not None:
            return text_encoder([p])["prompt_embeds"]
        return jax.random.normal(jax.random.PRNGKey(abs(hash(p)) % 2**31),
                                 (1, dit_cfg.text_len, dit_cfg.text_dim))

    # training-time visualization: run the real inference pipeline every
    # vis_interval steps (reference distillation.py:1462-1551)
    vis_interval = int(raw.get("vis_interval", 0) or 0)
    vis_lengths = list(raw.get("vis_video_lengths", [21]) or [21])

    def visualize(step: int):
        from .models import vae as Vm
        from .pipeline import CausalInferencePipeline
        from .utils.video_io import to_video_array, write_video

        ema = trainer.state["ema_params"]
        if trainer.use_lora:  # EMA tracks adapters; fold into base weights
            from .training import lora as lora_mod

            ema = lora_mod.merge_lora(trainer.state["gen_params"], ema,
                                      trainer.lora_scale)
        ema = jax.tree.map(lambda x: x.astype(jnp.bfloat16), ema)
        vis_pc = pconfig
        pipe = CausalInferencePipeline(vis_pc, ema, geometry=geom, dit_config=dit_cfg)
        pe = encode(next(prompt_iter)["prompts"])
        cross = pipe.prepare_condition(pe.astype(jnp.bfloat16))
        for length in vis_lengths:
            nz = jax.random.normal(jax.random.PRNGKey(step),
                                   (1, length, geom.channels, geom.height,
                                    geom.width), jnp.float32)
            lat, _, _ = pipe.generate_latents_scanned(nz, cross)
            px, _ = Vm.vae_decode_scan(vae_params, vcfg, lat.astype(jnp.bfloat16))
            write_video(os.path.join(args.logdir, f"vis_{step:06d}_{length}f.mp4"),
                        to_video_array(px), fps=16)

    logger = MetricsLogger(
        logdir=args.logdir,
        wandb_config=(dict(project=raw["wandb_project"],
                           entity=raw.get("wandb_entity"))
                      if raw.get("wandb_project") not in (None, "YOUR_WANDB_PROJECT")
                      else None),
        is_main_process=jax.process_index() == 0,
    )
    logger.event("on_app_start", {"config": args.config_path})

    rng = jax.random.PRNGKey(tcfg.seed)
    shape = raw.get("image_or_video_shape", [1, 21, 16, 60, 104])

    # Per-host data sharding (reference DistributedSampler semantics): with
    # a process-spanning mesh each process contributes only its local rows
    # — prompt rows already differ per process (sharded loader) — and batch
    # arrays are assembled into global dp-sharded arrays.  Trainer-internal
    # randomness stays identical everywhere (same PRNG key on all hosts,
    # the functional analogue of the reference's rank-0 broadcasts).
    multiproc = mesh is not None and jax.process_count() > 1
    local_batch = shape[0]
    if multiproc:
        assert shape[0] % jax.process_count() == 0, (
            f"global batch {shape[0]} must divide over "
            f"{jax.process_count()} processes")
        local_batch = shape[0] // jax.process_count()

    def to_global(x):
        if not multiproc:
            return x
        from jax.experimental import multihost_utils as mh
        from jax.sharding import PartitionSpec as P

        return mh.host_local_array_to_global_array(np.asarray(x), mesh, P("dp"))

    t0 = time.time()
    while int(trainer.state["step"]) < max_iters:
        step = int(trainer.state["step"])
        if streaming:
            def new_sequence():
                row = next(prompt_iter)
                pc = encode(row["prompts"])
                pu = encode(neg_prompt)
                ps = encode(row["switch_prompts"]) if "switch_prompts" in row else None
                nonlocal rng
                rng, sub = jax.random.split(rng)
                trainer.start_new_sequence(pc, pu, sub, prompt_switch=ps)

            if not trainer.can_generate_more():
                new_sequence()
            metrics = trainer.streaming_train_step(rng, new_sequence_cb=new_sequence)
        else:
            row = next(prompt_iter)
            cc = encode(row["prompts"])
            cu = encode(neg_prompt)
            rng, sub = jax.random.split(rng)
            if multiproc:  # each host draws only its own batch shard
                sub = jax.random.fold_in(sub, jax.process_index())
            noise = jax.random.normal(
                sub, (local_batch, tcfg.num_training_frames, geom.channels,
                      geom.height, geom.width), jnp.float32)
            metrics = trainer.train_step(to_global(noise), to_global(cc),
                                         to_global(cu), rng)
        if step % log_iters == 0 or step < 3:
            metrics["wall_s"] = round(time.time() - t0, 1)
            print(metrics)
        logger.log(metrics, step=step)
        if step > 0 and step % log_iters == 0:
            trainer.finish_pending()  # quiesce the async critic update
            orbax_io.save_train_state(args.logdir, step, trainer.state, max_ckpts)
            if loader is not None:
                orbax_io.save_loader_state(args.logdir, step, loader.state())
        if vis_interval and step > 0 and step % vis_interval == 0:
            try:
                visualize(step)
            except Exception as e:  # non-fatal like the reference
                print(f"[vis] failed at step {step}: {e}")
    leftover = trainer.finish_pending()  # the final step's async grad norm
    if leftover:
        logger.log(leftover, step=int(trainer.state["step"]))
    orbax_io.save_train_state(args.logdir, int(trainer.state["step"]),
                              trainer.state, max_ckpts)
    if loader is not None:
        orbax_io.save_loader_state(args.logdir, int(trainer.state["step"]),
                                   loader.state())
    logger.event("on_app_end", {"final_step": int(trainer.state["step"])})


if __name__ == "__main__":
    main()
