"""Streaming long tuning (train-long-test-long).

Functional re-design of the reference ``StreamingTrainingModel``
(model/streaming_training.py:21-787) + ``Streaming(Switch)TrainingPipeline``
(pipeline/streaming_training.py, pipeline/streaming_switch_training.py):

Per sequence (length up to ``streaming_max_length``):
- chunk 1: generate ``chunk_size`` (21) fresh frames from noise;
- later chunks: generate ``new_frames`` (18) frames continuing the SAME KV
  cache, prepend ``overlap = 21 - new`` frames from the previous chunk so
  every supervised chunk is 21 frames (streaming_training.py:441-501);
- the overlapped chunk's first frame is re-encoded through the VAE
  (decode -> last pixel frame -> encode) to mimic inference-time image
  conditioning (streaming_training.py:79-119);
- gradient mask = newly generated frames only (streaming_training.py:514-524);
- DMDSwitch: when the sampled switch index falls inside a chunk, KV-recache
  the last 21 frames under the new prompt before generating
  (streaming_switch_training.py:244-318).

The reference's rank-0 broadcasts of (sequence length, new-frame count,
switch index) are replaced by shared-PRNG sampling.  All device state
(cache, previous frames) is threaded through pure jitted functions; the host
keeps only concrete arrays between steps.

Note (reference bug, not replicated): streaming_switch_training.py:33 reads
``global_sink`` off the ``*args`` tuple so it is silently always False; here
it is read from config (default False, matching the shipped behavior).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import dit as D
from ..models import vae as V
from ..ops import kv_cache as kvc
from ..pipeline.causal_inference import build_recache_fn
from . import dmd as dmd_mod
from . import rollout as ro
from .trainer import ScoreDistillationTrainer


@dataclasses.dataclass
class StreamingConfig:
    chunk_size: int = 21
    max_length: int = 240
    min_new_frame: int = 18
    switch_choices: Tuple[int, ...] = ()  # (longlive_train_long.yaml)
    global_sink: bool = False
    train_first_chunk: bool = True


class StreamingTrainer(ScoreDistillationTrainer):
    """Adds the streaming state machine on top of the DMD trainer."""

    def __init__(self, *args, streaming_cfg: StreamingConfig = StreamingConfig(),
                 vae_params: Optional[dict] = None,
                 vae_cfg: Optional[V.VAEConfig] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.scfg = streaming_cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg or V.VAEConfig()
        self.seq_state: Optional[Dict[str, Any]] = None
        self._gen_chunk_steps = {}
        self._critic_chunk_steps = {}
        self._stream_recache_fns = {}

    # -- sequence lifecycle -------------------------------------------------

    def start_new_sequence(
        self,
        prompt_c: jax.Array,  # [B, text_len, text_dim] T5 features
        prompt_u: jax.Array,
        rng: jax.Array,
        prompt_switch: Optional[jax.Array] = None,
        max_length: Optional[int] = None,
        batch: Optional[int] = None,
    ):
        """setup_sequence (streaming_training.py:282-395).  The cache batch
        follows the prompt batch (dp>1 data-parallel training)."""
        if batch is None:
            batch = prompt_c.shape[0]
        switch_idx = None
        if prompt_switch is not None and self.scfg.switch_choices:
            i = int(jax.random.randint(rng, (), 0, len(self.scfg.switch_choices)))
            switch_idx = int(self.scfg.switch_choices[i])
        self.seq_state = {
            "current_length": 0,
            "previous_frames": None,
            "has_switched": False,
            "temp_max_length": max_length or self.scfg.max_length,
            "prompt_c": prompt_c,
            "prompt_u": prompt_u,
            "prompt_switch": prompt_switch,
            "switch_frame_index": switch_idx,
            "cache": kvc.init_cache(
                self.cache_cfg, self.cfg.num_layers, batch, self.cfg.num_heads,
                self.cfg.head_dim,
                self.state["gen_params"]["patch_embedding"]["kernel"].dtype,
                k_int8=self.rcfg.cache_int8, v_int8=self.rcfg.cache_int8,
            ),
        }

    def can_generate_more(self) -> bool:
        s = self.seq_state
        return (s is not None and s["current_length"] +
                self.scfg.min_new_frame <= s["temp_max_length"])

    # -- pure chunk generation (traced) --------------------------------------

    def _reencode_first_frame(self, chunk: jax.Array) -> jax.Array:
        """streaming_training.py:79-119 (no-op without VAE params)."""
        if self.vae_params is None:
            return chunk
        keep = chunk.shape[1] - 1
        head = jax.lax.stop_gradient(chunk[:, :1])
        pixels = V.vae_decode(self.vae_params, self.vae_cfg, head, chunk=1)
        relatent = V.vae_encode(self.vae_params, self.vae_cfg, pixels[:, -1:])
        return jnp.concatenate(
            [jax.lax.stop_gradient(relatent).astype(chunk.dtype),
             chunk[:, -keep:]], axis=1)

    def _chunk_pure(self, gp, cache, prev_overlap, noise, cross, rng,
                    cur_start, exit_idx: int, grad: bool):
        """Rolls out `noise.shape[1]` new frames continuing `cache`; returns
        (supervised 21-frame chunk, new_cache, new_previous_frames)."""
        new_frames = noise.shape[1]
        grad_start = 0 if grad else new_frames + 1
        new_chunk, cache, _ = ro.rollout_trajectory(
            gp, self.cfg, self.cache_cfg, self.tables, self.sched, self.rcfg,
            noise, cross, rng, exit_idx, start_gradient_frame=grad_start,
            cache=cache, current_start_frame=cur_start,
        )
        cache = jax.lax.stop_gradient(cache)
        if prev_overlap is not None:
            full = jnp.concatenate(
                [jax.lax.stop_gradient(prev_overlap), new_chunk], axis=1)
        else:
            full = new_chunk
        new_prev = jax.lax.stop_gradient(full[:, -self.scfg.chunk_size:])
        if prev_overlap is not None:
            full = self._reencode_first_frame(full)
        return full, cache, new_prev

    # -- jitted train-step builders -------------------------------------------

    def _gen_chunk_step(self, exit_idx: int, new_frames: int, overlap: int):
        key = (exit_idx, new_frames, overlap)
        if key in self._gen_chunk_steps:
            return self._gen_chunk_steps[key]
        t_from, t_to = ro.denoised_timestep_bounds(self.sched, self.rcfg, exit_idx)

        def step(gen_train, gen_opt, gen_base, critic_train, critic_base,
                 teacher_params, cache, prev_overlap, noise, prompt, prompt_u,
                 cur_start, rng):
            rng_roll, rng_dmd = jax.random.split(rng)
            critic_params = self._critic_full(critic_train, critic_base)

            def loss_fn(gt):
                gp = self._gen_full(gt, gen_base)
                dtype = gp["patch_embedding"]["kernel"].dtype
                cross_gen = D.prepare_cross_kv(gp, self.cfg, prompt, dtype)
                chunk, new_cache, new_prev = self._chunk_pure(
                    gp, cache, prev_overlap, noise, cross_gen, rng_roll,
                    cur_start, exit_idx, grad=True)
                total = chunk.shape[1]
                gmask = jnp.broadcast_to(
                    jnp.arange(total)[None] >= overlap, chunk.shape[:2]
                ) if overlap > 0 else None
                loss, aux = dmd_mod.distribution_matching_loss(
                    chunk, critic_params, teacher_params, self.cfg,
                    self.tables, self.sched, self.dcfg, prompt, prompt_u,
                    rng_dmd, gradient_mask=gmask, denoised_from=t_from,
                    denoised_to=t_to, attn_impl=self.rcfg.attn_impl,
                    teacher_cfg=self.teacher_cfg)
                return loss, (aux, new_cache, new_prev)

            (loss, (aux, new_cache, new_prev)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(gen_train)
            if self.tcfg.opt_on_host:
                return grads, new_cache, new_prev, loss, aux
            updates, gen_opt = self.gen_tx.update(grads, gen_opt, gen_train)
            gen_train = optax.apply_updates(gen_train, updates)
            aux = dict(aux, generator_grad_norm=optax.global_norm(grads))
            return gen_train, gen_opt, new_cache, new_prev, loss, aux

        fn = jax.jit(step, donate_argnums=(0, 6) if self.tcfg.opt_on_host
                     else (0, 1, 6))
        self._gen_chunk_steps[key] = fn
        return fn

    def _critic_chunk_step(self, exit_idx: int, new_frames: int, overlap: int):
        key = (exit_idx, new_frames, overlap)
        if key in self._critic_chunk_steps:
            return self._critic_chunk_steps[key]
        t_from, t_to = ro.denoised_timestep_bounds(self.sched, self.rcfg, exit_idx)

        def step(critic_train, critic_opt, critic_base, gen_train, gen_base,
                 cache, prev_overlap, noise, prompt, cur_start, rng):
            rng_roll, rng_crit = jax.random.split(rng)
            gen_params = self._gen_full(gen_train, gen_base)
            dtype = gen_params["patch_embedding"]["kernel"].dtype
            cross_gen = D.prepare_cross_kv(gen_params, self.cfg, prompt, dtype)
            chunk, new_cache, new_prev = self._chunk_pure(
                gen_params, cache, prev_overlap, noise, cross_gen, rng_roll,
                cur_start, exit_idx, grad=False)
            chunk = jax.lax.stop_gradient(chunk)

            def loss_fn(ct):
                cp = self._critic_full(ct, critic_base)
                return dmd_mod.critic_denoising_loss(
                    cp, chunk, self.cfg, self.tables, self.sched, self.dcfg,
                    prompt, rng_crit, denoised_from=t_from, denoised_to=t_to,
                    attn_impl=self.rcfg.attn_impl)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                critic_train)
            if self.tcfg.opt_on_host:
                return grads, new_cache, new_prev, loss, aux
            updates, critic_opt = self.critic_tx.update(grads, critic_opt,
                                                        critic_train)
            critic_train = optax.apply_updates(critic_train, updates)
            aux = dict(aux, critic_grad_norm=optax.global_norm(grads))
            return critic_train, critic_opt, new_cache, new_prev, loss, aux

        fn = jax.jit(step, donate_argnums=(0, 5) if self.tcfg.opt_on_host
                     else (0, 1, 5))
        self._critic_chunk_steps[key] = fn
        return fn

    # -- staged-phase chunk builders (tcfg.staged_phases) --------------------
    #
    # Same 3-jit split as the parent trainer's staged DMD step (rollout fwd /
    # DMD loss grad wrt the chunk / rollout VJP), applied to the streaming
    # chunk step: the frozen teacher (+ critic base under LoRA) is paged to
    # host while the generator rolls the chunk forward and back.  Exact by
    # the chain rule — new_cache/new_prev are stop-gradded side outputs of
    # the forward, so only d(chunk) flows back through the VJP.

    def _chunk_latents_fn(self, exit_idx: int):
        def f(gen_train, gen_base, cache, prev_overlap, noise, prompt,
              cur_start, rng_roll):
            gp = self._gen_full(gen_train, gen_base)
            dtype = gp["patch_embedding"]["kernel"].dtype
            cross_gen = D.prepare_cross_kv(gp, self.cfg, prompt, dtype)
            return self._chunk_pure(gp, cache, prev_overlap, noise, cross_gen,
                                    rng_roll, cur_start, exit_idx, grad=True)

        return f

    def _staged_chunk_roll(self, key):
        # no donation: the input cache must survive for the VJP phase
        k = ("roll",) + key
        if k not in self._gen_chunk_steps:
            self._gen_chunk_steps[k] = jax.jit(self._chunk_latents_fn(key[0]))
        return self._gen_chunk_steps[k]

    def _staged_chunk_dmd(self, exit_idx: int, overlap: int,
                          use_real_x0: bool = False):
        k = ("dmd", exit_idx, overlap, use_real_x0)
        if k in self._gen_chunk_steps:
            return self._gen_chunk_steps[k]
        t_from, t_to = ro.denoised_timestep_bounds(self.sched, self.rcfg, exit_idx)

        def f(chunk, critic_train, critic_base, teacher_or_real, prompt,
              prompt_u, rng_dmd):
            critic_params = self._critic_full(critic_train, critic_base)
            total = chunk.shape[1]
            gmask = jnp.broadcast_to(
                jnp.arange(total)[None] >= overlap, chunk.shape[:2]
            ) if overlap > 0 else None

            def lf(ch):
                return dmd_mod.distribution_matching_loss(
                    ch, critic_params,
                    None if use_real_x0 else teacher_or_real, self.cfg,
                    self.tables, self.sched, self.dcfg, prompt, prompt_u,
                    rng_dmd, gradient_mask=gmask, denoised_from=t_from,
                    denoised_to=t_to, attn_impl=self.rcfg.attn_impl,
                    teacher_cfg=self.teacher_cfg,
                    real_x0=teacher_or_real if use_real_x0 else None)

            (loss, aux), dch = jax.value_and_grad(lf, has_aux=True)(chunk)
            return loss, aux, dch

        self._gen_chunk_steps[k] = jax.jit(f)
        return self._gen_chunk_steps[k]

    def _staged_chunk_vjp(self, key):
        k = ("vjp",) + key
        if k in self._gen_chunk_steps:
            return self._gen_chunk_steps[k]
        lat_f = self._chunk_latents_fn(key[0])

        def f(gen_train, gen_base, cache, prev_overlap, noise, prompt,
              cur_start, rng_roll, dchunk):
            def scalar(gt):
                chunk, _, _ = lat_f(gt, gen_base, cache, prev_overlap, noise,
                                    prompt, cur_start, rng_roll)
                return jnp.sum(chunk * dchunk)

            return jax.grad(scalar)(gen_train)

        # the VJP is the cache's last consumer — donate it
        self._gen_chunk_steps[k] = jax.jit(f, donate_argnums=(2,))
        return self._gen_chunk_steps[k]

    def _staged_chunk_croll(self, key):
        """Grad-free chunk forward for the critic fwdbwd (donates the cache —
        nothing else reads it)."""
        k = ("croll",) + key
        if k not in self._critic_chunk_steps:
            exit_idx = key[0]

            def f(gen_train, gen_base, cache, prev_overlap, noise, prompt,
                  cur_start, rng_roll):
                gp = self._gen_full(gen_train, gen_base)
                dtype = gp["patch_embedding"]["kernel"].dtype
                cross = D.prepare_cross_kv(gp, self.cfg, prompt, dtype)
                chunk, new_cache, new_prev = self._chunk_pure(
                    gp, cache, prev_overlap, noise, cross, rng_roll,
                    cur_start, exit_idx, grad=False)
                return jax.lax.stop_gradient(chunk), new_cache, new_prev

            self._critic_chunk_steps[k] = jax.jit(f, donate_argnums=(2,))
        return self._critic_chunk_steps[k]

    def _staged_chunk_cgrad(self, exit_idx: int):
        k = ("cgrad", exit_idx)
        if k in self._critic_chunk_steps:
            return self._critic_chunk_steps[k]
        t_from, t_to = ro.denoised_timestep_bounds(self.sched, self.rcfg, exit_idx)

        def f(critic_train, critic_base, chunk, prompt, rng_crit):
            def lf(ct):
                cp = self._critic_full(ct, critic_base)
                return dmd_mod.critic_denoising_loss(
                    cp, chunk, self.cfg, self.tables, self.sched, self.dcfg,
                    prompt, rng_crit, denoised_from=t_from, denoised_to=t_to,
                    attn_impl=self.rcfg.attn_impl)

            (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(
                critic_train)
            return grads, loss, aux

        self._critic_chunk_steps[k] = jax.jit(f)
        return self._critic_chunk_steps[k]

    def _gen_chunk_staged(self, key, gen_train, cache, prev_overlap, noise,
                          prompt, prompt_u, cur_start, rng):
        from ..utils import memory as mem_mod

        empty = {}
        rng_roll, rng_dmd = jax.random.split(rng)
        gen_base = self.state["gen_params"] if self.use_lora else empty
        chunk, new_cache, new_prev = self._staged_chunk_roll(key)(
            gen_train, gen_base, cache, prev_overlap, noise, prompt,
            cur_start, rng_roll)
        stream = self.tcfg.teacher_stream
        if stream:
            t_from, t_to = ro.denoised_timestep_bounds(
                self.sched, self.rcfg, key[0])
            teacher = dmd_mod.teacher_real_x0(
                self.teacher_params, self.teacher_cfg or self.cfg,
                self.tables, self.sched, self.dcfg, chunk, prompt, prompt_u,
                rng_dmd, denoised_from=t_from, denoised_to=t_to,
                attn_impl=self.rcfg.attn_impl, streamed=True)
        else:
            teacher = mem_mod.fetch_from_host(self.teacher_params)
        # land the pending async critic update (opt_async) before the
        # critic participates in the DMD loss grad — it has been hiding
        # behind the chunk-rollout dispatch above
        self._join_pending()
        critic_base = (mem_mod.fetch_from_host(self.state["critic_params"])
                       if self.critic_lora_on else empty)
        critic_train = self.state[
            "critic_lora" if self.critic_lora_on else "critic_params"]
        loss, aux, dch = self._staged_chunk_dmd(key[0], key[2], stream)(
            chunk, critic_train, critic_base, teacher, prompt, prompt_u,
            rng_dmd)
        dch.block_until_ready()  # the pages must not overlap the vjp peak
        del teacher, critic_base, chunk
        if self.tcfg.block_vjp:
            # the chunk's leading `overlap` frames are stop-grad context
            # (prev_overlap prepended / first-frame re-encode); the rollout
            # cotangent is the tail.  Per-block VJP continues the INPUT
            # cache from cur_start — exact (rollout.rollout_block).
            dch_roll = dch[:, key[2]:] if key[2] > 0 else dch
            grads = self._block_vjp_loop(
                key[0], 0, gen_train, gen_base, noise, prompt, rng_roll,
                dch_roll, cache=cache, cur_start=cur_start, map_slice=False)
        else:
            grads = self._staged_chunk_vjp(key)(
                gen_train, gen_base, cache, prev_overlap, noise, prompt,
                cur_start, rng_roll, dch)
        return grads, new_cache, new_prev, loss, aux

    def _critic_chunk_staged(self, key, critic_train_key, cache,
                             prev_overlap, noise, prompt, cur_start, rng):
        from ..utils import memory as mem_mod

        empty = {}
        rng_roll, rng_crit = jax.random.split(rng)
        gen_train = self.state["gen_lora" if self.use_lora else "gen_params"]
        gen_base = self.state["gen_params"] if self.use_lora else empty
        chunk, new_cache, new_prev = self._staged_chunk_croll(key)(
            gen_train, gen_base, cache, prev_overlap, noise, prompt,
            cur_start, rng_roll)
        # land the previous step's async critic update AFTER the chunk
        # rollout dispatch (which only needs the generator)
        self._join_pending()
        trained_c = self.state[critic_train_key]
        critic_base = (mem_mod.fetch_from_host(self.state["critic_params"])
                       if self.critic_lora_on else empty)
        grads, loss, aux = self._staged_chunk_cgrad(key[0])(
            trained_c, critic_base, chunk, prompt, rng_crit)
        jax.tree.leaves(grads)[0].block_until_ready()
        del critic_base, chunk
        return grads, new_cache, new_prev, loss, aux

    def _gen_params_now(self):
        """Generator params with adapters embedded (no merged copy) for
        host-level calls (recache, seed chunk)."""
        if not self.use_lora:
            return self.state["gen_params"]
        from . import lora as lora_mod

        return lora_mod.attach_lora(self.state["gen_params"],
                                    self.state["gen_lora"], self.lora_scale)

    def _plain_chunk_fn(self, exit_idx: int, new_frames: int, overlap: int):
        """Grad-free chunk advance (used when train_first_chunk=False: the
        first chunk only seeds the cache, trainer/distillation.py:1088-1098).
        """
        key = ("plain", exit_idx, new_frames, overlap)
        if key not in self._gen_chunk_steps:
            def step(gen_params, cache, prev_overlap, noise, prompt, cur_start, rng):
                dtype = gen_params["patch_embedding"]["kernel"].dtype
                cross = D.prepare_cross_kv(gen_params, self.cfg, prompt, dtype)
                chunk, new_cache, new_prev = self._chunk_pure(
                    gen_params, cache, prev_overlap, noise, cross, rng,
                    cur_start, exit_idx, grad=False)
                return new_cache, new_prev

            self._gen_chunk_steps[key] = jax.jit(step, donate_argnums=(1,))
        return self._gen_chunk_steps[key]

    def _streaming_recache_fn(self, num_frames: int):
        if num_frames not in self._stream_recache_fns:
            fn = build_recache_fn(
                self.cfg, self.cache_cfg, self.tables,
                float(self.rcfg.context_noise), num_frames,
                global_sink=self.scfg.global_sink, overwrite_sink=False,
                window_frames=self.rcfg.window_frames or self.cache_cfg.total_frames,
                attn_impl=self.rcfg.attn_impl,
            )
            self._stream_recache_fns[num_frames] = jax.jit(fn, donate_argnums=(1,))
        return self._stream_recache_fns[num_frames]

    # -- host orchestration -----------------------------------------------------

    def streaming_train_step(self, rng: jax.Array,
                             new_sequence_cb=None) -> Dict[str, Any]:
        """One streaming training step with the reference's cadence
        (trainer/distillation.py:1187-1257): the critic does a fwdbwd on
        EVERY step; the generator additionally every
        ``dfake_gen_update_ratio``-th optimizer step.  Each fwdbwd consumes
        one chunk of the streaming sequence (the reference's
        fwdbwd_one_step_streaming generates its own chunk per call).

        ``new_sequence_cb`` is invoked when the sequence is exhausted
        between the two fwdbwds (the reference starts a new sequence inside
        fwdbwd, :1067; here prompt encoding lives with the caller)."""
        micro = int(self.state["step"])
        accum = max(1, getattr(self.tcfg, "gradient_accumulation_steps", 1))
        opt_step = micro // accum
        train_generator = opt_step % self.tcfg.dfake_gen_update_ratio == 0
        rng = jax.random.fold_in(rng, micro)
        metrics: Dict[str, Any] = {"step": micro, "opt_step": opt_step}
        gen_m: Dict[str, Any] = {}
        if train_generator:
            gen_m = self._one_streaming_fwdbwd(True, jax.random.fold_in(rng, 1))
            if (micro + 1) % accum == 0:
                self._update_ema(opt_step)
            if not self.can_generate_more():
                if new_sequence_cb is None:
                    raise RuntimeError(
                        "sequence exhausted mid-step; pass new_sequence_cb")
                new_sequence_cb()
        crit_m = self._one_streaming_fwdbwd(False, jax.random.fold_in(rng, 2))
        # combine: losses keep their names; chunk-state keys reflect BOTH
        # fwdbwds (the generator's chunk state is prefixed)
        metrics.update({f"gen_{k}": v for k, v in gen_m.items()
                        if k not in ("generator_loss",)})
        if "generator_loss" in gen_m:
            metrics["generator_loss"] = gen_m["generator_loss"]
        metrics.update(crit_m)
        metrics["switched"] = bool(gen_m.get("switched", False)) or bool(
            crit_m["switched"])
        metrics["new_frames"] = gen_m.get("new_frames", 0) + crit_m["new_frames"]
        self.state["step"] = self.state["step"] + 1
        return metrics

    def _one_streaming_fwdbwd(self, train_generator: bool,
                              rng: jax.Array) -> Dict[str, Any]:
        """fwdbwd_one_step_streaming (trainer/distillation.py:1056-1170):
        generate the next chunk with the persistent cache and update one
        model."""
        assert self.seq_state is not None, "call start_new_sequence first"
        s = self.seq_state
        rng_sel, rng_exit, rng_noise, rng_step = jax.random.split(rng, 4)

        if not self.scfg.train_first_chunk and s["current_length"] == 0:
            # seed the cache with an untrained first chunk
            # (trainer/distillation.py:1088-1098)
            rng_seed = jax.random.fold_in(rng, 999)
            k1, k2, k3 = jax.random.split(rng_seed, 3)
            exit0 = ro.sample_exit_idx(k1, len(self.rcfg.denoise_timesteps),
                                       self.rcfg.last_step_only)
            batch = s["cache"].k.shape[1]
            nz = jax.random.normal(
                k2, (batch, self.scfg.chunk_size, self.geom.channels,
                     self.geom.height, self.geom.width), jnp.float32)
            fn = self._plain_chunk_fn(exit0, self.scfg.chunk_size, 0)
            s["cache"], s["previous_frames"] = fn(
                self._gen_params_now(), s["cache"], None, nz,
                s["prompt_c"], jnp.asarray(0, jnp.int32), k3)
            s["current_length"] = self.scfg.chunk_size

        # chunk sizing (streaming_training.py:438-480)
        cur = s["current_length"]
        prev = s["previous_frames"]
        if prev is None:
            new_frames, overlap = self.scfg.chunk_size, 0
        else:
            max_new = min(s["temp_max_length"] - cur + 1, self.scfg.chunk_size)
            choices = (list(range(self.scfg.min_new_frame, max_new, 3))
                       or [self.scfg.min_new_frame])
            new_frames = choices[int(jax.random.randint(rng_sel, (), 0, len(choices)))]
            overlap = self.scfg.chunk_size - new_frames
            if overlap > prev.shape[1]:
                overlap, new_frames = 0, self.scfg.chunk_size
        exit_idx = ro.sample_exit_idx(rng_exit, len(self.rcfg.denoise_timesteps),
                                      self.rcfg.last_step_only)

        # prompt switch (streaming_training.py:137-167, 227-251)
        si = s["switch_frame_index"]
        switching = (si is not None and not s["has_switched"]
                     and cur <= si < cur + new_frames)
        use_switch_prompt = si is not None and (s["has_switched"] or cur >= si or switching)
        prompt = s["prompt_switch"] if use_switch_prompt else s["prompt_c"]
        if switching and cur > 0 and prev is not None:
            n = min(self.scfg.chunk_size, prev.shape[1], cur)
            gen_full = self._gen_params_now()
            dtype = gen_full["patch_embedding"]["kernel"].dtype
            cross_new = D.prepare_cross_kv(gen_full, self.cfg, prompt, dtype)
            s["cache"] = self._streaming_recache_fn(n)(
                gen_full, s["cache"], cross_new, prev[:, -n:],
                jnp.asarray(cur - n, jnp.int32))
        if switching:
            s["has_switched"] = True

        batch = s["cache"].k.shape[1]
        noise = jax.random.normal(
            rng_noise, (batch, new_frames, self.geom.channels,
                        self.geom.height, self.geom.width), jnp.float32)
        prev_overlap = None if overlap == 0 else prev[:, -overlap:]
        cur_start = jnp.asarray(cur, jnp.int32)

        empty = {}
        gen_train_key = "gen_lora" if self.use_lora else "gen_params"
        critic_train_key = "critic_lora" if self.critic_lora_on else "critic_params"
        skey = (exit_idx, new_frames, overlap)
        if train_generator:
            trained = self.state[gen_train_key]
            if self.tcfg.staged_phases:
                grads, cache, new_prev, loss, aux = self._gen_chunk_staged(
                    skey, trained, s["cache"], prev_overlap, noise, prompt,
                    s["prompt_u"], cur_start, rng_step)
            else:
                self._join_pending()  # the monolithic gen jit reads the critic
                fn = self._gen_chunk_step(*skey)
                out = fn(
                    trained,
                    empty if self.tcfg.opt_on_host else self.state["gen_opt"],
                    self.state["gen_params"] if self.use_lora else empty,
                    self.state[critic_train_key],
                    self.state["critic_params"] if self.critic_lora_on else empty,
                    self.teacher_params, s["cache"], prev_overlap, noise,
                    prompt, s["prompt_u"], cur_start, rng_step)
            if self.tcfg.opt_on_host or self.tcfg.staged_phases:
                if not self.tcfg.staged_phases:
                    grads, cache, new_prev, loss, aux = out
                gt, aux = self._apply_update_eager(
                    "gen_opt", self.gen_tx, grads, trained,
                    self.tcfg.lr, self.tcfg.beta1, self.tcfg.beta2,
                    "generator_grad_norm", aux)
                del grads
            else:
                gt, gopt, cache, new_prev, loss, aux = out
                self.state["gen_opt"] = gopt
            self.state[gen_train_key] = gt
            metrics = {"generator_loss": float(loss)}
        else:
            if self.tcfg.staged_phases:
                grads, cache, new_prev, loss, aux = self._critic_chunk_staged(
                    skey, critic_train_key, s["cache"], prev_overlap, noise,
                    prompt, cur_start, rng_step)
            else:
                self._join_pending()
                fn = self._critic_chunk_step(*skey)
            trained_c = self.state[critic_train_key]  # post-join value
            if not self.tcfg.staged_phases:
                out = fn(
                    trained_c,
                    empty if self.tcfg.opt_on_host else self.state["critic_opt"],
                    self.state["critic_params"] if self.critic_lora_on else empty,
                    self.state[gen_train_key],
                    self.state["gen_params"] if self.use_lora else empty,
                    s["cache"], prev_overlap, noise, prompt, cur_start,
                    rng_step)
            if self.tcfg.opt_on_host or self.tcfg.staged_phases:
                if not self.tcfg.staged_phases:
                    grads, cache, new_prev, loss, aux = out
                ct, aux = self._apply_update_eager(
                    "critic_opt", self.critic_tx, grads, trained_c,
                    self.tcfg.lr_critic, self.tcfg.beta1_critic,
                    self.tcfg.beta2_critic, "critic_grad_norm", aux,
                    state_key=critic_train_key)
                del grads
            else:
                ct, copt, cache, new_prev, loss, aux = out
                self.state["critic_opt"] = copt
            self.state[critic_train_key] = ct
            metrics = {"critic_loss": float(loss)}

        s["cache"], s["previous_frames"] = cache, new_prev
        s["current_length"] = cur + new_frames
        metrics.update({k: float(v) for k, v in aux.items()})
        metrics.update({
            "exit_idx": exit_idx, "new_frames": new_frames,
            "overlap": overlap, "current_length": s["current_length"],
            "switched": switching,
        })
        return metrics
