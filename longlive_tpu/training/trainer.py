"""Score-distillation trainer (DMD / Self-Forcing init training).

Functional re-design of the reference ``Trainer`` (trainer/distillation.py):
- two AdamW optimizers (generator lr / critic lr, betas (beta1, beta2) from
  config — distillation.py:367-381);
- generator updates every ``dfake_gen_update_ratio`` steps, critic otherwise
  (distillation.py:1177);
- EMA of generator params (CPU-fp32 shadow in the reference,
  utils/distributed.py:91-125; host-resident fp32 numpy here by default,
  ema_on_host=False keeps it on device);
- FSDP: parameters sharded over the mesh `fsdp` axis via parallel.mesh rules;
  XLA inserts all-gather/reduce-scatter — no hand-written comm;
- all randomness from one PRNG key chain (identical on all hosts, replacing
  every rank-0 broadcast in the reference: distillation.py:712-735,
  base.py:144-146, self_forcing_training.py:76-93).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import CacheConfig, DiTConfig, LatentGeometry
from ..models import dit as D
from ..ops import scheduler as S
from ..ops.rope import make_rope_tables
from . import dmd as dmd_mod
from . import rollout as ro


@dataclasses.dataclass
class TrainerConfig:
    # optimization (longlive_train_init.yaml)
    lr: float = 2.0e-6
    lr_critic: float = 4.0e-7
    beta1: float = 0.0
    beta2: float = 0.999
    beta1_critic: float = 0.0
    beta2_critic: float = 0.999
    weight_decay: float = 0.01
    grad_clip_norm: float = 10.0
    dfake_gen_update_ratio: int = 5
    ema_weight: float = 0.99
    ema_start_step: int = 200
    # keep the EMA shadow as host-resident fp32 numpy (the reference's
    # EMA_FSDP is exactly a CPU-fp32 dict updated under summon_full_params,
    # utils/distributed.py:91-125); frees ~1.4 GB of HBM at LoRA r256 and
    # is required for full-geometry single-chip steps on 16 GB
    ema_on_host: bool = True
    # rollout / model
    denoising_step_list: Tuple[int, ...] = (1000, 750, 500, 250)
    warp_denoising_step: bool = True
    timestep_shift: float = 5.0
    guidance_scale: float = 3.0
    num_frame_per_block: int = 3
    num_training_frames: int = 21
    min_num_training_frames: int = 21
    slice_last_frames: int = 21
    context_noise: float = 0.0
    last_step_only: bool = False
    ts_schedule: bool = False
    ts_schedule_max: bool = False
    num_train_timestep: int = 1000
    # "train_auto": differentiable flash kernel on TPU (ops.attention
    # .flash_attention_trainable), XLA dense elsewhere
    attn_impl: str = "train_auto"
    seed: int = 0
    # LoRA adapters (reference adapter config, longlive_train_long.yaml:
    # rank/alpha 256 on generator + critic; 0 = full fine-tune)
    lora_rank: int = 0
    lora_alpha: float = 256.0
    lora_apply_to_critic: bool = True
    # adapter param dtype (reference adapter.dtype, longlive_train_long.
    # yaml:101 ships bfloat16); at r256 the adapters over all block linears
    # are ~540M params per model, so bf16 halves their HBM cost
    lora_dtype: str = "bfloat16"
    # run AdamW on the HOST (numpy f32 master + moments, device keeps only
    # the working-dtype trained params): ZeRO-Offload-style optimizer
    # offload, the lever that fits full-geometry 1.3B LoRA-r256 steps in
    # 16 GB — m+v+master f32 for gen+critic adapters alone is ~13 GB on
    # device.  Costs one grads D2H + params H2D per update.
    opt_on_host: bool = False
    # overlap the CRITIC's host AdamW with the next step's rollout: the
    # grad D2H + numpy math + new-param H2D run on a background thread and
    # the result lands (join) right before the next read of the critic
    # params — which is after the next step's rollout dispatch on the
    # staged paths, so the whole host update hides behind device compute.
    # Exact (same ops, deferred); the generator update stays synchronous
    # because the SAME step's critic rollout needs the updated generator
    # (reference order, trainer/distillation.py:1258-1298).  The reported
    # ``critic_grad_norm`` lags one step (it is produced inside the
    # deferred update).  Requires opt_on_host.
    opt_async: bool = False
    # store the rollout KV cache int8 (k and v, per-token scales): pure
    # memory lever for full-geometry single-chip steps — the cache is
    # stop-gradded context, so only forward values shift (≈0.03% latent
    # rel-RMS per the serving int8-K measurement); halves the largest
    # rollout residents (see training/rollout.py RolloutConfig.cache_int8)
    cache_int8: bool = False
    # split each DMD update into three jits — rollout fwd (generator
    # resident), DMD loss grad wrt latents (critic+teacher resident),
    # rollout vjp (generator resident) — and page the teacher + frozen
    # critic base to pinned host between them.  Removes ~5.2 GB (two bf16
    # 1.3B models) from the rollout phases' HBM residency, the remaining
    # lever for the 21-frame full-geometry single-chip step (PERF.md).
    # Exact by the chain rule (dL/dθ = (∂L/∂latents)ᵀ·∂latents/∂θ); costs
    # one extra grad-free rollout forward per generator update + ~5 GB of
    # host↔HBM paging per step.  Matches the reference's activation/teacher
    # offload levers (trainer/distillation.py offload flags).
    staged_phases: bool = False
    # stream the (frozen, fully stop-gradded) teacher's layer stack from
    # host during the loss-grad phase instead of paging the whole tree into
    # HBM: peak teacher residency becomes TWO layers.  The only way a 14B
    # teacher (config.py WAN_14B geometry; reference real_name=Wan2.1-T2V-14B)
    # fits next to the critic on a 16 GB chip.  The teacher side of the DMD
    # KL gradient is entirely inside stop_gradient, so precomputing its x0
    # prediction outside the loss jit is exact (dmd.teacher_real_x0).
    # Requires staged_phases.
    teacher_stream: bool = False
    # Page the GENERATOR (base + adapters) to pinned host during the
    # loss-grad phase: it is dead weight there (~3.7 GB at 1.3B LoRA —
    # the rollout forward is done, the rollout VJP hasn't started) while
    # the teacher + critic peak.  Costs one extra round trip of the
    # generator tree per generator step.  Requires staged_phases.
    page_generator: bool = False
    # Run the generator rollout VJP as an EAGER per-block loop instead of
    # one jit over the whole rollout.  Exact: the cache chain and the
    # re-noising RNG — every inter-block dependency — are stop-gradded, so
    # dL/dθ is the SUM of per-block exit-forward VJPs (rollout.rollout_block).
    # The monolithic VJP's backward saves each differentiated block's KV
    # cache input (~1.6 GB int8 × n_blocks): 21.6 GiB of temps at the
    # 21-frame 1.3B geometry (--mode mem_analysis) — the measured runtime
    # OOM.  Blockwise, peak = ONE block's residuals + the f32 grad
    # accumulator (~9 GiB).  Costs n_blocks dispatches per generator step.
    # Requires staged_phases.
    block_vjp: bool = False
    # micro-steps per optimizer update (longlive_train_init.yaml:34)
    gradient_accumulation_steps: int = 1
    # per-phase device-time ledger (VERDICT r4 item 4): brackets each staged
    # jit (rollout-fwd / teacher-x0 / DMD-loss-grad / rollout-VJP / critic
    # phases and the host<->HBM pages) with block_until_ready timing and
    # reports a ``phase_ms`` dict in the step metrics.  MEASUREMENT MODE:
    # the syncs serialize the async/paging overlap the production paths
    # hide work behind, so leave off for real runs.
    phase_ledger: bool = False


class TrainState(dict):
    """Pytree-friendly dict: {gen_params, critic_params, gen_opt, critic_opt,
    ema_params, step}."""


# -- host-offloaded AdamW (opt_on_host) -----------------------------------
#
# ZeRO-Offload-style optimizer residency: the f32 master params and Adam
# moments live in host RAM as numpy trees; the device holds only the
# working-dtype trained params.  Per update: grads D2H, numpy AdamW,
# new params H2D.  Matches optax.adamw(clip_by_global_norm(c)) numerics.


def host_adamw_init(trained_dev) -> dict:
    return {
        "m": jax.tree.map(lambda x: np.zeros(x.shape, np.float32), trained_dev),
        "v": jax.tree.map(lambda x: np.zeros(x.shape, np.float32), trained_dev),
        # np.array (not asarray): a zero-copy view of a f32 jax buffer is
        # read-only, and the update mutates master in place
        "master": jax.tree.map(lambda x: np.array(x, np.float32), trained_dev),
        "t": 0,
    }


def host_adamw_step(st: dict, grads_dev, *, lr, b1, b2, eps=1e-8,
                    weight_decay=0.0, clip=0.0, out_dtypes=None,
                    out_dtype=jnp.bfloat16):
    """In-place numpy AdamW over the host state; returns (new device
    params in ``out_dtypes`` per leaf — or ``out_dtype`` for all —,
    grad global-norm)."""
    leaves = jax.tree.leaves(grads_dev)
    for x in leaves:  # start ALL D2H copies before blocking on the first
        try:
            x.copy_to_host_async()
        except AttributeError:  # non-jax leaf (np array under tests)
            pass
    g = [np.asarray(x, np.float32) for x in leaves]
    gn = float(np.sqrt(sum(float((x.astype(np.float64) ** 2).sum()) for x in g)))
    scale = 1.0 if (clip <= 0.0 or gn <= clip) else clip / gn
    st["t"] += 1
    t = st["t"]
    bc1, bc2 = 1.0 - b1 ** t, 1.0 - b2 ** t
    ms, vs = jax.tree.leaves(st["m"]), jax.tree.leaves(st["v"])
    ps = jax.tree.leaves(st["master"])
    for gi, m, v, p in zip(g, ms, vs, ps):
        if scale != 1.0:
            gi = gi * scale
        m *= b1
        m += (1.0 - b1) * gi
        v *= b2
        v += (1.0 - b2) * np.square(gi)
        upd = (m / bc1) / (np.sqrt(v / bc2) + eps)
        if weight_decay:
            upd = upd + weight_decay * p
        p -= lr * upd
    treedef = jax.tree.structure(st["master"])
    if out_dtypes is None:
        out_dtypes = [out_dtype] * len(ps)
    new_dev = jax.tree.unflatten(
        treedef, [jnp.asarray(p, dt) for p, dt in zip(ps, out_dtypes)])
    return new_dev, gn


class _AsyncHostUpdate:
    """One in-flight ``host_adamw_step`` on a worker thread (opt_async).

    The D2H copies are STARTED on the calling thread (so they enqueue on
    the transfer stream before the caller dispatches the next step's
    device work); the norm/AdamW numpy math and the new-param H2D run on
    the worker.  ``join()`` returns ``(new_trained, grad_norm)`` and
    re-raises any worker exception.  At most one of these exists per
    optimizer (the trainer joins before starting the next update), so the
    in-place mutation of ``opt_state`` is race-free."""

    def __init__(self, opt_state: dict, grads_dev, kwargs: dict):
        import threading

        for x in jax.tree.leaves(grads_dev):
            try:
                x.copy_to_host_async()
            except AttributeError:  # non-jax leaf (np array under tests)
                pass
        self._box: dict = {}

        def _run():
            try:
                self._box["out"] = host_adamw_step(opt_state, grads_dev,
                                                   **kwargs)
            except BaseException as e:  # noqa: BLE001 — re-raised at join
                self._box["err"] = e

        self._t = threading.Thread(target=_run, daemon=True)
        self._t.start()

    def join(self):
        self._t.join()
        if "err" in self._box:
            raise self._box["err"]
        return self._box["out"]


class ScoreDistillationTrainer:
    def __init__(
        self,
        tcfg: TrainerConfig,
        dit_cfg: DiTConfig,
        geometry: LatentGeometry,
        gen_params: dict,
        critic_params: dict,
        teacher_params: dict,
        mesh=None,
        teacher_cfg: Optional[DiTConfig] = None,
        vae_params: Optional[dict] = None,
        vae_cfg=None,
    ):
        self.tcfg = tcfg
        self.cfg = dit_cfg
        self.geom = geometry
        self.mesh = mesh
        self.teacher_params = teacher_params
        # the DMD teacher may be a larger model (real_name, e.g. the 14B —
        # longlive_train_init.yaml:5-7); critic shares the generator's arch
        self.teacher_cfg = teacher_cfg or dit_cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg

        self.sched = S.make_schedule(
            1000, shift=tcfg.timestep_shift, sigma_min=0.0, extra_one_step=True,
            training=True,
        )
        steps = tcfg.denoising_step_list
        if tcfg.warp_denoising_step:
            steps = tuple(float(x) for x in S.warp_denoising_steps(self.sched, steps))
        window = None if dit_cfg.local_attn_size == -1 else dit_cfg.local_attn_size
        self.rcfg = ro.RolloutConfig(
            denoise_timesteps=steps,
            context_noise=tcfg.context_noise,
            frame_block=tcfg.num_frame_per_block,
            last_step_only=tcfg.last_step_only,
            attn_impl=tcfg.attn_impl,
            window_frames=window,
            cache_int8=tcfg.cache_int8,
        )
        self.dcfg = dmd_mod.DMDConfig(
            num_train_timestep=tcfg.num_train_timestep,
            timestep_shift=tcfg.timestep_shift,
            real_guidance_scale=tcfg.guidance_scale,
            ts_schedule=tcfg.ts_schedule,
            ts_schedule_max=tcfg.ts_schedule_max,
        )
        # training rollouts size the cache for the whole training window
        # (kv_frames = min(local+slice, num_training_frames),
        #  self_forcing_training.py:59-74)
        if dit_cfg.local_attn_size == -1:
            kv_frames = tcfg.num_training_frames
        else:
            kv_frames = min(dit_cfg.local_attn_size + tcfg.slice_last_frames,
                            tcfg.num_training_frames)
        self.cache_cfg = CacheConfig(
            sink_frames=dit_cfg.sink_size,
            ring_frames=kv_frames - dit_cfg.sink_size,
            frame_seq=geometry.frame_seq_length,
        )
        self.tables = make_rope_tables(dit_cfg.head_dim, dit_cfg.rope_max_pos)

        self.gen_tx = optax.chain(
            optax.clip_by_global_norm(tcfg.grad_clip_norm),
            optax.adamw(tcfg.lr, b1=tcfg.beta1, b2=tcfg.beta2,
                        weight_decay=tcfg.weight_decay),
        )
        self.critic_tx = optax.chain(
            optax.clip_by_global_norm(tcfg.grad_clip_norm),
            optax.adamw(tcfg.lr_critic, b1=tcfg.beta1_critic, b2=tcfg.beta2_critic,
                        weight_decay=tcfg.weight_decay),
        )
        if tcfg.gradient_accumulation_steps > 1:
            # grad accumulation: mean grads over k micro-steps, clip+update
            # applied on the k-th (reference scaled-loss loop,
            # distillation.py:853-875,1267-1295)
            self.gen_tx = optax.MultiSteps(
                self.gen_tx, tcfg.gradient_accumulation_steps)
            self.critic_tx = optax.MultiSteps(
                self.critic_tx, tcfg.gradient_accumulation_steps)

        from . import lora as lora_mod

        self.use_lora = tcfg.lora_rank > 0
        self.critic_lora_on = self.use_lora and tcfg.lora_apply_to_critic
        self.lora_scale = (tcfg.lora_alpha / tcfg.lora_rank) if self.use_lora else 1.0
        if self.use_lora:
            k1, k2 = jax.random.split(jax.random.PRNGKey(tcfg.seed + 17))
            ldt = jnp.dtype(tcfg.lora_dtype)
            gen_lora = lora_mod.init_lora(k1, gen_params, tcfg.lora_rank,
                                          dtype=ldt)
            critic_lora = (lora_mod.init_lora(k2, critic_params,
                                              tcfg.lora_rank, dtype=ldt)
                           if self.critic_lora_on else None)
            gen_trained, critic_trained = gen_lora, (
                critic_lora if self.critic_lora_on else critic_params)
        else:
            gen_lora = critic_lora = None
            gen_trained, critic_trained = gen_params, critic_params

        if tcfg.opt_on_host:
            if tcfg.gradient_accumulation_steps > 1:
                raise NotImplementedError(
                    "opt_on_host does not compose with optax.MultiSteps "
                    "accumulation; accumulate via dp batching instead")
            gen_opt = host_adamw_init(gen_trained)
            critic_opt = host_adamw_init(critic_trained)
        else:
            gen_opt = self.gen_tx.init(gen_trained)
            critic_opt = self.critic_tx.init(critic_trained)
        self.state = TrainState(
            gen_params=gen_params,
            critic_params=critic_params,
            gen_lora=gen_lora,
            critic_lora=critic_lora,
            gen_opt=gen_opt,
            critic_opt=critic_opt,
            # real copies on BOTH branches: astype/asarray of f32 leaves
            # would alias (host branch: zero-copy numpy VIEW of) buffers
            # that the jitted steps donate
            ema_params=jax.tree.map(
                (lambda x: np.array(x, np.float32)) if tcfg.ema_on_host
                else (lambda x: jnp.array(x, jnp.float32, copy=True)),
                gen_trained),
            step=jnp.zeros([], jnp.int32),
        )
        self._pending = None  # (state_key, norm_key, _AsyncHostUpdate)
        self._last_async_norms: Dict[str, float] = {}
        if tcfg.opt_async and not tcfg.opt_on_host:
            raise ValueError("opt_async requires opt_on_host")
        if tcfg.teacher_stream and not tcfg.staged_phases:
            raise ValueError("teacher_stream requires staged_phases")
        if tcfg.block_vjp and not tcfg.staged_phases:
            raise ValueError("block_vjp requires staged_phases")
        if tcfg.staged_phases:
            # the frozen trees leave HBM: teacher always, critic base when
            # only its adapters train.  train_step pages device copies in
            # for the loss-grad phase only — or, with teacher_stream, never
            # pages the teacher back at all (per-layer streaming).
            from ..utils import memory as mem_mod

            self.teacher_params = (
                mem_mod.blocks_to_host(self.teacher_params)
                if tcfg.teacher_stream
                else mem_mod.offload_to_host(self.teacher_params))
            if self.critic_lora_on:
                self.state["critic_params"] = mem_mod.offload_to_host(
                    self.state["critic_params"])

        from ..utils.profiling import PhaseTimer

        self.phase_timer = PhaseTimer() if tcfg.phase_ledger else None

        self._gen_steps = {}
        self._critic_steps = {}
        self._staged_rolls = {}
        self._staged_dmd = {}
        self._staged_vjps = {}
        self._staged_closs = {}
        self._block_vjps = {}

    # -- trainable-tree materialization ------------------------------------

    def _gen_full(self, trained, base):
        """Generator params from the trained tree: LoRA adapters embedded
        (lora.attach_lora — delta applied per layer inside the scanned
        body, never a full merged copy) or the trained tree itself."""
        from . import lora as lora_mod

        if self.use_lora:
            return lora_mod.attach_lora(base, trained, self.lora_scale)
        return trained

    def _critic_full(self, trained, base):
        from . import lora as lora_mod

        if self.critic_lora_on:
            return lora_mod.attach_lora(base, trained, self.lora_scale)
        return trained

    # -- jitted step builders --------------------------------------------

    def _rollout(self, gp, noise, cross_c, rng, exit_idx, grad_start):
        return ro.rollout_trajectory(
            gp, self.cfg, self.cache_cfg, self.tables, self.sched, self.rcfg,
            noise, cross_c, rng, exit_idx, start_gradient_frame=grad_start,
        )

    def _slice_reencode(self, latents):
        """The >slice_last_frames re-encode trick (base.py:163-183): decode
        everything before the last (slice-1) frames, re-encode the final
        pixel frame as a 1-frame image latent, concat with the tail."""
        from ..models import vae as V

        s = self.tcfg.slice_last_frames
        f = latents.shape[1]
        if s == -1 or f <= s or self.vae_params is None:
            return latents
        head = jax.lax.stop_gradient(latents[:, : f - (s - 1)])
        pixels = V.vae_decode(self.vae_params, self.vae_cfg, head, chunk=1)
        relatent = V.vae_encode(self.vae_params, self.vae_cfg, pixels[:, -1:])
        return jnp.concatenate(
            [jax.lax.stop_gradient(relatent).astype(latents.dtype),
             latents[:, -(s - 1):]], axis=1)

    def _gen_step_fn(self, exit_idx: int, grad_start: int, use_mask: bool):
        t_from, t_to = ro.denoised_timestep_bounds(self.sched, self.rcfg, exit_idx)

        def step(gen_train, gen_opt, gen_base, critic_train, critic_base,
                 teacher_params, noise, prompt_c, prompt_u, rng):
            rng_roll, rng_dmd = jax.random.split(rng)
            critic_params = self._critic_full(critic_train, critic_base)

            def loss_fn(gt):
                gp = self._gen_full(gt, gen_base)
                # generator-owned conditioning: grads flow into its text
                # embedding + cross projections through the rollout
                dtype = gp["patch_embedding"]["kernel"].dtype
                cross_gen = D.prepare_cross_kv(gp, self.cfg, prompt_c, dtype)
                latents, _, _ = self._rollout(gp, noise, cross_gen, rng_roll,
                                              exit_idx, grad_start)
                latents = self._slice_reencode(latents)
                gmask = None
                if use_mask:
                    f = latents.shape[1]
                    gmask = jnp.arange(f)[None] >= self.rcfg.frame_block
                    gmask = jnp.broadcast_to(gmask, latents.shape[:2])
                loss, aux = dmd_mod.distribution_matching_loss(
                    latents, critic_params, teacher_params, self.cfg,
                    self.tables, self.sched, self.dcfg, prompt_c, prompt_u,
                    rng_dmd, gradient_mask=gmask,
                    denoised_from=t_from, denoised_to=t_to,
                    attn_impl=self.rcfg.attn_impl, teacher_cfg=self.teacher_cfg,
                )
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(gen_train)
            if self.tcfg.opt_on_host:
                # grads come back to the host; AdamW runs there
                return grads, loss, aux
            updates, gen_opt = self.gen_tx.update(grads, gen_opt, gen_train)
            gen_train = optax.apply_updates(gen_train, updates)
            gnorm = optax.global_norm(grads)
            return gen_train, gen_opt, loss, dict(aux, generator_grad_norm=gnorm)

        return jax.jit(step, donate_argnums=(0, 1))

    def _critic_step_fn(self, exit_idx: int):
        t_from, t_to = ro.denoised_timestep_bounds(self.sched, self.rcfg, exit_idx)

        def step(critic_train, critic_opt, critic_base, gen_train, gen_base,
                 noise, prompt_c, rng):
            rng_roll, rng_crit = jax.random.split(rng)
            gen_params = self._gen_full(gen_train, gen_base)
            dtype = gen_params["patch_embedding"]["kernel"].dtype
            cross_gen = D.prepare_cross_kv(gen_params, self.cfg, prompt_c, dtype)
            latents, _, _ = self._rollout(
                gen_params, noise, cross_gen, rng_roll, exit_idx,
                grad_start=noise.shape[1] + 1,  # no grad anywhere
            )
            latents = jax.lax.stop_gradient(self._slice_reencode(latents))

            def loss_fn(ct):
                cp = self._critic_full(ct, critic_base)
                return dmd_mod.critic_denoising_loss(
                    cp, latents, self.cfg, self.tables, self.sched, self.dcfg,
                    prompt_c, rng_crit, denoised_from=t_from, denoised_to=t_to,
                    attn_impl=self.rcfg.attn_impl,
                )

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(critic_train)
            if self.tcfg.opt_on_host:
                return grads, loss, aux
            updates, critic_opt = self.critic_tx.update(grads, critic_opt, critic_train)
            critic_train = optax.apply_updates(critic_train, updates)
            gnorm = optax.global_norm(grads)
            return critic_train, critic_opt, loss, dict(aux, critic_grad_norm=gnorm)

        return jax.jit(step, donate_argnums=(0, 1))

    # -- staged-phase builders (tcfg.staged_phases) -------------------------
    #
    # The monolithic jits above hold generator, critic AND teacher in HBM
    # for the whole step.  The staged split runs three programs per
    # generator update — rollout fwd (generator resident), DMD loss grad
    # wrt latents (critic+teacher resident), rollout vjp (generator
    # resident) — with the frozen trees paged to pinned host in between.
    # Chain rule: dL/dθ = (∂L/∂latents)ᵀ · ∂latents/∂θ, so the composition
    # is exact up to bf16 scheduling differences between the grad-free and
    # differentiated rollout compilations (tests/test_training.py asserts
    # closeness vs the monolithic step at tiny config).

    def _latents_fn(self, exit_idx: int, grad_start: int):
        """Rollout → (sliced/re-encoded) latents as a pure function of the
        trained generator tree — the forward both staged rollout jits share."""

        def f(gen_train, gen_base, noise, prompt_c, rng_roll):
            gp = self._gen_full(gen_train, gen_base)
            dtype = gp["patch_embedding"]["kernel"].dtype
            cross_gen = D.prepare_cross_kv(gp, self.cfg, prompt_c, dtype)
            latents, _, _ = self._rollout(gp, noise, cross_gen, rng_roll,
                                          exit_idx, grad_start)
            return self._slice_reencode(latents)

        return f

    def _staged_roll(self, key):
        if key not in self._staged_rolls:
            self._staged_rolls[key] = jax.jit(self._latents_fn(*key))
        return self._staged_rolls[key]

    def _staged_dmd_grad(self, exit_idx: int, use_mask: bool,
                         use_real_x0: bool = False):
        key = (exit_idx, use_mask, use_real_x0)
        if key in self._staged_dmd:
            return self._staged_dmd[key]
        t_from, t_to = ro.denoised_timestep_bounds(self.sched, self.rcfg, exit_idx)

        def f(latents, critic_train, critic_base, teacher_or_real,
              prompt_c, prompt_u, rng_dmd):
            # teacher_or_real: the teacher param tree, or (teacher_stream)
            # its precomputed CFG-combined x0 prediction
            critic_params = self._critic_full(critic_train, critic_base)
            gmask = None
            if use_mask:
                fr = latents.shape[1]
                gmask = jnp.arange(fr)[None] >= self.rcfg.frame_block
                gmask = jnp.broadcast_to(gmask, latents.shape[:2])

            def lf(lat):
                return dmd_mod.distribution_matching_loss(
                    lat, critic_params,
                    None if use_real_x0 else teacher_or_real, self.cfg,
                    self.tables, self.sched, self.dcfg, prompt_c, prompt_u,
                    rng_dmd, gradient_mask=gmask,
                    denoised_from=t_from, denoised_to=t_to,
                    attn_impl=self.rcfg.attn_impl, teacher_cfg=self.teacher_cfg,
                    real_x0=teacher_or_real if use_real_x0 else None,
                )

            (loss, aux), dlat = jax.value_and_grad(lf, has_aux=True)(latents)
            return loss, aux, dlat

        self._staged_dmd[key] = jax.jit(f)
        return self._staged_dmd[key]

    def _staged_vjp(self, key):
        if key in self._staged_vjps:
            return self._staged_vjps[key]
        lat_f = self._latents_fn(*key)

        def f(gen_train, gen_base, noise, prompt_c, rng_roll, dlat):
            def scalar(gt):
                lat = lat_f(gt, gen_base, noise, prompt_c, rng_roll)
                return jnp.sum(lat * dlat)

            return jax.grad(scalar)(gen_train)

        self._staged_vjps[key] = jax.jit(f)
        return self._staged_vjps[key]

    def _block_vjp_step(self, exit_idx: int, grad_on: bool):
        """One block of the generator backward (tcfg.block_vjp): VJP of
        ``rollout_block``'s x0 against the block's dlat slice, grads
        accumulated f32 into a donated buffer, the (stop-grad) cache/rng
        carry advanced on device.  grad_on=False blocks only advance."""
        key = (exit_idx, grad_on)
        if key in self._block_vjps:
            return self._block_vjps[key]

        def f(gen_train, gen_base, x_blk, prompt_c, cache, rng, abs_start,
              dlat_blk, gacc):
            def scalar(gt):
                gp = self._gen_full(gt, gen_base)
                dtype = gp["patch_embedding"]["kernel"].dtype
                cross = D.prepare_cross_kv(gp, self.cfg, prompt_c, dtype)
                x0, c2, r2 = ro.rollout_block(
                    gp, self.cfg, self.cache_cfg, self.tables, self.sched,
                    self.rcfg, cross, x_blk, cache, rng, abs_start, exit_idx,
                    grad_on)
                return jnp.sum(x0.astype(jnp.float32) * dlat_blk), (c2, r2)

            if grad_on:
                (_, (c2, r2)), g = jax.value_and_grad(
                    scalar, has_aux=True)(gen_train)
                gacc = jax.tree.map(
                    lambda a, b: a + b.astype(jnp.float32), gacc, g)
            else:
                _, (c2, r2) = scalar(gen_train)
            return gacc, c2, r2

        self._block_vjps[key] = jax.jit(f, donate_argnums=(4, 8))
        return self._block_vjps[key]

    def _block_vjp_loop(self, exit_idx: int, grad_start: int, trained,
                        gen_base, noise, prompt_c, rng_roll, dlat,
                        cache=None, cur_start=0, map_slice=True):
        """Eager per-block generator VJP (exact: see rollout.rollout_block
        — the cache chain and re-noising RNG are stop-gradded, so block
        gradient contributions are additive).  ``cache``/``cur_start``
        continue an ongoing sequence (the streaming chunk step);
        ``map_slice=False`` when the caller already mapped the cotangent
        back to rollout frames.  ``dlat`` must cover exactly the rollout's
        ``noise.shape[1]`` frames after mapping."""
        from ..ops import kv_cache as kvc

        f_total = noise.shape[1]
        fpb = self.rcfg.frame_block
        s_cfg = self.tcfg.slice_last_frames
        if (map_slice and s_cfg != -1 and f_total > s_cfg
                and self.vae_params is not None):
            # undo _slice_reencode on the cotangent: its frame 0 is the
            # stop-grad re-encoded latent (zero cotangent for the rollout);
            # frames 1..s-1 are the rollout's last s-1 frames verbatim
            z = jnp.zeros(
                (dlat.shape[0], f_total - (s_cfg - 1)) + dlat.shape[2:],
                dlat.dtype)
            dlat = jnp.concatenate([z, dlat[:, 1:]], axis=1)
        dtype = (gen_base if self.use_lora else
                 trained)["patch_embedding"]["kernel"].dtype
        if cache is None:
            cache = kvc.init_cache(
                self.cache_cfg, self.cfg.num_layers, noise.shape[0],
                self.cfg.num_heads, self.cfg.head_dim, dtype,
                k_int8=self.rcfg.cache_int8, v_int8=self.rcfg.cache_int8)
        gacc = jax.tree.map(lambda x: jnp.zeros(x.shape, jnp.float32),
                            trained)
        rng = rng_roll
        for s in range(0, f_total, fpb):
            fn = self._block_vjp_step(exit_idx, s >= grad_start)
            gacc, cache, rng = fn(
                trained, gen_base, noise[:, s : s + fpb], prompt_c, cache,
                rng, jnp.asarray(s, jnp.int32) + cur_start,
                dlat[:, s : s + fpb], gacc)
        return gacc

    def _staged_critic_grad(self, exit_idx: int):
        if exit_idx in self._staged_closs:
            return self._staged_closs[exit_idx]
        t_from, t_to = ro.denoised_timestep_bounds(self.sched, self.rcfg, exit_idx)

        def f(critic_train, critic_base, latents, prompt_c, rng_crit):
            def lf(ct):
                cp = self._critic_full(ct, critic_base)
                return dmd_mod.critic_denoising_loss(
                    cp, latents, self.cfg, self.tables, self.sched, self.dcfg,
                    prompt_c, rng_crit, denoised_from=t_from, denoised_to=t_to,
                    attn_impl=self.rcfg.attn_impl,
                )

            (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(critic_train)
            return grads, loss, aux

        self._staged_closs[exit_idx] = jax.jit(f)
        return self._staged_closs[exit_idx]

    def _ph(self, name: str, sync=None):
        """Ledger bracket (tcfg.phase_ledger): times the enclosed phase with
        a device sync; a zero-cost nullcontext when the ledger is off."""
        import contextlib

        if self.phase_timer is None:
            return contextlib.nullcontext()
        return self.phase_timer.phase(name, sync_on=sync)

    def _ph_sync(self, x):
        if self.phase_timer is not None and x is not None:
            jax.block_until_ready(x)

    def _gen_step_staged(self, exit_idx, grad_start, use_mask, trained,
                         noise, prompt_c, prompt_u, rng):
        from ..utils import memory as mem_mod

        empty = {}
        rng_roll, rng_dmd = jax.random.split(rng)
        gen_base = self.state["gen_params"] if self.use_lora else empty
        rkey = (exit_idx, grad_start)
        with self._ph("gen_rollout_fwd"):
            latents = self._staged_roll(rkey)(trained, gen_base, noise,
                                              prompt_c, rng_roll)
            self._ph_sync(latents)
        gen_host = None
        gkey = "gen_lora" if self.use_lora else "gen_params"
        if self.tcfg.page_generator:
            # the generator is dead weight during the teacher+critic phase;
            # drop EVERY device reference (ours and the state's) so its HBM
            # actually frees, keeping host copies to restore afterwards
            with self._ph("gen_page_out"):
                latents.block_until_ready()
                gen_host = (mem_mod.offload_to_host(trained),
                            mem_mod.offload_to_host(gen_base)
                            if self.use_lora else empty)
                jax.block_until_ready(gen_host)
            self.state[gkey] = None
            if self.use_lora:
                self.state["gen_params"] = None
            trained = gen_base = None
        stream = self.tcfg.teacher_stream
        if stream:
            # layer-streamed teacher x0 prediction (14B teacher path): the
            # blocks never co-reside with the critic
            with self._ph("teacher_x0_streamed"):
                t_from, t_to = ro.denoised_timestep_bounds(
                    self.sched, self.rcfg, exit_idx)
                teacher = dmd_mod.teacher_real_x0(
                    self.teacher_params, self.teacher_cfg or self.cfg,
                    self.tables, self.sched, self.dcfg, latents, prompt_c,
                    prompt_u, rng_dmd, denoised_from=t_from, denoised_to=t_to,
                    attn_impl=self.rcfg.attn_impl, streamed=True)
                self._ph_sync(teacher)
        else:
            with self._ph("teacher_fetch"):
                teacher = mem_mod.fetch_from_host(self.teacher_params)
                self._ph_sync(teacher)
        # the pending async critic update (opt_async) has been hiding
        # behind the rollout dispatch above; it must land before the
        # critic participates in the DMD loss grad
        self._join_pending()
        critic_base = (mem_mod.fetch_from_host(self.state["critic_params"])
                       if self.critic_lora_on else empty)
        critic_train = self.state[
            "critic_lora" if self.critic_lora_on else "critic_params"]
        with self._ph("dmd_loss_grad"):
            loss, aux, dlat = self._staged_dmd_grad(exit_idx, use_mask, stream)(
                latents, critic_train, critic_base, teacher,
                prompt_c, prompt_u, rng_dmd)
            dlat.block_until_ready()  # the pages must not overlap the vjp peak
        del teacher, critic_base, latents
        if gen_host is not None:
            with self._ph("gen_page_in"):
                trained = mem_mod.fetch_from_host(gen_host[0])
                gen_base = (mem_mod.fetch_from_host(gen_host[1])
                            if self.use_lora else empty)
                self._ph_sync((trained, gen_base))
            self.state[gkey] = trained
            if self.use_lora:
                self.state["gen_params"] = gen_base
        with self._ph("gen_rollout_vjp"):
            if self.tcfg.block_vjp:
                grads = self._block_vjp_loop(exit_idx, grad_start, trained,
                                             gen_base, noise, prompt_c,
                                             rng_roll, dlat)
            else:
                grads = self._staged_vjp(rkey)(trained, gen_base, noise,
                                               prompt_c, rng_roll, dlat)
            self._ph_sync(grads)
        return grads, loss, aux, trained

    def _critic_step_staged(self, exit_idx, critic_train_key, noise,
                            prompt_c, rng):
        from ..utils import memory as mem_mod

        empty = {}
        rng_roll, rng_crit = jax.random.split(rng)
        gen_train = self.state["gen_lora" if self.use_lora else "gen_params"]
        gen_base = self.state["gen_params"] if self.use_lora else empty
        rkey = (exit_idx, noise.shape[1] + 1)  # no grad anywhere
        with self._ph("critic_rollout_fwd"):
            latents = self._staged_roll(rkey)(gen_train, gen_base, noise,
                                              prompt_c, rng_roll)
            self._ph_sync(latents)
        # land the previous step's async critic update AFTER the rollout
        # dispatch (the rollout only needs the generator) — the host AdamW
        # has been running behind it since the last step
        self._join_pending()
        trained_c = self.state[critic_train_key]
        critic_base = (mem_mod.fetch_from_host(self.state["critic_params"])
                       if self.critic_lora_on else empty)
        with self._ph("critic_loss_grad"):
            grads, loss, aux = self._staged_critic_grad(exit_idx)(
                trained_c, critic_base, latents, prompt_c, rng_crit)
            jax.tree.leaves(grads)[0].block_until_ready()
            self._ph_sync(grads)
        del critic_base, latents
        return grads, loss, aux

    def _join_pending(self):
        """Land the in-flight async critic update (opt_async), installing
        the new trained params into ``self.state`` and stashing the grad
        norm for the NEXT step's metrics.  No-op when nothing is pending.
        Must run before ANY read of the pending params — the staged paths
        call it right after dispatching the next rollout, which is where
        the overlap comes from."""
        if self._pending is None:
            return
        state_key, norm_key, fut = self._pending
        self._pending = None
        new_t, gnorm = fut.join()
        self.state[state_key] = new_t
        self._last_async_norms[norm_key] = gnorm

    def finish_pending(self):
        """Quiesce: land any in-flight async update before reading
        ``self.state`` directly (checkpoint save, end of training).
        Returns ``{norm_key: value}`` for grad norms that have landed but
        were never reported through a later step's metrics — without this
        the final step's critic grad norm would be silently dropped."""
        self._join_pending()
        out = {k: float(v) for k, v in self._last_async_norms.items()}
        self._last_async_norms.clear()
        return out

    def _apply_update_eager(self, opt_key: str, tx, grads, trained,
                            lr: float, b1: float, b2: float,
                            norm_key: str, aux: dict, state_key=None):
        """Eager optimizer application shared by the staged-phases and
        opt-on-host paths of BOTH trainers' generator and critic updates
        (the monolithic path applies its update inside the train-step jit
        instead).  Mutates ``self.state[opt_key]`` and returns
        (new_trained, aux + grad norm).

        With ``opt_async`` and a ``state_key``, the host update is instead
        launched on a worker thread; the future lives ONLY in
        ``self._pending`` (never in ``self.state``, which keeps holding the
        still-valid pre-update tree) and ``_join_pending`` installs the new
        params into ``self.state[state_key]`` at the next read point.  The
        grad norm then appears in the NEXT step's aux (lagged by one
        step)."""
        ph = self._ph("opt_" + norm_key.replace("_grad_norm", ""))
        ph.__enter__()
        try:
            return self._apply_update_eager_inner(
                opt_key, tx, grads, trained, lr, b1, b2, norm_key, aux,
                state_key)
        finally:
            ph.__exit__(None, None, None)

    def _apply_update_eager_inner(self, opt_key, tx, grads, trained, lr, b1,
                                  b2, norm_key, aux, state_key=None):
        if self.tcfg.opt_on_host:
            dtypes = [x.dtype for x in jax.tree.leaves(trained)]
            kwargs = dict(lr=lr, b1=b1, b2=b2,
                          weight_decay=self.tcfg.weight_decay,
                          clip=self.tcfg.grad_clip_norm, out_dtypes=dtypes)
            if self.tcfg.opt_async and state_key is not None:
                assert self._pending is None, "one async update at a time"
                fut = _AsyncHostUpdate(self.state[opt_key], grads, kwargs)
                self._pending = (state_key, norm_key, fut)
                out_aux = dict(aux)
                prev = self._last_async_norms.pop(norm_key, None)
                if prev is not None:
                    out_aux[norm_key] = prev
                # state keeps the pre-update params (a valid pytree) until
                # _join_pending installs the landed ones — a reader that
                # misses a join sees one-step-stale params, never a future
                return trained, out_aux
            new_t, gnorm = host_adamw_step(
                self.state[opt_key], grads, **kwargs)
        else:
            updates, self.state[opt_key] = tx.update(
                grads, self.state[opt_key], trained)
            new_t = optax.apply_updates(trained, updates)
            gnorm = optax.global_norm(grads)
        self._ph_sync(new_t)
        return new_t, dict(aux, **{norm_key: gnorm})

    # -- public API --------------------------------------------------------

    def _sample_rollout_geometry(self, noise, rng_exit, rng_len):
        """Random exit step + rollout length (base.py:136-154)."""
        exit_idx = ro.sample_exit_idx(
            rng_exit, len(self.rcfg.denoise_timesteps), self.rcfg.last_step_only)
        fpb = self.rcfg.frame_block
        max_b = min(self.tcfg.num_training_frames // fpb, noise.shape[1] // fpb)
        min_b = min(self.tcfg.min_num_training_frames // fpb, max_b)
        nb = (min_b if min_b >= max_b else
              int(jax.random.randint(rng_len, (), min_b, max_b + 1)))
        return exit_idx, nb, nb != min_b

    def train_step(
        self, noise: jax.Array, prompt_c: jax.Array, prompt_u: jax.Array,
        rng: jax.Array,
    ) -> Dict[str, Any]:
        """One fwdbwd micro-step, matching the reference's cadence
        (distillation.py:1258-1298): the critic is trained on EVERY step;
        the generator additionally every ``dfake_gen_update_ratio``-th
        *optimizer* step.  With ``gradient_accumulation_steps`` = k > 1 the
        optimizers are optax.MultiSteps-wrapped, so k consecutive calls
        accumulate (mean) gradients and apply one update on the k-th —
        the reference's scaled-loss accumulation loop (:1110,:1162)."""
        micro = int(self.state["step"])
        accum = max(1, self.tcfg.gradient_accumulation_steps)
        opt_step = micro // accum
        train_generator = opt_step % self.tcfg.dfake_gen_update_ratio == 0
        rng = jax.random.fold_in(rng, micro)
        rng_exit, rng_len, rng_g, rng_exit2, rng_len2, rng_c = jax.random.split(rng, 6)

        fpb = self.rcfg.frame_block
        metrics: Dict[str, Any] = {"step": micro, "opt_step": opt_step}
        empty = {}
        gen_train_key = "gen_lora" if self.use_lora else "gen_params"
        critic_train_key = "critic_lora" if self.critic_lora_on else "critic_params"
        if train_generator:
            exit_idx, nb, use_mask = self._sample_rollout_geometry(
                noise, rng_exit, rng_len)
            if self.tcfg.staged_phases:
                # no local binding of the generator tree: _gen_step_staged
                # may page it out mid-step (page_generator), and a caller
                # reference would pin the HBM it frees
                grads, loss, aux, trained = self._gen_step_staged(
                    exit_idx, 0, use_mask, self.state[gen_train_key],
                    noise[:, : nb * fpb], prompt_c, prompt_u, rng_g)
            else:
                self._join_pending()  # the monolithic gen jit reads the critic
                trained = self.state[gen_train_key]
                key = (exit_idx, 0, use_mask)
                if key not in self._gen_steps:
                    self._gen_steps[key] = self._gen_step_fn(*key)
                args = (
                    trained,
                    empty if self.tcfg.opt_on_host else self.state["gen_opt"],
                    self.state["gen_params"] if self.use_lora else empty,
                    self.state[critic_train_key],
                    self.state["critic_params"] if self.critic_lora_on else empty,
                    self.teacher_params, noise[:, : nb * fpb], prompt_c,
                    prompt_u, rng_g,
                )
            if self.tcfg.opt_on_host or self.tcfg.staged_phases:
                if not self.tcfg.staged_phases:
                    grads, loss, aux = self._gen_steps[key](*args)
                gt, aux = self._apply_update_eager(
                    "gen_opt", self.gen_tx, grads, trained,
                    self.tcfg.lr, self.tcfg.beta1, self.tcfg.beta2,
                    "generator_grad_norm", aux)
                del grads
            else:
                gt, gopt, loss, aux = self._gen_steps[key](*args)
                self.state["gen_opt"] = gopt
            self.state[gen_train_key] = gt
            metrics.update({"generator_loss": float(loss), "exit_idx": exit_idx,
                            "rollout_frames": nb * fpb,
                            **{k: float(v) for k, v in aux.items()}})
            if (micro + 1) % accum == 0:
                self._update_ema(opt_step)

        # critic trains every step, on its own rollout of the same prompts
        # (reference fwdbwd_one_step(batch, False) after the generator pass)
        exit_c, nb_c, _ = self._sample_rollout_geometry(noise, rng_exit2, rng_len2)
        if self.tcfg.staged_phases:
            cgrads, closs, caux = self._critic_step_staged(
                exit_c, critic_train_key, noise[:, : nb_c * fpb], prompt_c,
                rng_c)
            trained_c = self.state[critic_train_key]  # post-join value
        else:
            self._join_pending()
            trained_c = self.state[critic_train_key]
            if exit_c not in self._critic_steps:
                self._critic_steps[exit_c] = self._critic_step_fn(exit_c)
            cargs = (
                trained_c,
                empty if self.tcfg.opt_on_host else self.state["critic_opt"],
                self.state["critic_params"] if self.critic_lora_on else empty,
                self.state[gen_train_key],
                self.state["gen_params"] if self.use_lora else empty,
                noise[:, : nb_c * fpb], prompt_c, rng_c,
            )
        if self.tcfg.opt_on_host or self.tcfg.staged_phases:
            if self.tcfg.staged_phases:
                grads, loss, aux = cgrads, closs, caux
                del cgrads
            else:
                grads, loss, aux = self._critic_steps[exit_c](*cargs)
            ct, aux = self._apply_update_eager(
                "critic_opt", self.critic_tx, grads, trained_c,
                self.tcfg.lr_critic, self.tcfg.beta1_critic,
                self.tcfg.beta2_critic, "critic_grad_norm", aux,
                state_key=critic_train_key)
            del grads
        else:
            ct, copt, loss, aux = self._critic_steps[exit_c](*cargs)
            self.state["critic_opt"] = copt
        self.state[critic_train_key] = ct
        metrics.update({"critic_loss": float(loss), "critic_exit_idx": exit_c,
                        **{k: float(v) for k, v in aux.items()}})
        if self.phase_timer is not None:
            # per-step ledger: phase -> ms this step (VERDICT r4 item 4)
            metrics["phase_ms"] = {
                k: round(sum(v) * 1e3, 1)
                for k, v in self.phase_timer.phases.items()}
            self.phase_timer.phases.clear()
        self.state["step"] = self.state["step"] + 1
        return metrics

    def _update_ema(self, step: int):
        trained = self.state["gen_lora" if self.use_lora else "gen_params"]
        on_host = self.tcfg.ema_on_host
        if step < self.tcfg.ema_start_step:
            # np.array (copy), NOT np.asarray: a zero-copy view of an f32
            # CPU-backend leaf would alias a buffer the train-step jits
            # donate on the next step
            self.state["ema_params"] = jax.tree.map(
                (lambda x: np.array(x, np.float32)) if on_host
                else (lambda x: jnp.array(x, jnp.float32, copy=True)), trained)
            return
        w = self.tcfg.ema_weight
        if on_host:
            # host-side update (reference EMA_FSDP semantics): one D2H copy
            # of the trained tree per EMA step, zero HBM for the shadow
            self.state["ema_params"] = jax.tree.map(
                lambda e, p: w * e + (1 - w) * np.asarray(p, np.float32),
                self.state["ema_params"], trained,
            )
            return
        self.state["ema_params"] = jax.tree.map(
            lambda e, p: w * e + (1 - w) * p.astype(jnp.float32),
            self.state["ema_params"], trained,
        )
