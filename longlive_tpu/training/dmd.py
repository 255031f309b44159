"""Distribution Matching Distillation losses.

Functional port of the reference DMD model (model/dmd.py:14-392):

- generator loss = 0.5 * MSE(x, stopgrad(x - kl_grad)) where
  kl_grad = (fake_x0 - real_x0_cfg) / normalizer, computed at a random
  shift-warped timestep clamped to [0.02, 0.98]*1000 and optionally to the
  rollout's exit-step range (ts_schedule) — dmd.py:60-200;
- critic loss = flow-matching denoising loss of the critic's prediction on
  generator samples at a random timestep — dmd.py:272-392 with
  `denoising_loss_type: flow` (utils/loss.py:76-89);
- CFG on the real score with guidance_scale (3.0 in shipped configs),
  fake_guidance_scale = 0 — dmd.py:44-49, 80-116.

Teacher (`real_score`) and critic (`fake_score`) are bidirectional WanModels
with one shared timestep per sample (uniform_timestep, base.py:51-74).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DiTConfig
from ..models import dit as D
from ..models.dit_bidirectional import bidirectional_forward
from ..ops import scheduler as S
from ..ops.rope import RopeTables


@dataclasses.dataclass(frozen=True)
class DMDConfig:
    num_train_timestep: int = 1000
    timestep_shift: float = 5.0
    real_guidance_scale: float = 3.0
    fake_guidance_scale: float = 0.0
    ts_schedule: bool = False  # shipped configs: false (longlive_train_init.yaml)
    ts_schedule_max: bool = False
    min_score_timestep: int = 0

    @property
    def min_step(self) -> int:
        return int(0.02 * self.num_train_timestep)

    @property
    def max_step(self) -> int:
        return int(0.98 * self.num_train_timestep)


def _sample_score_timestep(
    rng: jax.Array,
    dcfg: DMDConfig,
    batch: int,
    num_frames: int,
    denoised_from: Optional[int],
    denoised_to: Optional[int],
) -> jax.Array:
    """Uniform per-sample timestep, shift-warped + clamped
    (dmd.py:159-176, base.py:51-74)."""
    min_t = denoised_to if (dcfg.ts_schedule and denoised_to is not None) else dcfg.min_score_timestep
    max_t = denoised_from if (dcfg.ts_schedule_max and denoised_from is not None) else dcfg.num_train_timestep
    t = jax.random.randint(rng, (batch, 1), min_t, max_t).astype(jnp.float32)
    t = jnp.broadcast_to(t, (batch, num_frames))
    if dcfg.timestep_shift > 1:
        s = dcfg.timestep_shift
        t = s * (t / 1000.0) / (1 + (s - 1) * (t / 1000.0)) * 1000.0
    return jnp.clip(t, dcfg.min_step, dcfg.max_step)


def _score_noisy(
    rng: jax.Array,
    dcfg: DMDConfig,
    sched: S.FlowMatchSchedule,
    x: jax.Array,  # [B, F, C, H, W]
    denoised_from: Optional[int],
    denoised_to: Optional[int],
) -> Tuple[jax.Array, jax.Array]:
    """The (noisy, t) pair both score models see.  Factored out so a
    host-streamed teacher pass (teacher_real_x0) can reproduce EXACTLY the
    noising the in-loss path samples — the rng split here must stay in
    lockstep with distribution_matching_loss."""
    b, f = x.shape[:2]
    rng_t, rng_n = jax.random.split(rng)
    t = _sample_score_timestep(rng_t, dcfg, b, f, denoised_from, denoised_to)
    noise = jax.random.normal(rng_n, x.shape, jnp.float32)
    noisy = S.add_noise(
        sched, x.reshape(b * f, *x.shape[2:]),
        noise.reshape(b * f, *x.shape[2:]), t.reshape(-1)
    ).reshape(x.shape)
    return noisy, t


def _x0_pred_bidirectional(
    params, cfg, tables, sched, noisy, t, cross_kv, attn_impl,
    remat_layers=False
) -> jax.Array:
    """flow pred -> x0 (wan_wrapper.py:247-295; uniform timestep -> t[:,0])."""
    flow = bidirectional_forward(params, cfg, tables, noisy, t[:, 0], cross_kv,
                                 attn_impl=attn_impl,
                                 remat_layers=remat_layers)
    b, f = noisy.shape[:2]
    return S.convert_flow_to_x0(
        sched, flow.reshape(b * f, *flow.shape[2:]),
        noisy.reshape(b * f, *noisy.shape[2:]).astype(jnp.float32),
        t.reshape(-1),
    ).reshape(flow.shape)


def teacher_real_x0(
    teacher_params: dict,
    teacher_cfg: DiTConfig,
    tables: RopeTables,
    sched: S.FlowMatchSchedule,
    dcfg: DMDConfig,
    gen_latents: jax.Array,
    prompt_cond: jax.Array,
    prompt_uncond: jax.Array,
    rng: jax.Array,
    denoised_from: Optional[int] = None,
    denoised_to: Optional[int] = None,
    attn_impl: str = "auto",
    streamed: bool = False,
) -> jax.Array:
    """The teacher's CFG-combined x0 prediction, as a standalone pass.

    Reproduces exactly the (noisy, t) the loss samples (same rng split via
    _score_noisy), runs cond+uncond CFG-batched in ONE forward, and returns
    ``real_c + (real_c − real_u)·real_guidance_scale`` in f32.  With
    ``streamed=True`` the teacher's layer stack may live on HOST memory
    (``memory.blocks_to_host``) and is double-buffer-streamed one layer at
    a time — the path that fits the 14B teacher (wan/configs/wan_t2v_14B.py)
    next to nothing on a 16 GB chip."""
    from ..models.dit_bidirectional import (bidirectional_forward,
                                            bidirectional_forward_streamed)

    x = jax.lax.stop_gradient(gen_latents)
    b, f = x.shape[:2]
    noisy, t = _score_noisy(rng, dcfg, sched, x, denoised_from, denoised_to)
    # CFG batching: [cond ++ uncond] in the batch dim (text2video.py's
    # batched guidance layout)
    noisy2 = jnp.concatenate([noisy, noisy], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    prompts2 = jnp.concatenate([prompt_cond, prompt_uncond], axis=0)
    if streamed:
        flow2 = bidirectional_forward_streamed(
            teacher_params, teacher_cfg, tables, noisy2, t2[:, 0],
            attn_impl=attn_impl, context=prompts2)
    else:
        dtype = jax.tree.leaves(teacher_params["patch_embedding"])[0].dtype
        ckv = D.prepare_cross_kv(teacher_params, teacher_cfg, prompts2, dtype)
        flow2 = bidirectional_forward(teacher_params, teacher_cfg, tables,
                                      noisy2, t2[:, 0], ckv,
                                      attn_impl=attn_impl)
    x02 = S.convert_flow_to_x0(
        sched, flow2.reshape(2 * b * f, *flow2.shape[2:]),
        noisy2.reshape(2 * b * f, *noisy2.shape[2:]).astype(jnp.float32),
        t2.reshape(-1),
    ).reshape(flow2.shape)
    real_c, real_u = x02[:b], x02[b:]
    return (real_c + (real_c - real_u) * dcfg.real_guidance_scale).astype(
        jnp.float32)


def distribution_matching_loss(
    gen_latents: jax.Array,  # [B, F, C, H, W], grad flows into this
    critic_params: dict,
    teacher_params: dict,
    cfg: DiTConfig,
    tables: RopeTables,
    sched: S.FlowMatchSchedule,
    dcfg: DMDConfig,
    prompt_cond: jax.Array,  # [B, text_len, text_dim] T5 features
    prompt_uncond: jax.Array,
    rng: jax.Array,
    gradient_mask: Optional[jax.Array] = None,  # [B, F] bool
    denoised_from: Optional[int] = None,
    denoised_to: Optional[int] = None,
    attn_impl: str = "auto",
    teacher_cfg: Optional[DiTConfig] = None,
    real_x0: Optional[jax.Array] = None,
) -> Tuple[jax.Array, dict]:
    """DMD generator loss (dmd.py:134-200).

    Cross-attention K/V are derived per model: the critic and teacher own
    their text-embedding/projection weights (each WanDiffusionWrapper
    encodes its own context, wan_wrapper.py:247-257), so the critic's
    conditioning must track its trained weights, not the generator's.

    ``real_x0``: the teacher's CFG-combined x0 prediction, precomputed by
    :func:`teacher_real_x0` (e.g. with a host-streamed 14B teacher that
    cannot be resident next to the critic).  The teacher side of the KL
    gradient is fully inside stop_gradient, so passing it in as a constant
    is exact; ``teacher_params`` is then unused (may be ``None``/empty).
    """
    teacher_cfg = teacher_cfg or cfg
    dtype = critic_params["patch_embedding"]["kernel"].dtype
    crit_c = D.prepare_cross_kv(critic_params, cfg, prompt_cond, dtype)
    crit_u = D.prepare_cross_kv(critic_params, cfg, prompt_uncond, dtype)
    if real_x0 is None:
        teach_c = D.prepare_cross_kv(teacher_params, teacher_cfg, prompt_cond, dtype)
        teach_u = D.prepare_cross_kv(teacher_params, teacher_cfg, prompt_uncond, dtype)

    def no_grad_branch(x):
        noisy, t = _score_noisy(rng, dcfg, sched, x, denoised_from, denoised_to)

        fake_x0 = _x0_pred_bidirectional(
            critic_params, cfg, tables, sched, noisy, t, crit_c, attn_impl)
        if dcfg.fake_guidance_scale != 0.0:
            fake_u = _x0_pred_bidirectional(
                critic_params, cfg, tables, sched, noisy, t, crit_u, attn_impl)
            fake_x0 = fake_x0 + (fake_x0 - fake_u) * dcfg.fake_guidance_scale
        if real_x0 is None:
            real_c = _x0_pred_bidirectional(
                teacher_params, teacher_cfg, tables, sched, noisy, t, teach_c,
                attn_impl)
            real_u = _x0_pred_bidirectional(
                teacher_params, teacher_cfg, tables, sched, noisy, t, teach_u,
                attn_impl)
            real = real_c + (real_c - real_u) * dcfg.real_guidance_scale
        else:
            real = real_x0

        grad = fake_x0.astype(jnp.float32) - real.astype(jnp.float32)
        p_real = x.astype(jnp.float32) - real.astype(jnp.float32)
        normalizer = jnp.mean(jnp.abs(p_real), axis=(1, 2, 3, 4), keepdims=True)
        grad = jnp.nan_to_num(grad / normalizer)
        return grad, t

    grad, t = jax.lax.stop_gradient(no_grad_branch(gen_latents))

    x = gen_latents.astype(jnp.float32)
    target = jax.lax.stop_gradient(x - grad)
    err = jnp.square(x - target)
    if gradient_mask is not None:
        # masked mean over selected elements (dmd.py:194-196)
        m = gradient_mask[:, :, None, None, None].astype(jnp.float32)
        per_frame_elems = err.shape[2] * err.shape[3] * err.shape[4]
        loss = 0.5 * jnp.sum(err * m) / jnp.maximum(jnp.sum(m) * per_frame_elems, 1.0)
    else:
        loss = 0.5 * jnp.mean(err)
    aux = {
        "dmdtrain_gradient_norm": jnp.mean(jnp.abs(grad)),
        "dmd_timestep_mean": jnp.mean(t),
    }
    return loss, aux


def denoising_loss(
    loss_type: str,
    sched: S.FlowMatchSchedule,
    x: jax.Array,       # clean generator sample
    x_pred: jax.Array,  # critic x0 prediction
    noise: jax.Array,
    xt: jax.Array,      # the noised input the critic saw
    timestep: jax.Array,
    flow_pred: Optional[jax.Array] = None,
    gradient_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """The reference's denoising-loss family (utils/loss.py:28-98):
    x0 / v / noise / flow MSE variants.  Shipped configs use 'flow'.

    'v' (reference VPredLoss, utils/loss.py:43-56) weights the x0 error by
    1/(1 - alphas_cumprod[t]).  The reference's FlowMatchScheduler never
    defines alphas_cumprod (only the abstract SchedulerInterface declares
    it, utils/scheduler.py:9), so 'v' crashes there; here we derive the
    DDPM variance-preserving alpha-bar from the flow path
    x_t = (1-sigma) x0 + sigma eps via the standard mapping
    alpha_bar = a^2 / (a^2 + s^2), giving weight (a^2 + s^2) / s^2."""
    if loss_type == "x0":
        err = jnp.square(x - x_pred)
    elif loss_type == "v":
        sig = sched.sigmas[S.timestep_id(sched, timestep)].astype(jnp.float32)
        while sig.ndim < x.ndim:
            sig = sig[..., None]
        a2 = jnp.square(1.0 - sig)
        s2 = jnp.square(jnp.maximum(sig, 1e-4))
        weight = (a2 + s2) / s2  # = 1 / (1 - alpha_bar)
        err = weight * jnp.square(x - x_pred)
    elif loss_type == "noise":
        noise_pred = S.convert_x0_to_noise(sched, x_pred, xt, timestep)
        err = jnp.square(noise - noise_pred)
    elif loss_type == "flow":
        assert flow_pred is not None
        err = jnp.square(flow_pred - (noise - x))
    else:
        raise ValueError(f"unsupported denoising_loss_type {loss_type!r}")
    if gradient_mask is not None:
        m = gradient_mask.astype(err.dtype)
        while m.ndim < err.ndim:
            m = m[..., None]
        return jnp.sum(err * m) / jnp.maximum(jnp.sum(jnp.broadcast_to(m, err.shape)), 1.0)
    return jnp.mean(err)


def critic_denoising_loss(
    critic_params: dict,
    gen_latents: jax.Array,  # [B, F, C, H, W] (stop-gradded by caller)
    cfg: DiTConfig,
    tables: RopeTables,
    sched: S.FlowMatchSchedule,
    dcfg: DMDConfig,
    prompt_cond: jax.Array,  # [B, text_len, text_dim] T5 features
    rng: jax.Array,
    denoised_from: Optional[int] = None,
    denoised_to: Optional[int] = None,
    attn_impl: str = "auto",
    loss_type: str = "flow",
) -> Tuple[jax.Array, dict]:
    """Critic (fake_score) denoising loss on generator samples
    (dmd.py:272-392; shipped configs use denoising_loss_type='flow')."""
    b, f = gen_latents.shape[:2]
    rng_t, rng_n = jax.random.split(rng)
    dtype = critic_params["patch_embedding"]["kernel"].dtype
    cross_cond = D.prepare_cross_kv(critic_params, cfg, prompt_cond, dtype)
    t = _sample_score_timestep(rng_t, dcfg, b, f, denoised_from, denoised_to)
    noise = jax.random.normal(rng_n, gen_latents.shape, jnp.float32)
    x = gen_latents.astype(jnp.float32)
    noisy = S.add_noise(
        sched, x.reshape(b * f, *x.shape[2:]),
        noise.reshape(b * f, *x.shape[2:]), t.reshape(-1)
    ).reshape(x.shape)

    # this forward is differentiated wrt critic params -> per-layer remat
    # keeps the backward's residency to the carry chain (full-geometry fit)
    pred_x0 = _x0_pred_bidirectional(
        critic_params, cfg, tables, sched, noisy, t, cross_cond, attn_impl,
        remat_layers=True)
    flow_pred = None
    if loss_type == "flow":
        flow_pred = S.convert_x0_to_flow(
            sched, pred_x0.reshape(b * f, *x.shape[2:]),
            noisy.reshape(b * f, *x.shape[2:]), t.reshape(-1)
        ).reshape(x.shape).astype(jnp.float32)
    loss = denoising_loss(
        loss_type, sched, x, pred_x0.astype(jnp.float32), noise,
        noisy.astype(jnp.float32), t[..., None, None, None], flow_pred)
    return loss, {"critic_timestep_mean": jnp.mean(t)}
