"""Rectified-flow (flow-matching) noise schedule, as pure JAX functions.

Functional re-design of the reference FlowMatchScheduler
(reference: utils/scheduler.py:106-194) and the SchedulerInterface
x0/noise/velocity converters (utils/scheduler.py:5-103).  The schedule is a
small immutable table pytree (`FlowMatchSchedule`) that can be closed over by
jitted functions; every op is shape-polymorphic over leading batch dims.

Semantics preserved exactly (up to fp64->fp32):
- sigmas: linspace(sigma_start, sigma_min, N[+1])[:N], optionally inverted /
  reversed, then shift-warped  sigma' = s*sigma / (1 + (s-1)*sigma)
  (utils/scheduler.py:118-133).
- timesteps = sigmas * num_train_timesteps.
- add_noise: x_t = (1-sigma)*x0 + sigma*noise, sigma looked up by nearest
  timestep (utils/scheduler.py:159-176).
- step: x_{t-1} = x_t + pred * (sigma_next - sigma) (utils/scheduler.py:143-157).
- training weights: truncated-gaussian reweighting (utils/scheduler.py:134-141).
- flow<->x0 conversion: x0 = x_t - sigma_t * flow (utils/wan_wrapper.py:175-222).

The reference computes conversions in float64; TPUs have no fast fp64 so we
use float32 throughout (documented deviation; error << bf16 model noise).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    """Immutable flow-matching schedule tables.

    Attributes:
      sigmas:    [N] f32 noise levels in (0, 1].
      timesteps: [N] f32, sigmas * num_train_timesteps.
      weights:   [N] f32 training loss weights (or zeros if not a training
                 schedule).
      num_train_timesteps: static int.
    """

    sigmas: jax.Array
    timesteps: jax.Array
    weights: jax.Array
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))


def make_schedule(
    num_inference_steps: int = 100,
    num_train_timesteps: int = 1000,
    shift: float = 3.0,
    sigma_max: float = 1.0,
    sigma_min: float = 0.003 / 1.002,
    inverse_timesteps: bool = False,
    extra_one_step: bool = False,
    reverse_sigmas: bool = False,
    denoising_strength: float = 1.0,
    training: bool = False,
) -> FlowMatchSchedule:
    """Builds the schedule tables (reference utils/scheduler.py:108-141).

    The generator/critic schedule used by all shipped LongLive configs is
    ``make_schedule(1000, shift=timestep_shift, sigma_min=0.0,
    extra_one_step=True, training=True)`` (utils/wan_wrapper.py:141-144).
    """
    sigma_start = sigma_min + (sigma_max - sigma_min) * denoising_strength
    if extra_one_step:
        sigmas = np.linspace(sigma_start, sigma_min, num_inference_steps + 1)[:-1]
    else:
        sigmas = np.linspace(sigma_start, sigma_min, num_inference_steps)
    if inverse_timesteps:
        sigmas = sigmas[::-1].copy()
    sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    if reverse_sigmas:
        sigmas = 1.0 - sigmas
    timesteps = sigmas * num_train_timesteps

    if training:
        x = timesteps
        y = np.exp(-2.0 * ((x - num_inference_steps / 2) / num_inference_steps) ** 2)
        y_shifted = y - y.min()
        weights = y_shifted * (num_inference_steps / y_shifted.sum())
    else:
        weights = np.zeros_like(timesteps)

    return FlowMatchSchedule(
        sigmas=jnp.asarray(sigmas, jnp.float32),
        timesteps=jnp.asarray(timesteps, jnp.float32),
        weights=jnp.asarray(weights, jnp.float32),
        num_train_timesteps=num_train_timesteps,
    )


def warp_denoising_steps(
    sched: FlowMatchSchedule, denoising_step_list: Sequence[int]
) -> np.ndarray:
    """Maps nominal timesteps (e.g. [1000, 750, 500, 250]) onto the shifted
    schedule: ``timesteps_ext = [timesteps..., 0]; t_i = timesteps_ext[1000 - s_i]``
    (reference pipeline/causal_inference.py:33-37)."""
    t = np.concatenate(
        [np.asarray(sched.timesteps, np.float32), np.zeros([1], np.float32)]
    )
    idx = sched.num_train_timesteps - np.asarray(denoising_step_list, np.int64)
    return t[idx]


def timestep_id(sched: FlowMatchSchedule, timestep: jax.Array) -> jax.Array:
    """Nearest-timestep index lookup, matching the reference's
    ``argmin(|timesteps - t|)`` (utils/scheduler.py:148-149)."""
    t = jnp.asarray(timestep, jnp.float32)
    return jnp.argmin(
        jnp.abs(sched.timesteps[(None,) * t.ndim + (slice(None),)] - t[..., None]),
        axis=-1,
    )


def _sigma_for(sched: FlowMatchSchedule, timestep: jax.Array, ndim: int) -> jax.Array:
    """sigma at nearest timestep, broadcastable against an ndim-rank tensor
    whose leading axes match ``timestep``'s shape."""
    sig = sched.sigmas[timestep_id(sched, timestep)]
    return sig.reshape(sig.shape + (1,) * (ndim - sig.ndim))


def add_noise(
    sched: FlowMatchSchedule,
    original_samples: jax.Array,
    noise: jax.Array,
    timestep: jax.Array,
) -> jax.Array:
    """Forward corruption x_t = (1-sigma)*x0 + sigma*noise
    (utils/scheduler.py:159-176). ``timestep`` has shape = leading dims of
    the samples (commonly [B*T] against [B*T, C, H, W])."""
    sigma = _sigma_for(sched, timestep, original_samples.ndim).astype(jnp.float32)
    sample = (1.0 - sigma) * original_samples.astype(jnp.float32) + sigma * noise.astype(
        jnp.float32
    )
    return sample.astype(noise.dtype)


def step(
    sched: FlowMatchSchedule,
    model_output: jax.Array,
    timestep: jax.Array,
    sample: jax.Array,
    to_final: bool = False,
) -> jax.Array:
    """Euler flow step (utils/scheduler.py:143-157)."""
    tid = timestep_id(sched, timestep)
    sigma = sched.sigmas[tid]
    n = sched.sigmas.shape[0]
    if to_final:
        sigma_next = jnp.zeros_like(sigma)
    else:
        sigma_next = jnp.where(
            tid + 1 >= n, 0.0, sched.sigmas[jnp.minimum(tid + 1, n - 1)]
        )
    expand = (1,) * (model_output.ndim - sigma.ndim)
    sigma = sigma.reshape(sigma.shape + expand)
    sigma_next = sigma_next.reshape(sigma_next.shape + expand)
    return sample + model_output * (sigma_next - sigma)


def training_weight(sched: FlowMatchSchedule, timestep: jax.Array) -> jax.Array:
    """Per-sample loss weights (utils/scheduler.py:182-194)."""
    return sched.weights[timestep_id(sched, timestep)]


def training_target(sample: jax.Array, noise: jax.Array) -> jax.Array:
    """Flow-matching target = noise - sample (utils/scheduler.py:178-180)."""
    return noise - sample


def convert_flow_to_x0(
    sched: FlowMatchSchedule, flow_pred: jax.Array, xt: jax.Array, timestep: jax.Array
) -> jax.Array:
    """x0 = x_t - sigma_t * flow  (utils/wan_wrapper.py:175-199)."""
    sigma = _sigma_for(sched, timestep, xt.ndim)
    x0 = xt.astype(jnp.float32) - sigma * flow_pred.astype(jnp.float32)
    return x0.astype(flow_pred.dtype)


def convert_x0_to_flow(
    sched: FlowMatchSchedule, x0_pred: jax.Array, xt: jax.Array, timestep: jax.Array
) -> jax.Array:
    """flow = (x_t - x0) / sigma_t  (utils/wan_wrapper.py:201-222)."""
    sigma = _sigma_for(sched, timestep, xt.ndim)
    flow = (xt.astype(jnp.float32) - x0_pred.astype(jnp.float32)) / sigma
    return flow.astype(x0_pred.dtype)


def convert_x0_to_noise(
    sched: FlowMatchSchedule, x0: jax.Array, xt: jax.Array, timestep: jax.Array
) -> jax.Array:
    """noise = (x_t - (1-sigma)*x0) / sigma under the rectified-flow
    corruption.  (The reference's SchedulerInterface variant at
    utils/scheduler.py:26-50 is written for DDPM alphas_cumprod; LongLive only
    ever uses the flow form via `denoising_loss_type: flow`.)"""
    sigma = _sigma_for(sched, timestep, xt.ndim)
    noise = (xt.astype(jnp.float32) - (1.0 - sigma) * x0.astype(jnp.float32)) / sigma
    return noise.astype(x0.dtype)
