"""Self-forcing training rollout with KV cache.

Functional re-design of the reference ``SelfForcingTrainingPipeline``
(pipeline/self_forcing_training.py:12-495):

- per rollout, ONE denoise step index (`exit_idx`) is sampled and shared
  across blocks (same_step_across_blocks=True in shipped configs); the block
  runs denoise steps 0..exit_idx and *stops* (steps after the exit never run,
  self_forcing_training.py:404-446);
- only the exit-step forward of blocks at/after ``start_gradient_frame``
  carries gradient; everything else (earlier steps, earlier blocks, the
  clean-context KV commit) is under stop_gradient — the reference's
  torch.no_grad regions (self_forcing_training.py:404-471);
- the commit adds ``context_noise`` to the prediction before re-running
  (self_forcing_training.py:451-459);
- the reference's rank-0 broadcast of the random exit step
  (self_forcing_training.py:76-93) is unnecessary: all hosts fold the same
  PRNG key.

``exit_idx`` and ``start_gradient_frame`` are static (a handful of compile
variants); ``rng`` drives the re-noising.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CacheConfig, DiTConfig
from ..models import dit as D
from ..ops import kv_cache as kvc
from ..ops import scheduler as S
from ..ops.rope import RopeTables


@dataclasses.dataclass(frozen=True)
class RolloutConfig:
    denoise_timesteps: Tuple[float, ...]  # warped (pipeline causal_inference.py:33-37)
    context_noise: float = 0.0
    frame_block: int = 3
    same_step_across_blocks: bool = True
    last_step_only: bool = False
    attn_impl: str = "train_auto"
    remat: bool = True
    # checkpoint each scanned DiT layer inside training forwards: the layer
    # scan then stores only the bf16 [L, S, dim] carry chain for backward
    # instead of every per-layer intermediate (the f32 FFN/norm residual
    # stacks alone are ~5 GB/forward at full 1.3B geometry — measured
    # compile-time OOM, 71 GB requested on a 16 GB chip without this)
    remat_layers: bool = True
    # two-segment attention for rollout forwards (cache and fresh block as
    # separate kernel operands): never materializes the per-layer written
    # cache stacks (2 x [L, S_cache, N, D] bf16 = ~6.4 GB at the 21-frame
    # config's 11-frame retention) — the serving-latency loss of this form
    # (PERF.md negative result #3) is irrelevant in the memory-bound
    # training regime; the commit pass updates the cache with ONE in-place
    # dynamic_update_slice after the layer scan
    two_segment: bool = True
    # store the rollout KV cache int8 (k AND v, per-token scales): the cache
    # is stop-gradded context, so this is purely a memory lever — it halves
    # the largest rollout residents (the live cache chain and the remat-saved
    # cache input of the differentiated exit forward, 2 x 1.2 GB at the
    # 9-frame full-geometry config; PERF.md).  Quantization happens once per
    # block at commit; denoise passes attend the fresh block in bf16.
    cache_int8: bool = False
    # attention budget in frames (sink + recent); None = whole cache.  The
    # training cache retains min(local+slice, num_training) frames but only
    # local_attn_size frames are attended (self_forcing_training.py:59-74).
    window_frames: Optional[int] = None
    # per-denoise-step window schedule (list-valued local_attn_size,
    # self_forcing_training.py:44-56,183-189); overrides window_frames per
    # step when set; the commit pass uses the last entry.
    window_schedule: Optional[Tuple[Optional[int], ...]] = None


def denoised_timestep_bounds(
    sched: S.FlowMatchSchedule, rcfg: RolloutConfig, exit_idx: int
) -> Tuple[int, int]:
    """(denoised_timestep_from, denoised_timestep_to) — the 1000-argmin
    encoding used to clamp DMD/critic timesteps (ts_schedule,
    self_forcing_training.py:479-491).  Host-side ints."""
    ts = np.asarray(sched.timesteps)

    def enc(t):
        return 1000 - int(np.argmin(np.abs(ts - t)))

    t_from = enc(rcfg.denoise_timesteps[exit_idx])
    if exit_idx == len(rcfg.denoise_timesteps) - 1:
        return t_from, 0
    return t_from, enc(rcfg.denoise_timesteps[exit_idx + 1])


def rollout_trajectory(
    gen_params: dict,
    cfg: DiTConfig,
    cache_cfg: CacheConfig,
    tables: RopeTables,
    sched: S.FlowMatchSchedule,
    rcfg: RolloutConfig,
    noise: jax.Array,  # [B, F_total, C, H, W]
    cross_kv: D.CrossKV,
    rng: jax.Array,
    exit_idx: int,
    start_gradient_frame: int = 0,
    cache: Optional[kvc.KVCache] = None,
    current_start_frame: int = 0,
    initial_latent: Optional[jax.Array] = None,
) -> Tuple[jax.Array, kvc.KVCache, jax.Array]:
    """Rolls out ``F_total`` frames block-by-block with the KV cache.
    Returns (latents [B,F_total,C,H,W] f32, final cache, rng').

    When ``cache``/``current_start_frame`` are provided, continues an ongoing
    sequence (streaming long tuning, pipeline/streaming_training.py:73-257).
    ``initial_latent`` ([B, F0, C, H, W]) is committed at t=0 before the loop
    (image/context conditioning, self_forcing_training.py:352-366).
    """
    b, f_total = noise.shape[:2]
    fpb = rcfg.frame_block
    assert f_total % fpb == 0

    if cache is None:
        cache = kvc.init_cache(
            cache_cfg, cfg.num_layers, b, cfg.num_heads, cfg.head_dim,
            gen_params["patch_embedding"]["kernel"].dtype,
            k_int8=rcfg.cache_int8, v_int8=rcfg.cache_int8,
        )

    def _window_for(step_idx: Optional[int]) -> Optional[int]:
        if rcfg.window_schedule is not None:
            i = step_idx if step_idx is not None else len(rcfg.window_schedule) - 1
            return rcfg.window_schedule[i]
        return rcfg.window_frames

    if initial_latent is not None:
        # commit conditioning frames at t=0 (grad-free); generation starts
        # after them (self_forcing_training.py:352-366)
        f0 = initial_latent.shape[1]
        t0 = jnp.zeros((b, f0), jnp.float32)
        _, cache = D.dit_forward_cached(
            gen_params, cfg, cache_cfg, tables,
            jax.lax.stop_gradient(initial_latent), t0, cross_kv, cache,
            current_start_frame, attn_impl=rcfg.attn_impl,
            window_frames=rcfg.window_frames,
            two_segment=True if rcfg.two_segment else None,
            kv_only=True,
        )
        cache = jax.lax.stop_gradient(cache)
        current_start_frame = current_start_frame + f0

    outputs = []
    for s in range(0, f_total, fpb):
        x0, cache, rng = rollout_block(
            gen_params, cfg, cache_cfg, tables, sched, rcfg, cross_kv,
            noise[:, s : s + fpb], cache, rng, current_start_frame + s,
            exit_idx, grad_on=s >= start_gradient_frame,
        )
        outputs.append(x0)

    return jnp.concatenate(outputs, axis=1), cache, rng


def rollout_block(
    gen_params: dict,
    cfg: DiTConfig,
    cache_cfg: CacheConfig,
    tables: RopeTables,
    sched: S.FlowMatchSchedule,
    rcfg: RolloutConfig,
    cross_kv: D.CrossKV,
    x: jax.Array,  # [B, frame_block, C, H, W]
    cache: kvc.KVCache,
    rng: jax.Array,
    abs_start,
    exit_idx: int,
    grad_on: bool,
) -> Tuple[jax.Array, kvc.KVCache, jax.Array]:
    """ONE block of the self-forcing rollout: pre-exit denoise steps
    (stop-grad), the exit-step forward (gradient iff ``grad_on``), and the
    clean-context KV commit (stop-grad).  Returns (x0, cache', rng').

    ``rollout_trajectory`` is exactly this in a loop — and because every
    inter-block dependency (the cache chain and the re-noising RNG) is
    stop-gradded, dL/dθ over a whole rollout is the SUM of per-block VJPs
    of this function.  The trainer's ``block_vjp`` mode exploits that to
    run the generator backward one block at a time (peak HBM one block's
    residuals instead of all blocks': 25.6 -> ~9 GiB at the 21-frame 1.3B
    geometry, scripts/train_probe_1p3b.py --mode mem_analysis)."""
    b, fpb = x.shape[:2]

    def _window_for(step_idx: Optional[int]) -> Optional[int]:
        if rcfg.window_schedule is not None:
            i = step_idx if step_idx is not None else len(rcfg.window_schedule) - 1
            return rcfg.window_schedule[i]
        return rcfg.window_frames

    def _fwd(p, xx, tt, ck, sf, window, commit, kv_only):
        return D.dit_forward_cached(
            p, cfg, cache_cfg, tables, xx, tt, cross_kv, ck, sf,
            attn_impl=rcfg.attn_impl, window_frames=window,
            remat_layers=rcfg.remat_layers,
            two_segment=True if rcfg.two_segment else None,
            commit_writes=commit, kv_only=kv_only,
        )

    fwd_fn = (jax.checkpoint(_fwd, static_argnums=(5, 6, 7))
              if rcfg.remat else _fwd)

    def forward(xx, t_val, cache_in, start_frame, step_idx=None, commit=False,
                kv_only=False):
        t = jnp.full((b, fpb), t_val, jnp.float32)
        flow, cache_out = fwd_fn(gen_params, xx, t, cache_in, start_frame,
                                 _window_for(step_idx), commit, kv_only)
        if kv_only:  # commit-style call: only the cache is meaningful
            return flow, cache_out
        bf = b * fpb
        x0 = S.convert_flow_to_x0(
            sched, flow.reshape(bf, *flow.shape[2:]),
            xx.reshape(bf, *xx.shape[2:]).astype(jnp.float32),
            jnp.full((bf,), t_val, jnp.float32),
        ).reshape(flow.shape)
        return x0, cache_out

    # denoise steps before the exit: no gradient
    for i in range(exit_idx):
        x0, _ = forward(jax.lax.stop_gradient(x),
                        rcfg.denoise_timesteps[i], cache, abs_start, i)
        x0 = jax.lax.stop_gradient(x0)
        rng, sub = jax.random.split(rng)
        t_next = jnp.full((b * fpb,), rcfg.denoise_timesteps[i + 1], jnp.float32)
        x = S.add_noise(
            sched, x0.reshape(b * fpb, *x0.shape[2:]),
            jax.random.normal(sub, x0.shape, jnp.float32).reshape(
                b * fpb, *x0.shape[2:]),
            t_next,
        ).reshape(x0.shape)
    # exit step: gradient iff this block is in the supervised tail
    x0, _ = forward(jax.lax.stop_gradient(x),
                    rcfg.denoise_timesteps[exit_idx], cache, abs_start,
                    exit_idx)
    if not grad_on:
        x0 = jax.lax.stop_gradient(x0)

    # clean-context commit (stop-grad; context noise added like the
    # reference, self_forcing_training.py:451-459)
    rng, sub = jax.random.split(rng)
    ctx = S.add_noise(
        sched,
        jax.lax.stop_gradient(x0).reshape(b * fpb, *x0.shape[2:]),
        jax.random.normal(sub, x0.shape, jnp.float32).reshape(
            b * fpb, *x0.shape[2:]),
        jnp.full((b * fpb,), rcfg.context_noise, jnp.float32),
    ).reshape(x0.shape)
    _, cache = forward(ctx, rcfg.context_noise, cache, abs_start,
                       commit=True, kv_only=True)
    cache = jax.lax.stop_gradient(cache)
    return x0, cache, rng


def sample_exit_idx(rng: jax.Array, num_steps: int, last_step_only: bool) -> int:
    """Host-side exit-step sampling (all hosts share the key, replacing the
    reference's rank-0 broadcast, self_forcing_training.py:76-93)."""
    if last_step_only:
        return num_steps - 1
    return int(jax.random.randint(rng, (), 0, num_steps))
