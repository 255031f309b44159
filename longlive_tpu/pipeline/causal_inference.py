"""Autoregressive causal generation pipeline.

TPU-native re-design of the reference ``CausalInferencePipeline``
(pipeline/causal_inference.py:13-329).  The whole per-block step — four
denoising forwards, flow→x0 conversions, re-noising, and the clean-context
KV-commit forward (causal_inference.py:144-200) — is ONE jitted program with
a traced ``start_frame``, so there is exactly one compilation for the whole
video and zero host-side cache bookkeeping (the reference spends O(100µs)
per layer on that, reports.md:38,45-48).

The denoise passes write their (transient) block K/V into the functional
cache for intra-block self-attention and then *discard* the cache; only the
commit pass's cache is carried to the next block — this reproduces the
reference's is_recompute pointer semantics (causal_model.py:230,900-904) by
construction.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CacheConfig, DiTConfig, LatentGeometry, PipelineConfig
from ..models import dit as D
from ..ops import kv_cache as kvc
from ..ops import scheduler as S
from ..ops.rope import make_rope_tables
from ..utils import aot_cache


def build_recache_fn(
    cfg: DiTConfig,
    cache_cfg: CacheConfig,
    tables,
    sched_context_noise: float,
    num_frames: int,
    global_sink: bool,
    overwrite_sink: bool,
    window_frames: int,
    attn_impl: str = "auto",
    forward=None,
):
    """KV-recache as a pure function — the single implementation behind
    CausalInferencePipeline._recache_fn, the streaming trainer, and the
    interactive pipeline (reference interactive_causal_inference.py:34-106):
    zero the cache (unless global_sink), replay the last ``num_frames``
    generated frames under the new prompt in ONE kv_only forward, writing
    K/V linearly from slot 0 (or from the sink boundary when the original
    sink is kept).

    ``forward``: optional pipeline-style callable
    ``(params, x, t_val, cross, state, start, **kw)`` (e.g.
    CausalInferencePipeline._forward, which routes to the SP path on a
    mesh); defaults to the single-device cached forward.
    Returns fn(params, cache, cross_new, replay, recache_start_frame)
    -> cache'."""
    sink = cache_cfg.sink_frames
    budget = window_frames - sink

    if forward is None:
        def forward(params, x, t_val, cross, state, start, **kw):
            b, f = x.shape[:2]
            t = jnp.full((b, f), t_val, jnp.float32)
            return D.dit_forward_cached(
                params, cfg, cache_cfg, tables, x, t, cross, state, start,
                attn_impl=attn_impl, **kw)

    def fn(params, cache, cross_new, replay, recache_start_frame):
        n = num_frames
        if not global_sink:
            cache = kvc.zero_cache(cache)
        state = kvc.recache_state(cache_cfg, cache, recache_start_frame + n, n)
        offsets = jnp.arange(n, dtype=jnp.int32) * cache_cfg.frame_seq
        write_frames = tuple(range(n)) if overwrite_sink else tuple(range(sink, n))
        slots = jnp.arange(cache_cfg.total_frames, dtype=jnp.int32)
        n_arr = jnp.maximum(jnp.asarray(n, jnp.int32), sink)
        # attend: sink slots + the most recent `budget` replay slots
        # (reference recache attention = sink ++ local window,
        #  causal_model.py:331-341)
        kv_valid = (slots < sink) | ((slots >= n_arr - budget) & (slots < n_arr))
        kv_valid = jnp.repeat(kv_valid, cache_cfg.frame_seq)
        _, state = forward(
            params, replay, float(sched_context_noise), cross_new, state,
            recache_start_frame, kv_valid=kv_valid, offsets=offsets,
            write_frames=write_frames, advance_counters=False, kv_only=True,
        )
        return state

    return fn


class EagerRecache:
    """Incremental (chunked) prompt-switch KV-recache — hides the switch
    stall.

    The one-shot recache replays the whole min(local_attn, t)-frame window
    at the switch point (~550 ms serial on a v5e, reference ~360 ms,
    interactive_causal_inference.py:34-106).  But with scheduled switches
    (the reference's ``switch_frame_indices``) the replay frames become
    available one block at a time BEFORE the switch — and the recache is a
    blockwise-causal prefill, so it can be built incrementally: as each
    pre-switch block lands, its chunk is committed (kv_only, under the NEW
    prompt) into a second cache buffer.  At the switch only the FINAL
    block's chunk remains serial: the visible stall drops to ~1/(n/fpb) of
    the one-shot recache.  Total FLOPs are unchanged (same replay, spread
    out); HBM cost is one extra cache buffer while the switch approaches.

    Chunking reproduces the reference's own interactive-mode semantics
    exactly: its recache applies a blockwise-causal flex-attention mask
    (interactive_causal_inference.py:73-96, causal_model.py:648-701), i.e.
    replay block i never attends later blocks — which is forced here by
    construction (later blocks don't exist yet when chunk i commits).

    Usage (serving loop, switch at frame ``s`` known in advance):
        er = EagerRecache(pipe, batch, switch_frame=s, dtype)
        er.feed(cross_new, latents, latents_start)   # any time frames land
        cache = er.finish()                          # at the switch
    ``feed`` accepts any latent span and consumes the overlap with the
    replay window [s - n, s); out-of-window frames are ignored.
    """

    def __init__(self, pipe: "CausalInferencePipeline", batch: int,
                 switch_frame: int, dtype=jnp.bfloat16):
        fpb = pipe.frame_block
        local = pipe.config.local_attn_size
        n = switch_frame if local == -1 else min(local, switch_frame)
        if n % fpb:
            raise ValueError(
                f"eager recache needs a block-aligned replay ({n} frames, "
                f"block {fpb}); use the one-shot recache")
        self.pipe = pipe
        self.n = n
        self.start = switch_frame - n  # absolute frame of replay index 0
        self.fed = 0  # replay frames committed so far
        # built in the standard layout even under kernel_cache (finish
        # converts once — the same relayout the one-shot recache pays)
        self.cache = kvc.init_cache(
            pipe.cache_cfg, pipe.cfg.num_layers, batch, pipe.cfg.num_heads,
            pipe.cfg.head_dim, dtype, k_int8=pipe.config.kv_int8)
        self._chunk_fn = pipe._eager_recache_chunk_fn()

    def feed(self, cross_new, latents: jax.Array, latents_start: int) -> int:
        """Commit the overlap of ``[latents_start, +F)`` with the not-yet-fed
        replay range.  Returns the number of frames consumed.  Dispatches
        device work without blocking the host."""
        fpb = self.pipe.frame_block
        consumed = 0
        while self.fed < self.n:
            c0 = self.fed
            abs0 = self.start + c0
            if not (latents_start <= abs0
                    and abs0 + fpb <= latents_start + latents.shape[1]):
                break
            chunk = jax.lax.dynamic_slice_in_dim(
                latents, abs0 - latents_start, fpb, axis=1)
            self.cache = self._chunk_fn(
                self.pipe.params, self.cache, cross_new, chunk,
                jnp.asarray(c0, jnp.int32), jnp.asarray(self.start, jnp.int32))
            self.fed += fpb
            consumed += fpb
        return consumed

    def finish(self) -> kvc.KVCache:
        """Returns the completed post-switch cache (one-shot-recache layout:
        frames packed from slot 0, ring_base = switch - n + sink).  One
        jitted program (pointer update + optional kernel-layout
        conversion) — the switch-path serial tail must not pay per-scalar
        dispatch round trips."""
        assert self.fed == self.n, (
            f"eager recache incomplete: {self.fed}/{self.n} frames fed")
        return self.pipe._finish_recache_fn()(
            self.cache, jnp.asarray(self.start + self.n, jnp.int32),
            jnp.asarray(self.n, jnp.int32))


class CausalInferencePipeline:
    """Drives block-by-block AR generation with a frame-sink + ring-window
    KV cache.

    Parameters are a DiT param pytree (see models.dit.init_dit_params /
    utils.checkpoint loaders).  Text encoding and VAE decoding are provided
    by callables so the pipeline core stays model-agnostic.
    """

    def __init__(
        self,
        config: PipelineConfig,
        params: dict,
        geometry: LatentGeometry = LatentGeometry(),
        dit_config: Optional[DiTConfig] = None,
        attn_impl: str = "auto",
        mesh=None,
        deterministic_renoise: bool = False,
    ):
        self.config = config
        self.params = params
        self.geom = geometry
        self.cfg = dit_config or config.dit_config()
        self.attn_impl = attn_impl
        # zero re-noise between denoise steps — cross-framework parity /
        # debugging tool (removes the only RNG-order-dependent part of the
        # block step; see scripts/parity_vs_reference.py)
        self.deterministic_renoise = deterministic_renoise
        # sequence-parallel decode over the mesh's `sp` axis
        # (parallel.decode_sp); None = single-device
        self.mesh = mesh
        self.sp = int(mesh.shape["sp"]) if mesh is not None and "sp" in mesh.shape else 1
        if config.kv_int8 and self.sp > 1:
            raise ValueError("kv_int8 is a single-device serving knob; the "
                             "sp decode path keeps the bf16 cache")

        # schedule (utils/wan_wrapper.py:141-144 + causal_inference.py:33-37)
        self.sched = S.make_schedule(
            1000, shift=config.timestep_shift, sigma_min=0.0, extra_one_step=True,
            training=True,
        )
        steps = np.asarray(config.denoising_step_list, np.float64)
        if config.warp_denoising_step:
            steps = S.warp_denoising_steps(self.sched, config.denoising_step_list)
        self.denoise_timesteps: Tuple[float, ...] = tuple(float(s) for s in steps)

        self.cache_cfg = CacheConfig.from_model(
            self.cfg, self.geom, config.num_output_frames
        )
        self.tables = make_rope_tables(self.cfg.head_dim, self.cfg.rope_max_pos)
        self.frame_block = config.num_frame_per_block

        # attention budget in frames (= cache size for inference configs;
        # training pipelines retain more cache than they attend)
        self.attn_window_frames = self.cache_cfg.total_frames
        # Contiguous-ring-write invariant: when the sink and ring sizes are
        # both multiples of the block size, every block's frames land in
        # CONSECUTIVE cache slots (all block starts are multiples of
        # frame_block, and recache keeps ring_base ≡ 0 mod frame_block — see
        # _recache_fn's guard).  The model then commits each block's K/V with
        # ONE dynamic_update_slice instead of a per-frame chain, each link of
        # which costs XLA a copy-sized pass over the cache buffer.
        self._contig = (
            self.cache_cfg.sink_frames % self.frame_block == 0
            and self.cache_cfg.ring_frames % self.frame_block == 0
        )
        # kernel_cache resolution: None = AUTO (on whenever supported —
        # measured −5.9% e2e int8 / −4.8% bf16, PERF.md chip session r2e);
        # explicit True validates hard, False forces write-then-attend.
        kc = config.kernel_cache
        if kc is None:
            kc = self.sp == 1 and not config.kv_int8 and self._contig
        elif kc:
            if self.sp > 1 or config.kv_int8:
                raise ValueError("kernel_cache is a single-device bf16 "
                                 "serving mode (sp == 1, no kv_int8)")
            if not self._contig:
                raise ValueError(
                    "kernel_cache requires the contiguous-ring invariant "
                    "(sink_size and local_attn_size - sink_size must be "
                    "multiples of num_frame_per_block)")
        self.kernel_cache = bool(kc)
        self._block_fn = self._jit("block", self._block_step, donate_argnums=(1,))
        self._recache_fns = {}
        self._segment_fns = {}
        self._prepare_cond_fn = self._jit(
            "prepare_cond",
            lambda p, pe: D.prepare_cross_kv(
                p, self.cfg, pe, self.params["patch_embedding"]["kernel"].dtype
            ),
        )

    def _jit(self, tag: str, fn, donate_argnums=()):
        """jit with AOT executable persistence (utils/aot_cache) — warm
        process starts skip tracing AND compilation of the serving
        programs.  Sharded (sp) programs embed a device assignment, so
        only single-device pipelines are AOT-cached."""
        if self.mesh is not None:
            return jax.jit(fn, donate_argnums=donate_argnums)
        key = repr((type(self).__name__, tag, self.config, self.cfg,
                    self.geom, self.attn_impl, self.deterministic_renoise,
                    self.kernel_cache, self._contig))
        return aot_cache.aot_jit(fn, key, donate_argnums=donate_argnums)

    # -- jitted core ---------------------------------------------------------

    def _forward(self, params, x, t_val, cross_kv, cache, start_frame, **kw):
        b, f = x.shape[:2]
        t = jnp.full((b, f), t_val, jnp.float32)
        attn_impl = kw.pop("attn_impl", self.attn_impl)
        if self.sp > 1:
            from ..parallel.decode_sp import sp_dit_forward_cached

            kw.pop("commit_writes", None)  # sp path keeps write-then-attend
            kw.pop("kv_only", None)
            return sp_dit_forward_cached(
                params, self.cfg, self.cache_cfg, self.tables, self.mesh,
                x, t, cross_kv, cache, start_frame, attn_impl=attn_impl,
                **kw,
            )
        kw.setdefault("contig_writes", self._contig)
        kw.setdefault("fused_rope", self.config.fused_rope)
        return D.dit_forward_cached(
            params, self.cfg, self.cache_cfg, self.tables, x, t, cross_kv,
            cache, start_frame, attn_impl=attn_impl, **kw,
        )

    def _block_step(self, params, cache, cross_kv, noise_block, start_frame,
                    rng, skip_commit: bool = False):
        """4-step denoise + clean-context commit for one block
        (reference causal_inference.py:144-200).

        ``skip_commit``: drop the commit entirely (no 5th forward, no K/V
        kept).  EXACT for the LAST block before a prompt switch — its
        committed K/V would be read by nothing (the switch replaces the
        cache), and the eager-recache chunk under the new prompt takes the
        commit's place in the schedule, so the switch adds ~zero serial
        work.  x0 is unaffected (the commit never fed the block's own
        denoising), and the rng chain is identical (the commit consumes no
        randomness)."""
        b, f = noise_block.shape[:2]
        x = noise_block
        x0 = x
        n_steps = len(self.denoise_timesteps)
        reuse_kv = self.config.reuse_last_denoise_kv and not skip_commit
        kl = self.kernel_cache
        for i, t_val in enumerate(self.denoise_timesteps):
            # denoise (recompute) passes discard the cache -> skip
            # materializing their KV writes entirely.  In the
            # reuse_last_denoise_kv fast mode the LAST denoise pass commits
            # its (write-then-attend) K/V instead, replacing the clean-
            # context 5th forward below.
            #
            # kernel_cache mode instead THREADS the returned cache through
            # every pass (each pass overwrites the block's slots before
            # attending, so results are identical) — this keeps the
            # in-place-updated buffer chain singly-consumed, letting XLA
            # alias it end to end; counters advance only on the commit.
            commit = reuse_kv and i == n_steps - 1
            kw = {"advance_counters": commit} if kl else {}
            flow, new_cache = self._forward(params, x, t_val, cross_kv, cache,
                                            start_frame, commit_writes=commit,
                                            **kw)
            if commit or kl:
                cache = new_cache
            t_flat = jnp.full((b * f,), t_val, jnp.float32)
            x0 = S.convert_flow_to_x0(
                self.sched,
                flow.reshape(b * f, *flow.shape[2:]),
                x.reshape(b * f, *x.shape[2:]).astype(jnp.float32),
                t_flat,
            ).reshape(x.shape)
            if i < n_steps - 1:
                rng, sub = jax.random.split(rng)
                t_next = jnp.full((b * f,), self.denoise_timesteps[i + 1], jnp.float32)
                if self.deterministic_renoise:
                    noise = jnp.zeros(x0.shape, jnp.float32)
                else:
                    noise = jax.random.normal(sub, x0.shape, jnp.float32)
                x = S.add_noise(
                    self.sched, x0.reshape(b * f, *x0.shape[2:]), noise.reshape(
                        b * f, *x0.shape[2:]), t_next
                ).reshape(x0.shape)
        if not reuse_kv and not skip_commit:
            # clean-context commit pass (causal_inference.py:191-200); its
            # flow output is never read, so the last layer runs K/V-only
            _, cache = self._forward(
                params, x0, float(self.config.context_noise), cross_kv, cache,
                start_frame, kv_only=True
            )
        return x0, cache, rng

    def _segment_fn(self, num_blocks: int):
        """lax.scan over ``num_blocks`` blocks inside ONE jitted program —
        amortizes host dispatch (the per-block Python loop pays a host->device
        round trip per block, which dominates under remote/tunneled runtimes).
        """
        if num_blocks in self._segment_fns:
            return self._segment_fns[num_blocks]

        fpb = self.frame_block

        def seg(params, cache, cross_kv, noise_frames, start_frame, rng):
            # noise_frames: [B, num_blocks*fpb, C, H, W]
            b = noise_frames.shape[0]
            noise_blocks = noise_frames.reshape(
                b, num_blocks, fpb, *noise_frames.shape[2:]).transpose(1, 0, 2, 3, 4, 5)
            starts = start_frame + jnp.arange(num_blocks, dtype=jnp.int32) * fpb

            def body(carry, xs):
                cache, rng = carry
                nb, s = xs
                x0, cache, rng = self._block_step(params, cache, cross_kv, nb, s, rng)
                return (cache, rng), x0

            (cache, rng), ys = jax.lax.scan(body, (cache, rng), (noise_blocks, starts))
            # ys: [num_blocks, B, fpb, C, H, W] -> [B, T, C, H, W]
            lat = ys.transpose(1, 0, 2, 3, 4, 5).reshape(
                b, num_blocks * fpb, *noise_frames.shape[2:])
            return lat, cache, rng

        fn = self._jit(f"segment{num_blocks}", seg, donate_argnums=(1,))
        self._segment_fns[num_blocks] = fn
        return fn

    def generate_latents_scanned(
        self,
        noise: jax.Array,
        cross_kv: D.CrossKV,
        rng: Optional[jax.Array] = None,
        cache: Optional[kvc.KVCache] = None,
        start_frame: int = 0,
    ):
        """Whole-segment generation in one device dispatch.  Returns
        (latents, cache, rng) so interactive callers can continue across
        prompt switches."""
        b, t_frames = noise.shape[:2]
        assert t_frames % self.frame_block == 0
        rng = rng if rng is not None else jax.random.PRNGKey(self.config.seed)
        if cache is None:
            cache = self.init_cache(b, self.params["patch_embedding"]["kernel"].dtype)
        fn = self._segment_fn(t_frames // self.frame_block)
        return fn(self.params, cache, cross_kv, noise,
                  jnp.asarray(start_frame, jnp.int32), rng)

    def _recache_fn(self, num_frames: int, global_sink: bool,
                    overwrite_sink: Optional[bool] = None):
        """Jitted KV-recache for a prompt switch
        (reference interactive_causal_inference.py:34-106): zero the cache
        (unless global_sink), replay the last ``num_frames`` generated frames
        under the new prompt in ONE forward, writing K/V linearly from slot 0
        (or from the sink boundary when the original sink is kept).

        ``overwrite_sink`` defaults to ``not global_sink`` (the inference
        path's sink_recache_after_switch, causal_model.py:303-304); the
        training recache never overwrites the sink — it leaves the zeroed
        sink slots attended, matching
        streaming_switch_training.py:244-318 + causal_model.py:264,302."""
        if overwrite_sink is None:
            overwrite_sink = not global_sink
        if self.kernel_cache and num_frames % self.frame_block:
            # the kl cache's in-place block commits assume ring_base stays
            # ≡ 0 mod frame_block; an odd recache breaks that and the cache
            # object cannot switch layouts mid-run (shipped configs always
            # recache min(local_attn, t) — a block multiple)
            raise ValueError(
                "kernel_cache requires block-aligned recache sizes; set "
                "kernel_cache: false to allow odd recache lengths")
        if self._contig and num_frames % self.frame_block:
            # a recache of n frames sets ring_base = t - n + sink; with t and
            # sink multiples of frame_block, ring_base stays ≡ 0 mod
            # frame_block only when n is too.  Shipped configs recache
            # min(local_attn, t) frames — always a block multiple — but an
            # odd-sized recache breaks the contiguous-write invariant, so
            # fall back to per-frame writes (retrace the block fns).
            import sys as _sys

            print(
                f"[longlive_tpu] WARNING: odd-sized recache ({num_frames} "
                f"frames, block {self.frame_block}) disables contiguous KV "
                "writes for the REST OF THIS PIPELINE'S LIFE: every cached "
                "block/segment program retraces now (a multi-second latency "
                "cliff) and steady-state blocks run the slower per-frame "
                "write form.  Use block-aligned replay sizes "
                "(reactive_switch rounds down automatically).",
                file=_sys.stderr, flush=True)
            self._contig = False
            self._block_fn = self._jit("block", self._block_step,
                                       donate_argnums=(1,))
            self._block_nc_jit = None
            self._segment_fns = {}
            self._recache_fns = {}
        key = (num_frames, global_sink, overwrite_sink)
        if key in self._recache_fns:
            return self._recache_fns[key]

        rimpl = self.config.recache_attn_impl
        if rimpl is None:
            fwd = self._forward
        else:
            def fwd(*a, **k):
                k["attn_impl"] = rimpl
                return self._forward(*a, **k)

        fn = build_recache_fn(
            self.cfg, self.cache_cfg, self.tables,
            float(self.config.context_noise), num_frames, global_sink,
            overwrite_sink, self.attn_window_frames, forward=fwd,
        )
        if self.kernel_cache:
            # the recache replay keeps the standard-layout write-then-attend
            # machinery; convert the kernel-layout cache around it (two
            # relayout passes, ~2.6 GB total — noise against the ~550 ms
            # recache forward itself)
            base_fn, ccfg = fn, self.cache_cfg
            L, N = self.cfg.num_layers, self.cfg.num_heads

            def fn(params, cache, cross_new, replay, recache_start_frame):
                b = replay.shape[0]
                std = kvc.from_kernel_layout(ccfg, cache, L, b, N)
                std = base_fn(params, std, cross_new, replay,
                              recache_start_frame)
                return kvc.to_kernel_layout(ccfg, std)

        jitted = self._jit(f"recache{key}", fn, donate_argnums=(1,))
        self._recache_fns[key] = jitted
        return jitted

    def reactive_switch(self, cache, history: jax.Array, cross_new,
                        current_frame: int, frames: Optional[int] = None):
        """Unscheduled (reactive) prompt switch at ``current_frame``:
        rebuild the KV cache under the new prompt and return it.  The next
        block then generates against the recached state.

        A switch that arrives without schedule cannot use the eager
        incremental recache (its chunks hide behind PRE-switch generation),
        so the serial cost here is the replay prefill itself.  ``frames``
        (default ``config.reactive_recache_frames``, else the full
        ``min(local_attn, t)`` window) bounds that cost: a reduced replay
        of r frames cuts the stall roughly r/window while the first
        post-switch blocks see a shorter history window — the same
        quality lever as the reference's window-9 ablation
        (reports.md:57-61).  The window refills with post-switch frames
        within ``local_attn`` frames.  ``history``: the generated latents
        ending at ``current_frame`` (at least the replay span).
        """
        local = self.cfg.local_attn_size
        full = current_frame if local == -1 else min(local, current_frame)
        if frames is None:
            frames = self.config.reactive_recache_frames or full
        fpb = self.frame_block
        n = min(frames, full)
        n -= n % fpb  # block-aligned (kernel_cache/contiguous invariant)
        if n <= 0:
            n = min(fpb, full)
        assert history.shape[1] >= n, (
            f"history has {history.shape[1]} frames; replay needs {n}")
        replay = history[:, history.shape[1] - n :]
        return self._recache_fn(n, bool(self.config.global_sink))(
            self.params, cache, cross_new, replay,
            jnp.asarray(current_frame - n, jnp.int32))

    def _eager_recache_chunk_fn(self):
        """One jitted program shared by every EagerRecache chunk: commit
        replay frames [c0, c0+fpb) (kv_only, new prompt, context_noise t)
        into linear slots with the same sink+window validity rule as
        build_recache_fn — c0 is traced, so all chunks and all switch
        positions reuse one executable."""
        if getattr(self, "_eager_chunk_jit", None) is None:
            ccfg = self.cache_cfg
            sink = ccfg.sink_frames
            budget = self.attn_window_frames - sink
            fpb = self.frame_block

            def chunk_fn(params, cache, cross_new, chunk, c0, recache_start):
                c1 = c0 + fpb
                slots = jnp.arange(ccfg.total_frames, dtype=jnp.int32)
                n_arr = jnp.maximum(c1, sink)
                kv_valid = (slots < sink) | (
                    (slots >= n_arr - budget) & (slots < n_arr))
                kv_valid = jnp.repeat(kv_valid, ccfg.frame_seq)
                offsets = (c0 + jnp.arange(fpb, dtype=jnp.int32)) * ccfg.frame_seq
                _, cache = self._forward(
                    params, chunk, float(self.config.context_noise),
                    cross_new, cache, recache_start + c0, kv_valid=kv_valid,
                    offsets=offsets, write_frames=tuple(range(fpb)),
                    advance_counters=False, kv_only=True)
                return cache

            self._eager_chunk_jit = self._jit("eager_recache_chunk", chunk_fn,
                                              donate_argnums=(1,))
        return self._eager_chunk_jit

    @property
    def _block_fn_nocommit(self):
        """Block step WITHOUT the commit pass — for the last block before a
        prompt switch (see _block_step.skip_commit)."""
        if getattr(self, "_block_nc_jit", None) is None:
            self._block_nc_jit = self._jit(
                "block_nocommit",
                lambda p, c, ck, nb, s, r: self._block_step(
                    p, c, ck, nb, s, r, skip_commit=True),
                donate_argnums=(1,))
        return self._block_nc_jit

    def _finish_recache_fn(self):
        """EagerRecache.finish as ONE program: recache pointer state +
        (under kernel_cache) the standard->kernel relayout."""
        if getattr(self, "_finish_recache_jit", None) is None:
            def fin(cache, end, n):
                cache = kvc.recache_state(self.cache_cfg, cache, end, n)
                if self.kernel_cache:
                    cache = kvc.to_kernel_layout(self.cache_cfg, cache)
                return cache

            self._finish_recache_jit = self._jit("finish_recache", fin,
                                                 donate_argnums=(0,))
        return self._finish_recache_jit

    @property
    def _to_kl_fn(self):
        if getattr(self, "_to_kl_jit", None) is None:
            self._to_kl_jit = self._jit(
                "to_kernel_layout",
                lambda c: kvc.to_kernel_layout(self.cache_cfg, c),
                donate_argnums=(0,))
        return self._to_kl_jit

    def begin_eager_recache(self, batch: int, switch_frame: int,
                            dtype=jnp.bfloat16) -> EagerRecache:
        """Start an incremental recache for a scheduled prompt switch at
        ``switch_frame`` (see EagerRecache)."""
        return EagerRecache(self, batch, switch_frame, dtype)

    # -- host-side loop -------------------------------------------------------

    def init_cache(self, batch_size: int, dtype=jnp.bfloat16) -> kvc.KVCache:
        if self.kernel_cache:
            return kvc.init_cache_kl(
                self.cache_cfg, self.cfg.num_layers, batch_size,
                self.cfg.num_heads, self.cfg.head_dim, dtype,
            )
        cache = kvc.init_cache(
            self.cache_cfg, self.cfg.num_layers, batch_size,
            self.cfg.num_heads, self.cfg.head_dim, dtype,
            k_int8=self.config.kv_int8,
        )
        if self.sp > 1:
            from ..parallel.decode_sp import shard_cache

            cache = shard_cache(cache, self.mesh)
        return cache

    def prepare_condition(self, prompt_embeds: jax.Array) -> D.CrossKV:
        """prompt_embeds: [B, text_len, text_dim] zero-padded T5 features."""
        return self._prepare_cond_fn(self.params, prompt_embeds)

    def generate_latents(
        self,
        noise: jax.Array,  # [B, T, C, H, W]
        cross_kv: D.CrossKV,
        rng: Optional[jax.Array] = None,
        profile: bool = False,
        block_callback: Optional[Callable[[int, jax.Array], None]] = None,
    ) -> jax.Array:
        """The reference `inference()` loop (causal_inference.py:56-253) minus
        text encoding / VAE decoding. Returns latents [B, T, C, H, W] f32."""
        b, t_frames = noise.shape[:2]
        fpb = self.frame_block
        assert t_frames % fpb == 0
        rng = rng if rng is not None else jax.random.PRNGKey(self.config.seed)

        cache = self.init_cache(b, self.params["patch_embedding"]["kernel"].dtype)
        outputs = []
        block_times = []
        for s in range(0, t_frames, fpb):
            t0 = time.perf_counter()
            x0, cache, rng = self._block_fn(
                self.params, cache, cross_kv, noise[:, s : s + fpb],
                jnp.asarray(s, jnp.int32), rng,
            )
            if block_callback is not None:
                block_callback(s, x0)
            outputs.append(x0)
            if profile:
                jax.block_until_ready(x0)
                block_times.append(time.perf_counter() - t0)
        latents = jnp.concatenate(outputs, axis=1)
        if profile:
            steady = block_times[2:] or block_times
            per_frame = float(np.mean(steady)) / fpb
            print(
                f"[profile] blocks={len(block_times)} "
                f"steady-state latency={per_frame * 1e3:.2f} ms/latent-frame "
                f"({fpb / float(np.mean(steady)):.2f} latent fps, "
                f"{4 * fpb / float(np.mean(steady)):.2f} pixel fps)"
            )
            self.last_block_times = block_times
        return latents
