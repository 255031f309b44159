"""Interactive generation with streaming prompt switches (KV-recache).

Re-design of the reference ``InteractiveCausalInferencePipeline``
(pipeline/interactive_causal_inference.py:20-432): all prompt segments are
encoded up-front; when generation reaches a switch index, the KV cache is
rebuilt by replaying the last ``min(local_attn_size, t)`` generated frames
under the new prompt in one jitted masked forward; generation then continues
from the same jitted block program.

``global_sink=False`` (the shipped interactive config) zeroes the cache and
lets the replay overwrite the sink slots — the sink becomes the first frames
of the replay window.  ``global_sink=True`` keeps the original sink KV
(the first frames of the *video*) and replays only the window
(interactive_causal_inference.py:36-53, 87-96; causal_model.py:303-304).
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import dit as D
from .causal_inference import CausalInferencePipeline


class InteractiveCausalInferencePipeline(CausalInferencePipeline):
    def generate_latents_interactive(
        self,
        noise: jax.Array,  # [B, T, C, H, W]
        cross_kv_list: Sequence[D.CrossKV],  # one per prompt segment
        switch_frame_indices: Sequence[int],  # len = segments - 1
        rng: Optional[jax.Array] = None,
        profile: bool = False,
        block_callback: Optional[Callable[[int, jax.Array], None]] = None,
    ) -> jax.Array:
        """Reference inference() (interactive_causal_inference.py:108-432)."""
        assert len(cross_kv_list) >= 1
        assert len(switch_frame_indices) == len(cross_kv_list) - 1
        b, t_frames = noise.shape[:2]
        fpb = self.frame_block
        assert t_frames % fpb == 0
        rng = rng if rng is not None else jax.random.PRNGKey(self.config.seed)
        global_sink = bool(self.config.global_sink)
        local = self.cfg.local_attn_size

        cache = self.init_cache(b, self.params["patch_embedding"]["kernel"].dtype)
        outputs: List[jax.Array] = []
        seg = 0
        next_switch = switch_frame_indices[0] if switch_frame_indices else None
        block_times, switch_times = [], []

        for s in range(0, t_frames, fpb):
            t0 = time.perf_counter()
            switched = False
            if next_switch is not None and s >= next_switch:
                seg += 1
                next_switch = (
                    switch_frame_indices[seg] if seg < len(switch_frame_indices) else None
                )
                # KV-recache: replay the last window under the new prompt
                # (interactive_causal_inference.py:34-106)
                n = s if local == -1 else min(local, s)
                if n > 0:
                    replay = jnp.concatenate(outputs, axis=1)[:, s - n : s]
                    cache = self._recache_fn(n, global_sink)(
                        self.params, cache, cross_kv_list[seg], replay,
                        jnp.asarray(s - n, jnp.int32),
                    )
                switched = True

            x0, cache, rng = self._block_fn(
                self.params, cache, cross_kv_list[seg], noise[:, s : s + fpb],
                jnp.asarray(s, jnp.int32), rng,
            )
            if block_callback is not None:
                block_callback(s, x0)
            outputs.append(x0)
            if profile:
                jax.block_until_ready(x0)
                dt = time.perf_counter() - t0
                (switch_times if switched else block_times).append(dt)

        if profile and block_times:
            self._report_profile(block_times, switch_times, fpb)
        return jnp.concatenate(outputs, axis=1)

    def generate_latents_interactive_scanned(
        self,
        noise: jax.Array,
        cross_kv_list: Sequence[D.CrossKV],
        switch_frame_indices: Sequence[int],
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Same semantics as generate_latents_interactive but each
        between-switch segment runs as ONE scanned device program (see
        generate_latents_scanned) — the production path."""
        assert len(switch_frame_indices) == len(cross_kv_list) - 1
        b, t_frames = noise.shape[:2]
        fpb = self.frame_block
        rng = rng if rng is not None else jax.random.PRNGKey(self.config.seed)
        global_sink = bool(self.config.global_sink)
        local = self.cfg.local_attn_size

        # segment boundaries: the reference switches at the first block whose
        # start is >= the switch index (interactive_causal_inference.py:237)
        bounds = [0]
        for si in switch_frame_indices:
            # round the switch up to a block start; clamp to the video end
            bounds.append(min(-(-si // fpb) * fpb, t_frames))
        bounds.append(t_frames)

        dtype = self.params["patch_embedding"]["kernel"].dtype
        cache = self.init_cache(b, dtype)
        outputs: List[jax.Array] = []
        # eager_recache: with switch positions known up-front (they are —
        # switch_frame_indices), the replay window is committed chunk by
        # chunk as its frames are generated, so the at-switch serial work
        # is ~zero instead of the full ~550 ms one-shot recache (see
        # EagerRecache; reference blockwise-causal mask semantics).
        use_eager = bool(self.config.eager_recache) and not global_sink
        er = None  # pending EagerRecache for the upcoming switch
        for seg in range(len(cross_kv_list)):
            s, e = bounds[seg], bounds[seg + 1]
            if e <= s:
                er = None
                continue  # switch index at/after the video end
            if seg > 0 and s > 0:
                n = s if local == -1 else min(local, s)
                if er is not None and er.n == n and er.fed == n:
                    cache = er.finish()
                elif n > 0:
                    replay = jnp.concatenate(outputs, axis=1)[:, s - n : s]
                    cache = self._recache_fn(n, global_sink)(
                        self.params, cache, cross_kv_list[seg], replay,
                        jnp.asarray(s - n, jnp.int32))
            er = None
            sw_next = bounds[seg + 1] if seg + 1 < len(cross_kv_list) else None
            n_next = 0
            if use_eager and sw_next is not None and sw_next > s:
                n_next = sw_next if local == -1 else min(local, sw_next)
                if n_next <= 0 or n_next % fpb:
                    n_next = 0  # odd replay size: one-shot fallback
            if n_next == 0:
                lat, cache, rng = self.generate_latents_scanned(
                    noise[:, s:e], cross_kv_list[seg], rng=rng, cache=cache,
                    start_frame=s)
                outputs.append(lat)
                continue
            er = self.begin_eager_recache(b, sw_next, dtype)
            cross_next = cross_kv_list[seg + 1]
            w0 = sw_next - n_next  # first frame of the replay window
            if outputs and w0 < s:  # window reaches into earlier segments
                hist = jnp.concatenate(outputs, axis=1)
                er.feed(cross_next, hist[:, w0:s], w0)
            split = max(s, w0)
            if split > s:  # pre-window part of the segment: one scan
                lat, cache, rng = self.generate_latents_scanned(
                    noise[:, s:split], cross_kv_list[seg], rng=rng,
                    cache=cache, start_frame=s)
                outputs.append(lat)
            for bs in range(split, e, fpb):  # window tail: feed per block
                # final pre-switch block: skip its commit pass outright —
                # the committed K/V would be read by nothing (the switch
                # replaces the cache), so the eager chunk under the new
                # prompt takes the commit's place in the schedule and the
                # switch adds ~zero serial device work
                fn = (self._block_fn_nocommit if bs + fpb >= e
                      else self._block_fn)
                x0, cache, rng = fn(
                    self.params, cache, cross_kv_list[seg],
                    noise[:, bs : bs + fpb], jnp.asarray(bs, jnp.int32), rng)
                outputs.append(x0)
                er.feed(cross_next, x0, bs)
        return jnp.concatenate(outputs, axis=1)

    def generate_latents_reactive(
        self,
        noise: jax.Array,  # [B, T, C, H, W]
        cross_kv: "D.CrossKV",
        poll_switch: Callable[[int], Optional["D.CrossKV"]],
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Serving loop for UNSCHEDULED prompt switches: before each block,
        ``poll_switch(block_start_frame)`` is consulted; a non-None return
        is a switch request that takes effect immediately via
        ``reactive_switch`` (reduced-window recache when
        ``config.reactive_recache_frames`` is set — the bounded-stall lever;
        reference-exact full-window replay otherwise).  This is the
        interactive surface for switches that are NOT known up-front
        (scheduled switches should use generate_latents_interactive*, whose
        eager recache hides the stall entirely)."""
        b, t_frames = noise.shape[:2]
        fpb = self.frame_block
        assert t_frames % fpb == 0
        rng = rng if rng is not None else jax.random.PRNGKey(self.config.seed)
        cache = self.init_cache(b, self.params["patch_embedding"]["kernel"].dtype)
        local = self.cfg.local_attn_size
        outputs: List[jax.Array] = []
        cross = cross_kv
        for s in range(0, t_frames, fpb):
            new_cross = poll_switch(s)
            if new_cross is not None and s > 0:
                # concatenate only the blocks covering the replay window —
                # the full-history concat is an O(T) device copy at the
                # worst possible moment (the switch stall)
                need = s if local == -1 else min(
                    local if self.config.reactive_recache_frames is None
                    else max(self.config.reactive_recache_frames, fpb), s)
                nblk = -(-need // fpb)
                history = jnp.concatenate(outputs[-nblk:], axis=1)
                cache = self.reactive_switch(cache, history, new_cross, s)
                cross = new_cross
            elif new_cross is not None:
                cross = new_cross  # switch before anything generated
            x0, cache, rng = self._block_fn(
                self.params, cache, cross, noise[:, s : s + fpb],
                jnp.asarray(s, jnp.int32), rng)
            outputs.append(x0)
        return jnp.concatenate(outputs, axis=1)

    def _report_profile(self, block_times, switch_times, fpb):
        steady = block_times[2:] or block_times
        per_frame = float(np.mean(steady)) / fpb
        print(
            f"[profile] steady-state latency={per_frame * 1e3:.2f} ms/latent-frame; "
            f"switch blocks avg="
            f"{(float(np.mean(switch_times)) * 1e3 if switch_times else 0):.2f} ms "
            f"(+{((float(np.mean(switch_times)) - float(np.mean(steady))) * 1e3 if switch_times else 0):.2f} ms recache overhead)"
        )
        self.last_block_times = block_times
        self.last_switch_times = switch_times
