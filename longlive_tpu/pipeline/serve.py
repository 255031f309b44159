"""Pipelined serving: overlap VAE decode with next-segment generation.

The reference decodes the whole video serially AFTER generation (22 s on
H100, vae.py:545-569, reports.md:37).  Our single-chip path already streams
the decode per segment; this module goes one step further for multi-chip
serving: the causal DiT generates on one device (or an ``sp`` mesh) while
the VAE decodes the PREVIOUS segment on another device.  JAX dispatch is
asynchronous, so simply issuing the decode for segment ``n`` before blocking
on generation of segment ``n+1`` overlaps the two on disjoint devices — no
threads, no streams, no host synchronization; the latents hop devices via an
async ICI copy.

Steady-state wall time per segment = max(T_generate, T_decode) instead of
their sum (~250 ms/latent-frame of VAE decode disappears behind the ~400 ms
DiT time on v5e; on a v5e-4 SP mesh the DiT drops to ~120 ms/frame and the
decode chip becomes the critical path).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from ..models import vae as V
from .causal_inference import CausalInferencePipeline


class PipelinedRenderer:
    """Drives generate -> transfer -> decode with segment-level overlap.

    pipe:          a CausalInferencePipeline (optionally SP-meshed).
    vae_params:    VAE parameter pytree; placed on ``decode_device``.
    decode_device: device for the VAE stream (default: last visible device;
                   pass the generation device to run serially on one chip).
    segment_frames: latent frames per pipeline stage (multiple of the
                   pipeline's frame block; larger = better dispatch
                   amortization, smaller = lower first-frame latency).
    per_stream_decode: with batched serving (B > 1), decode each stream's
                   latents as a separate B=1 call (one compile, reused
                   across streams) — the decode device's peak HBM is ONE
                   stream's decode temps instead of B× (measured round 2:
                   B=2 full-VAE decode OOMs a 16 GB v5e batched).  The
                   per-stream calls dispatch back-to-back on the decode
                   device, so they all still overlap generation of the
                   next segment; batched VAE gains nothing on one chip
                   anyway (the 480×832 convs saturate it without batch
                   amortization — PERF.md B=2 note).
    """

    def __init__(
        self,
        pipe: CausalInferencePipeline,
        vae_params: dict,
        vae_cfg: V.VAEConfig,
        segment_frames: int = 12,
        decode_device: Optional[jax.Device] = None,
        per_stream_decode: bool = False,
    ):
        assert segment_frames % pipe.frame_block == 0
        self.pipe = pipe
        self.vcfg = vae_cfg
        self.segment_frames = segment_frames
        self.per_stream_decode = per_stream_decode
        self.decode_device = decode_device or jax.devices()[-1]
        self.vae_params = jax.device_put(vae_params, self.decode_device)
        # pin execution to the decode device via shardings (jit's `device=`
        # argument is deprecated): params/latents are device_put there and
        # out_shardings keeps the outputs in place
        dd_sharding = jax.sharding.SingleDeviceSharding(self.decode_device)
        self._decode_first = jax.jit(
            lambda p, z: V.vae_decode_scan(p, vae_cfg, z, None, True),
            out_shardings=dd_sharding)
        self._decode_rest = jax.jit(
            lambda p, z, c: V.vae_decode_scan(p, vae_cfg, z, c, False),
            out_shardings=dd_sharding)
        if len(jax.devices()) == 1:
            # single-chip serving (decode shares the generation chip): the
            # decode programs join the AOT executable cache — multi-device
            # placements embed a device assignment and stay plain jit
            from ..utils import aot_cache

            if aot_cache.enabled():
                key = f"serve-decode-{vae_cfg!r}-{segment_frames}"
                self._decode_first = aot_cache.aot_jit(
                    lambda p, z: V.vae_decode_scan(p, vae_cfg, z, None, True),
                    key=key + "-first")
                self._decode_rest = aot_cache.aot_jit(
                    lambda p, z, c: V.vae_decode_scan(p, vae_cfg, z, c, False),
                    key=key + "-rest")

    def render(
        self,
        noise: jax.Array,  # [B, T, C, H, W]
        cross_kv,
        rng: Optional[jax.Array] = None,
        dtype=jnp.bfloat16,
        poll_switch=None,
    ) -> jax.Array:
        """Returns pixels [B, 1 + 4*(T-1), 3, H*8, W*8] in [-1, 1].

        Dispatch order per segment i: generate(i) -> copy(i) -> decode(i);
        none of these block the host, so decode(i) (on the decode device)
        runs concurrently with generate(i+1) (on the generation device).

        ``poll_switch(segment_start_frame) -> Optional[CrossKV]``: consulted
        before each segment; a non-None return is an UNSCHEDULED prompt
        switch applied via ``CausalInferencePipeline.reactive_switch``
        (reduced-window replay when ``reactive_recache_frames`` is set).
        Switch granularity is one pipeline segment — lower
        ``segment_frames`` for finer switch latency.
        """
        b, t = noise.shape[:2]
        seg = self.segment_frames
        pipe = self.pipe
        rng = rng if rng is not None else jax.random.PRNGKey(pipe.config.seed)
        cache = None
        vae_caches = None
        pixel_segs: List[jax.Array] = []
        # rolling latent history for reactive replays (generation device).
        # At local_attn_size == -1 (global attention) a reference-exact
        # replay needs the WHOLE history; bound it by
        # reactive_recache_frames so an idle poll_switch doesn't pin the
        # full video's latents (~0.4 GB/stream at 960f) in HBM — an
        # unbounded global-attention replay must be requested explicitly.
        local = pipe.config.local_attn_size
        window = (local if local != -1
                  else (pipe.config.reactive_recache_frames or t))
        hist: Optional[jax.Array] = None
        start = 0
        while start < t:
            if poll_switch is not None:
                new_cross = poll_switch(start)
                if new_cross is not None:
                    if start > 0:
                        cache = pipe.reactive_switch(cache, hist, new_cross,
                                                     start)
                    cross_kv = new_cross
            n = min(seg, t - start)
            lat, cache, rng = pipe.generate_latents_scanned(
                noise[:, start : start + n], cross_kv, rng=rng, cache=cache,
                start_frame=start)
            if poll_switch is not None:
                hist = (lat if hist is None
                        else jnp.concatenate([hist, lat], axis=1))[:, -window:]
            lat_d = jax.device_put(lat.astype(dtype), self.decode_device)
            if self.per_stream_decode and b > 1:
                # B separate B=1 decodes (independent conv-cache chains per
                # stream; the VAE has no cross-sample ops, so this equals
                # the batched decode) — peak HBM = one stream's temps
                if vae_caches is None:
                    vae_caches = [None] * b
                px_rows = []
                for s in range(b):
                    if start == 0:
                        row, vae_caches[s] = self._decode_first(
                            self.vae_params, lat_d[s : s + 1])
                    else:
                        row, vae_caches[s] = self._decode_rest(
                            self.vae_params, lat_d[s : s + 1], vae_caches[s])
                    px_rows.append(row)
                px = jnp.concatenate(px_rows, axis=0)
            elif start == 0:
                px, vae_caches = self._decode_first(self.vae_params, lat_d)
            else:
                px, vae_caches = self._decode_rest(self.vae_params, lat_d,
                                                   vae_caches)
            pixel_segs.append(px)
            start += n
        return jnp.concatenate(pixel_segs, axis=1)
