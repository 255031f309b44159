"""Functional frame-sink + ring-window KV cache.

This replaces the reference's mutable per-layer cache dicts and their
clone / roll / insert / deferred-commit machinery
(wan/modules/causal_model.py:228-325, 849-905) with branch-free index math on
an immutable pytree.  Key ideas:

- The cache buffer is ``[sink | ring]`` frames.  Frame ``f`` lives at
  frame-slot ``f`` if ``f < sink`` else ``sink + (f - ring_base) % ring``.
  Nothing is ever rolled or cloned; steady-state eviction is just the ring
  overwriting the oldest slot — the reference's roll drops exactly the same
  frames because block size divides the ring size.
- Decode attention in the reference is dense over [sink ++ window] with *no*
  intra-window mask (causal_model.py:331-360), so slot order inside the ring
  is irrelevant; only a validity mask is needed during warmup.
- The reference's ``is_recompute`` pointer bookkeeping (causal_model.py:230,
  900-904) disappears: the 4 denoise passes simply *discard* the cache they
  wrote (their writes land in the same slots), and the clean-context commit
  pass returns the cache that survives.
- ``ring_base`` generalizes prompt-switch KV-recache
  (pipeline/interactive_causal_inference.py:34-106): after replaying the last
  ``n`` frames ending at frame ``c``, the reference leaves them packed
  linearly at the front of the buffer; setting ``ring_base = c - n + sink``
  makes subsequent ring writes evict in exactly the reference's order.

All scalars are int32 device scalars so that a single jitted program serves
every block position.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import CacheConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KVCache:
    """Stacked per-layer KV cache.

    k, v:        [L, B, size_tokens, num_heads, head_dim] (roped keys).
    ring_base:   [] int32 — absolute frame mapped to ring slot 0.
    sink_filled: [] int32 — valid frames in the sink region.
    ring_filled: [] int32 — valid frame-slots in the ring region.
    k_scale:     [L, B, size_tokens, num_heads] f32 per-token dequant
                 scales when ``k`` is stored int8 (serving-only int8 KV
                 mode: keys are quantized ONCE at write time, so no
                 per-forward K-quantize pass exists — the cost that made
                 per-forward int8-QK a net loss, PERF.md); None for the
                 bf16 cache.
    v_scale:     like ``k_scale`` for an int8 ``v`` — the TRAINING
                 rollout's cache_int8 mode stores BOTH k and v int8
                 (cache contents are stop-gradded context, so this is a
                 pure memory lever: it halves the rollout's dominant HBM
                 resident and the remat-saved input of the differentiated
                 exit forward; see PERF.md full-geometry 1.3B section).
    """

    k: jax.Array
    v: jax.Array
    ring_base: jax.Array
    sink_filled: jax.Array
    ring_filled: jax.Array
    k_scale: jax.Array | None = None
    v_scale: jax.Array | None = None


def init_cache(
    cfg: CacheConfig,
    num_layers: int,
    batch: int,
    num_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    k_int8: bool = False,
    v_int8: bool = False,
) -> KVCache:
    shape = (num_layers, batch, cfg.size_tokens, num_heads, head_dim)
    # distinct buffers per field: donated pytrees must not alias
    return KVCache(
        k=jnp.zeros(shape, jnp.int8 if k_int8 else dtype),
        v=jnp.zeros(shape, jnp.int8 if v_int8 else dtype) + 0,
        ring_base=jnp.full([], cfg.sink_frames, jnp.int32),
        sink_filled=jnp.zeros([], jnp.int32),
        ring_filled=jnp.zeros([], jnp.int32) + 0,
        k_scale=jnp.zeros(shape[:-1], jnp.float32) if k_int8 else None,
        v_scale=jnp.zeros(shape[:-1], jnp.float32) + 0 if v_int8 else None,
    )


def kl_pad_tokens(cfg: CacheConfig, pad_to: int = 1024) -> int:
    """Token length of the kernel-layout cache buffer: size_tokens rounded
    up to a ``pad_to`` multiple so every LONGLIVE_BKV candidate (256/512/
    1024) divides it — the flash kernel consumes the buffer directly with
    no per-layer pad pass."""
    return -(-cfg.size_tokens // pad_to) * pad_to


def init_cache_kl(
    cfg: CacheConfig,
    num_layers: int,
    batch: int,
    num_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> KVCache:
    """KERNEL-LAYOUT cache: k, v stored ``[L*B*N, S_pad, D]`` — the flash
    kernel's own operand layout, so decode attention reads the cache with
    ZERO per-layer relayout and the layer scan carries the buffers with
    in-place block writes (no written-through scan-ys copies).  See
    models.dit._dit_forward_cached_kl.  Distinguished from the standard
    [L, B, S, N, D] cache by ndim == 3."""
    sp = kl_pad_tokens(cfg)
    shape = (num_layers * batch * num_heads, sp, head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype) + 0,
        ring_base=jnp.full([], cfg.sink_frames, jnp.int32),
        sink_filled=jnp.zeros([], jnp.int32),
        ring_filled=jnp.zeros([], jnp.int32) + 0,
    )


def to_kernel_layout(cfg: CacheConfig, cache: KVCache) -> KVCache:
    """[L, B, S, N, D] -> [L*B*N, S_pad, D] (one relayout pass)."""
    L, b, s, n, d = cache.k.shape
    sp = kl_pad_tokens(cfg)

    def _conv(x):
        x = x.transpose(0, 1, 3, 2, 4).reshape(L * b * n, s, d)
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))

    return dataclasses.replace(cache, k=_conv(cache.k), v=_conv(cache.v))


def from_kernel_layout(
    cfg: CacheConfig, cache: KVCache, num_layers: int, batch: int,
    num_heads: int,
) -> KVCache:
    """[L*B*N, S_pad, D] -> [L, B, S, N, D] (inverse of to_kernel_layout)."""
    s = cfg.size_tokens
    d = cache.k.shape[-1]

    def _conv(x):
        x = x[:, :s].reshape(num_layers, batch, num_heads, s, d)
        return x.transpose(0, 1, 3, 2, 4)

    return dataclasses.replace(cache, k=_conv(cache.k), v=_conv(cache.v))


def frame_slot(cfg: CacheConfig, frame: jax.Array, ring_base: jax.Array) -> jax.Array:
    """Frame-granular cache slot for absolute frame index ``frame``."""
    frame = jnp.asarray(frame, jnp.int32)
    in_sink = frame < cfg.sink_frames
    ring_slot = cfg.sink_frames + jnp.mod(frame - ring_base, cfg.ring_frames)
    return jnp.where(in_sink, frame, ring_slot)


def block_write_offsets(
    cfg: CacheConfig, cache: KVCache, start_frame: jax.Array, num_frames: int
) -> jax.Array:
    """[num_frames] int32 token offsets into the cache buffer for the frames
    [start_frame, start_frame + num_frames)."""
    frames = jnp.asarray(start_frame, jnp.int32) + jnp.arange(num_frames, dtype=jnp.int32)
    slots = frame_slot(cfg, frames, cache.ring_base)
    return slots * cfg.frame_seq


def write_block_kv(
    cfg: CacheConfig,
    cache_k_layer: jax.Array,  # [B, size_tokens, N, D]
    cache_v_layer: jax.Array,
    new_k: jax.Array,  # [B, F*frame_seq, N, D] (roped)
    new_v: jax.Array,
    offsets: jax.Array,  # [F] from block_write_offsets
) -> Tuple[jax.Array, jax.Array]:
    """Writes a block's roped K/V into one layer's cache buffer, one frame at
    a time (frames may map to non-contiguous slots)."""
    num_frames = offsets.shape[0]
    fs = cfg.frame_seq
    k, v = cache_k_layer, cache_v_layer
    for i in range(num_frames):
        kf = jax.lax.dynamic_slice_in_dim(new_k, i * fs, fs, axis=1)
        vf = jax.lax.dynamic_slice_in_dim(new_v, i * fs, fs, axis=1)
        k = jax.lax.dynamic_update_slice_in_dim(k, kf.astype(k.dtype), offsets[i], axis=1)
        v = jax.lax.dynamic_update_slice_in_dim(v, vf.astype(v.dtype), offsets[i], axis=1)
    return k, v


def advance(cfg: CacheConfig, cache: KVCache, start_frame, num_frames: int) -> KVCache:
    """Counter update after committing a block at [start_frame, +num_frames)."""
    start = jnp.asarray(start_frame, jnp.int32)
    end = start + num_frames
    sink_filled = jnp.maximum(cache.sink_filled, jnp.minimum(end, cfg.sink_frames))
    to_ring = jnp.maximum(end - jnp.maximum(start, cfg.sink_frames), 0)
    ring_filled = jnp.minimum(cache.ring_filled + to_ring, cfg.ring_frames)
    return dataclasses.replace(cache, sink_filled=sink_filled, ring_filled=ring_filled)


def validity_mask(
    cfg: CacheConfig,
    cache: KVCache,
    start_frame,
    num_frames: int,
    token_level: bool = True,
    window_frames: int | None = None,
    exclude_block: bool = False,
) -> jax.Array:
    """Boolean mask over cache slots that attention may see for a forward at
    [start_frame, +num_frames).  Includes the current block (the reference
    window always contains the tokens being denoised,
    causal_model.py:331-360).

    ``window_frames`` caps the attention budget (sink + most-recent frames)
    when the cache retains MORE history than the window — the training
    pipelines size the cache at min(local+slice, num_training) frames but
    attend only sink + (local - sink) recent frames via max_attention_size
    (self_forcing_training.py:59-74, causal_model.py:331-341).

    ``exclude_block=True`` removes the slots the current block writes —
    the TWO-SEGMENT decode path attends [old cache ++ fresh block] with
    the block's K/V as a separate kernel operand, so its (stale /
    about-to-be-evicted) cache slots must be masked out of the first
    segment.  The union of this mask and the fresh block equals the
    single-segment post-write mask exactly."""
    after = advance(cfg, cache, start_frame, num_frames)
    slots = jnp.arange(cfg.total_frames, dtype=jnp.int32)
    in_sink = slots < cfg.sink_frames
    valid = jnp.where(
        in_sink, slots < after.sink_filled, (slots - cfg.sink_frames) < after.ring_filled
    )
    if window_frames is not None and window_frames - cfg.sink_frames < cfg.ring_frames:
        budget = window_frames - cfg.sink_frames
        end = jnp.asarray(start_frame, jnp.int32) + num_frames
        r = slots - cfg.sink_frames
        # latest absolute frame held by ring slot r (meaningless for unwritten
        # slots, which the fill mask already excludes)
        slot_frame = end - 1 - jnp.mod(end - 1 - (cache.ring_base + r), cfg.ring_frames)
        recent = slot_frame >= end - budget
        valid = valid & (in_sink | recent)
    if exclude_block:
        frames = (jnp.asarray(start_frame, jnp.int32)
                  + jnp.arange(num_frames, dtype=jnp.int32))
        blk = frame_slot(cfg, frames, cache.ring_base)  # [num_frames]
        valid = valid & ~(slots[:, None] == blk[None, :]).any(axis=1)
    if token_level:
        valid = jnp.repeat(valid, cfg.frame_seq)
    return valid


def recache_state(
    cfg: CacheConfig, cache: KVCache, end_frame, num_recache_frames
) -> KVCache:
    """Scalar-state update for a KV-recache that replayed frames
    [end_frame - n, end_frame) packed linearly at the front of the buffer
    (reference interactive_causal_inference.py:34-106).  The buffer contents
    are rewritten by the recache forward itself."""
    end = jnp.asarray(end_frame, jnp.int32)
    n = jnp.asarray(num_recache_frames, jnp.int32)
    return dataclasses.replace(
        cache,
        ring_base=end - n + cfg.sink_frames,
        sink_filled=jnp.minimum(n, cfg.sink_frames),
        ring_filled=jnp.clip(n - cfg.sink_frames, 0, cfg.ring_frames),
    )


def zero_cache(cache: KVCache) -> KVCache:
    """Zeroes buffer contents, keeping scalars (the reference zeroes k/v but
    *not* the end indices at a prompt switch,
    interactive_causal_inference.py:38-45)."""
    return dataclasses.replace(
        cache, k=jnp.zeros_like(cache.k), v=jnp.zeros_like(cache.v),
        k_scale=None if cache.k_scale is None else jnp.zeros_like(cache.k_scale),
        v_scale=None if cache.v_scale is None else jnp.zeros_like(cache.v_scale),
    )
