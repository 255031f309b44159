"""Frame-level attention mask builders.

Functional equivalents of the reference flex-attention BlockMask builders
(wan/modules/causal_model.py:647-847).  Masks are built at *frame*
granularity ([F_q, F_kv] bool) since the structure is constant within a
frame; token-level expansion happens lazily (dense path) or arithmetically
inside kernels (Pallas path).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FrameMaskSpec:
    """Parametric description of a frame-structured mask — lets the Pallas
    masked-flash kernel compute it arithmetically instead of materializing a
    token-level [S, S] array (4+ GB at training scale)."""

    kind: str  # 'block_causal' | 'sink_window' | 'teacher_forcing'
    num_frame_per_block: int = 1
    local_attn_size: int = -1
    sink_frames: int = 0
    clean_frames: int = 0

    def materialize(self, num_frames: int) -> jax.Array:
        if self.kind == "block_causal":
            return blockwise_causal_frame_mask(
                num_frames, self.num_frame_per_block, self.local_attn_size)
        if self.kind == "sink_window":
            return sink_window_frame_mask(
                num_frames, self.num_frame_per_block, self.sink_frames,
                self.local_attn_size - self.sink_frames)
        if self.kind == "teacher_forcing":
            return teacher_forcing_frame_mask(num_frames, self.num_frame_per_block)
        raise ValueError(self.kind)


def blockwise_causal_frame_mask(
    num_frames: int,
    num_frame_per_block: int = 1,
    local_attn_size: int = -1,
) -> jax.Array:
    """[F, F] bool: query frame q attends kv frame k iff k is in a block that
    ends at or before q's block end, within the local window
    (causal_model.py:648-701: ``(kv < ends[q]) & (kv >= ends[q] - local)``).
    """
    q = jnp.arange(num_frames)[:, None]
    k = jnp.arange(num_frames)[None, :]
    ends = (q // num_frame_per_block + 1) * num_frame_per_block
    m = k < ends
    if local_attn_size != -1:
        m = m & (k >= ends - local_attn_size)
    return m


def blockwise_causal_frame_mask_i2v(
    num_frames: int, num_frame_per_block: int = 3, local_attn_size: int = -1
) -> jax.Array:
    """Variant with an independent first frame (causal_model.py:790-847):
    frame 0 is its own block, later frames form blocks of
    ``num_frame_per_block`` starting at frame 1."""
    q = jnp.arange(num_frames)[:, None]
    k = jnp.arange(num_frames)[None, :]
    blk = num_frame_per_block
    ends = jnp.where(q < 1, 1, ((q - 1) // blk + 1) * blk + 1)
    m = k < ends
    if local_attn_size != -1:
        m = m & (k >= ends - local_attn_size)
    return m


def teacher_forcing_frame_mask(
    num_frames: int, num_frame_per_block: int = 1
) -> jax.Array:
    """[2F, 2F] bool for the teacher-forcing layout [clean | noisy]
    (causal_model.py:703-788):
    - clean queries: blockwise-causal over clean frames;
    - noisy queries in block i: attend clean frames of *previous* blocks plus
      the noisy frames of their own block."""
    f, blk = num_frames, num_frame_per_block
    q = jnp.arange(2 * f)[:, None]
    k = jnp.arange(2 * f)[None, :]
    q_is_noise = q >= f
    qf = jnp.where(q_is_noise, q - f, q)
    q_block = qf // blk
    # the k < f / k < 2f clamps matter only when num_frames is NOT a
    # multiple of the block: the reference's token-interval construction
    # (causal_model.py:742-762, context_ends = start + block_size) lets a
    # PARTIAL final block's interval spill past its half of the sequence
    # (clean queries reaching noisy tokens, noisy blocks reaching padding)
    # — an artifact its shipped 21/3 geometry never exercises.  Here the
    # intent (clean attends clean, noisy attends its own noisy block) is
    # enforced at every frame count, matching the arithmetic flash-kernel
    # mask (ops/attention._masked_flash_kernel).
    clean_mask = (~q_is_noise) & (k < jnp.minimum((q_block + 1) * blk, f))
    noise_own = (k >= f + q_block * blk) & (k < jnp.minimum(
        f + (q_block + 1) * blk, 2 * f))
    noise_ctx = k < q_block * blk
    noise_mask = q_is_noise & (noise_own | noise_ctx)
    return clean_mask | noise_mask | (q == k)


def sink_window_frame_mask(
    num_frames: int,
    num_frame_per_block: int,
    sink_frames: int,
    ring_frames: int,
) -> jax.Array:
    """[F, F] bool: the effective attention pattern realized by cached
    generation with a frame sink + ring window — query frame q sees kv frame
    k iff k was generated no later than q's block AND (k is a sink frame OR k
    is among the last ``ring_frames`` frames at that point).  Equivalent to
    the reference's sink ++ rolled-window concat (causal_model.py:331-360).
    """
    q = jnp.arange(num_frames)[:, None]
    k = jnp.arange(num_frames)[None, :]
    ends = (q // num_frame_per_block + 1) * num_frame_per_block
    causal = k < ends
    in_sink = k < sink_frames
    in_ring = k >= jnp.maximum(ends - ring_frames, sink_frames)
    return causal & (in_sink | in_ring)


def expand_frame_mask(frame_mask: jax.Array, frame_seq: int) -> jax.Array:
    """[Fq, Fkv] -> [Fq*fs, Fkv*fs] token-level bool.  Only for small tests;
    large shapes use the kernel-side arithmetic mask."""
    return jnp.repeat(jnp.repeat(frame_mask, frame_seq, axis=0), frame_seq, axis=1)
