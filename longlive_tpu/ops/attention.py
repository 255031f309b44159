"""Attention kernels for the causal DiT.

The reference dispatches FlashAttention-2/3 CUDA kernels for decode attention
over [sink ++ window] (wan/modules/attention.py:43-197,
causal_model.py:331-360) and torch.compile(flex_attention) Triton kernels for
masked prefill (causal_model.py:28-29,168-204).  Here:

- ``flash_attention``: a Pallas TPU flash-attention kernel (online softmax,
  never materializes logits) over arbitrary [B, S, N, D] with an optional
  per-KV-token additive bias.  Used for decode (Sq = one block, Skv = cache)
  and for recache prefill (Sq = window, Skv = cache) — the reference's
  recache forward is also dense over the window (its flex block-mask is
  ignored on the cached path, interactive_causal_inference.py:84-96 ->
  causal_model.py:205+).
- ``dense_attention``: an XLA einsum fallback for tests / tiny shapes / CPU.
- ``attend``: dispatcher.

Layout convention matches the reference: [B, S, N, D] (batch, seq, heads,
head_dim), softmax scale 1/sqrt(D).
"""

from __future__ import annotations

import functools
import os
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def dense_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference attention: softmax(q k^T / sqrt(d) + bias) v.

    q: [B, Sq, N, D]; k, v: [B, Skv, N, D]; bias broadcastable to
    [B, N, Sq, Skv] (commonly [B, 1, 1, Skv]).  Logits in f32.
    """
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum(
        "bsnd,btnd->bnst", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnst,btnd->bsnd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


_LANES = 128


def _flash_kernel(*refs, has_bias: bool, qk_int8: bool = False,
                  nkv1: int = 0, skip: bool = False, kl: bool = False,
                  rope: bool = False, exp2: bool = False,
                  mxu_lsum: bool = False):
    """One (head, q_block, kv_block) grid step of flash attention.

    Refs: [bias [1, bkv] f32 if has_bias],
    [qsc [1, bq, 1] + ksc [1, 1, bkv] f32 if qk_int8],
    q [1, bq, D] (pre-scaled; int8 when qk_int8), k, v [1, bkv, D]
    (k int8 when qk_int8), [k2, v2 [1, bkv, D] if nkv1 > 0],
    out [1, bq, D]; scratch m, l [bq, 128] f32
    (lane-replicated — (bq, 1) layouts relayout on every op), acc [bq, D]
    f32.  The kv grid dimension is innermost, so scratch carries the
    online-softmax state across kv blocks.

    nkv1 > 0: TWO-SEGMENT KV.  kv grid steps [0, nkv1) read the first
    (cache) segment, steps >= nkv1 read the second (fresh block) segment
    — the online softmax spans both.  This lets the decode path attend
    [cache ++ new-block] WITHOUT materializing a concatenated (or
    written-through) copy of the full cache per layer; the per-tile
    jnp.where select costs one [bkv, D] VPU pass, nothing at [bq, bkv]
    scale.  Index maps clamp so each segment's ref re-reads a resident
    tile while the other segment streams (Pallas skips DMA when the
    block index is unchanged).

    qk_int8: the QK^T contraction runs on the int8 MXU pipe (2x bf16
    throughput on v5e).  Q/K are symmetrically quantized *per token*
    outside the kernel (one fused XLA pass); the row/column scale
    vectors are applied to the f32 logits here — unlike the round-1
    SageAttention-style variant (P requantization cost two extra
    [bq,bkv] VPU passes and 4%% output error; PERF.md), P stays bf16
    and PV stays on the bf16 pipe, so the only extra VPU work is the
    s32->f32 convert+scale, and K HBM reads halve.

    skip: scalar-prefetch DEAD-TILE ELISION (two-segment decode).  Two
    prefetched [nkv_total] int32 arrays lead the refs: ``tile_map``
    redirects every fully-masked first-segment kv tile's index to the
    NEXT live tile (so the dead grid steps pre-stream the tile the next
    live step needs and Pallas elides the duplicate DMA — zero wasted
    bandwidth), and ``live`` gates the whole accumulate body.  This is
    what makes the two-segment form cheaper than write-then-attend: the
    block's (masked-invalid) ring slots are neither streamed nor
    computed, so total attended tokens match the written-through cache
    exactly while the per-layer cache write-out disappears.
    """
    idx = 0
    tm_ref = lv_ref = None
    if skip:
        lv_ref = refs[1]
        refs = refs[2:]
    elif kl:
        # kernel-layout cache mode: the prefetched layer index is consumed
        # by the k/v BlockSpec index maps only — drop its ref here
        refs = refs[1:]
    bias_ref = qsc_ref = ksc_ref = None
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    if qk_int8:
        qsc_ref = refs[idx]; ksc_ref = refs[idx + 1]; idx += 2
    cs_ref = sn_ref = qbuf_ref = None
    if rope:
        cs_ref = refs[idx]; sn_ref = refs[idx + 1]; idx += 2
        qbuf_ref = refs[-1]
        refs = refs[:-1]
    if nkv1 > 0:
        (q_ref, k_ref, v_ref, k2_ref, v2_ref,
         o_ref, m_ref, l_ref, acc_ref) = refs[idx:]
    else:
        q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs[idx:]
        k2_ref = v2_ref = None
    ikv = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(ikv == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if rope:
            # q-side RoPE prologue (halfsplit layout, softmax scale folded
            # into the cs/sn multipliers outside): rotates the raw q tile
            # once per (iq, h) into a VMEM scratch — the external rope pass
            # over q and its HBM round trip disappear, and the VPU work
            # overlaps the first kv tile's MXU step.  swap = [im ++ re]
            # (two half-lane slices, exactly ops.rope.apply_rotary's
            # halfsplit form).
            qf = q_ref[0].astype(jnp.float32)
            half = qf.shape[-1] // 2
            qsw = jnp.concatenate([qf[:, half:], qf[:, :half]], axis=-1)
            qbuf_ref[...] = (qf * cs_ref[...] + qsw * sn_ref[...]).astype(
                qbuf_ref.dtype)

    def _accumulate():
        q = qbuf_ref[...] if rope else q_ref[0]  # [bq, D]
        if nkv1 > 0:
            in_seg1 = ikv < nkv1
            k = jnp.where(in_seg1, k_ref[0], k2_ref[0])
            v_tile = jnp.where(in_seg1, v_ref[0], v2_ref[0])
        else:
            k = k_ref[0]  # [bkv, D]
            v_tile = v_ref[0]
        bkv = k.shape[0]
        if qk_int8:
            s32 = jax.lax.dot_general(
                q,
                k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = s32.astype(jnp.float32) * qsc_ref[0] * ksc_ref[0]  # [bq,1]*[1,bkv]
        else:
            s = jax.lax.dot_general(
                q,
                k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if has_bias:
            s = s + bias_ref[0][None, :]

        def _to_w(x128, w):  # [bq, 128] -> [bq, w]
            if w == _LANES:
                return x128
            if w < _LANES:
                return x128[:, :w]
            return pltpu.repeat(x128, w // _LANES, axis=1)

        m_prev = m_ref[:]  # [bq, 128]
        l_prev = l_ref[:]
        m_cur = jnp.max(s, axis=-1)[:, None]  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)  # [bq, 128]
        # exp2 mode: log2(e) is folded into the softmax scale (and bias /
        # int8 scales) OUTSIDE the kernel, so exp(x) == exp2(x') — saves
        # the VPU a multiply per [bq, bkv] element on the softmax's hot
        # pass (the kernel is VPU-bound at the decode shape, not MXU-bound)
        _e = jnp.exp2 if exp2 else jnp.exp
        alpha = _e(m_prev - m_new)
        p = _e(s - _to_w(m_new, bkv))
        if mxu_lsum:
            # row-sum on the MXU: p @ ones[bkv, 128] lands the sum already
            # lane-replicated in the [bq, 128] state layout — replaces the
            # VPU lane-reduction + broadcast with one extra matmul the MXU
            # has headroom for
            psum = jax.lax.dot_general(
                p.astype(v_tile.dtype), jnp.ones((bkv, _LANES), v_tile.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            l_ref[:] = l_prev * alpha + psum
        else:
            l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1)[:, None]
        m_ref[:] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_tile.dtype),
            v_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * _to_w(alpha, q.shape[-1]) + pv

    if skip:
        pl.when(lv_ref[ikv] != 0)(_accumulate)
    else:
        _accumulate()

    d_out = o_ref.shape[-1]

    def _to_d(x128):  # [bq, 128] -> [bq, D]
        if d_out == _LANES:
            return x128
        if d_out < _LANES:
            return x128[:, :d_out]
        return pltpu.repeat(x128, d_out // _LANES, axis=1)

    @pl.when(ikv == nkv - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / _to_d(l_ref[:])).astype(o_ref.dtype)


def _pad_axis(x: jax.Array, axis: int, to: int, value=0.0) -> jax.Array:
    pad = to - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _auto_block_q(sq: int, frame_seq: Optional[int] = None) -> int:
    """Frame-aligned q block when the caller supplies ``frame_seq``, else 256.

    Measured on v5e at the decode shape (Sq=4680, Skv=18720): bq=1560
    (frame-aligned, zero pad) runs 3.76 ms vs 4.59 ms for bq=256 (+18%) —
    the pad rows cost real MXU work and the larger tile amortizes the
    online-softmax scratch passes.  KV blocks must stay multiples of 128
    (lane-replicated scratch), so Skv keeps its ~4% pad with bkv=1024.

    The candidates are derived from the actual tokens-per-frame (so any
    resolution gets a zero-pad frame-aligned tile, not just 480x832's
    1560), capped at the largest measured-safe VMEM tile; shapes with no
    frame structure (training full-sequence, tests) keep the profiled
    bq=256 default.

    Round-4 chip A/B (scripts/r4_attn_ab.sh): a WHOLE-Sq q tile at the
    decode shape (bq=4680 with bkv=256) beats bq=1560/bkv=512 by 8.1%
    per block (617.2 vs 671.7 ms) — each KV tile then streams ONCE per
    (layer, head) instead of once per q tile.  The cap is therefore the
    full 3-frame decode Sq (4680 = acc+m+l scratch ~7.2 MB f32, which
    compiled and won; bkv=512 at that bq exceeds VMEM, bkv=128 loses).

    Shape-safety of the 4680 cap: the kernel's VMEM footprint is set by
    the TILE sizes (bq x d operand + bq-row acc/m/l scratch + bkv x d KV
    tiles), not by total Sq/Skv — a shape that picks bq=4680 has the same
    VMEM budget as the measured decode case regardless of sequence
    length.  Measured at this cap on v5e (round 4): 3-frame decode 617.2
    ms/block (-8.1%), 9-frame switch recache 501.8 ms (-8.4% vs 547.6 at
    the old 2048 cap), 6-frame reactive replay 336 ms — all three
    frame-structured serving shapes improved.
    """
    if frame_seq is None or frame_seq <= 0 or frame_seq % 8 or sq % frame_seq:
        return 256
    frames = sq // frame_seq
    cap = max(4680, frame_seq)
    best = 256
    for k in range(1, frames + 1):
        if frames % k == 0 and frame_seq * k <= cap:
            best = frame_seq * k
    return best


def _skip_tile_arrays(skip_ranges: jax.Array, nkv1: int, nkv2: int,
                      block_kv: int):
    """(tile_map, live) int32 [nkv1+nkv2] from token ranges [R, 2] that are
    fully masked in the first segment.  A tile is dead iff the (disjoint)
    ranges cover it completely; dead tiles redirect to the NEXT live tile
    (falling back to the previous one at an all-dead tail) so consecutive
    grid steps repeat the block index and Pallas elides the DMA."""
    idx = jnp.arange(nkv1, dtype=jnp.int32)
    lo = idx * block_kv
    hi = lo + block_kv
    cov = jnp.zeros((nkv1,), jnp.int32)
    for r in range(skip_ranges.shape[0]):
        a, b = skip_ranges[r, 0], skip_ranges[r, 1]
        cov = cov + jnp.maximum(0, jnp.minimum(hi, b) - jnp.maximum(lo, a))
    live = (cov < block_kv).astype(jnp.int32)
    live_idx = jnp.where(live == 1, idx, nkv1)
    nxt = jax.lax.associative_scan(jnp.minimum, live_idx[::-1])[::-1]
    prv = jax.lax.associative_scan(jnp.maximum, jnp.where(live == 1, idx, -1))
    tm = jnp.where(nxt < nkv1, nxt, jnp.maximum(prv, 0)).astype(jnp.int32)
    if nkv2:
        # second segment: identity — the concatenated bias/scale operands
        # span both segments, so their tiles must keep true indices; the
        # seg1 k/v index map clamps tm to nkv1-1 there anyway
        tm = jnp.concatenate(
            [tm, jnp.arange(nkv1, nkv1 + nkv2, dtype=jnp.int32)])
        live = jnp.concatenate([live, jnp.ones((nkv2,), jnp.int32)])
    return tm, live


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    frame_seq: Optional[int] = None,
    qk_int8: bool = False,
    k2: Optional[jax.Array] = None,
    v2: Optional[jax.Array] = None,
    k_scales: Optional[jax.Array] = None,
    skip_ranges: Optional[jax.Array] = None,
    kv_layer: Optional[jax.Array] = None,
    q_rope: Optional[Tuple[jax.Array, jax.Array]] = None,
    interpret: bool = False,
) -> jax.Array:
    """Tile resolution OUTSIDE the jit: reading LONGLIVE_BKV inside the
    jitted body would capture the first trace's value in the compile
    cache, silently ignoring in-process knob changes (the A/B trap).
    See _flash_attention_jit for the full contract."""
    if block_q is None:
        env_bq = os.environ.get("LONGLIVE_BQ")
        if env_bq:
            # explicit q-tile override (VMEM-permitting; a whole-Sq tile
            # kills the x(num q tiles) KV re-streaming at VMEM cost).
            # Honored even for qk_int8 — an A/B must get the tile it asked
            # for (a too-big tile fails loudly at compile, not silently)
            block_q = min(int(env_bq), q.shape[1])
        else:
            block_q = _auto_block_q(q.shape[1], frame_seq)
            if qk_int8 and block_q > 1560:
                # the int8-QK operand set (q/k int8 + scale vectors + f32
                # rescale temps) exceeds VMEM at the whole-Sq tile
                # (measured: scoped-vmem OOM by 1.24M at bq=4680/bkv=256);
                # keep the r2-profiled frame tile there
                block_q = 1560
    if block_kv is None:
        # kv tile (lane-dim blocks must be 128-multiples, so frame-exact
        # tiles are impossible at 1560 tokens/frame); LONGLIVE_BKV sweeps
        # the dead-tile-elision granularity e2e (smaller tiles elide more
        # of a skip range at more grid-step overhead).  At bq<=1560, 512
        # measured fastest (5.512 vs 5.796 ms/layer, r2b/r2c); at the
        # whole-Sq q tile 256 is required for VMEM and measured fastest
        # (r4 ladder: 4680/256 617.2, 4680/128 789.2, 4680/512 no-fit).
        env_bkv = os.environ.get("LONGLIVE_BKV")
        if env_bkv:
            block_kv = int(env_bkv)
        else:
            block_kv = 256 if block_q > 1560 else 512
    exp2 = os.environ.get("LONGLIVE_EXP2", "0") == "1"
    mxu_lsum = os.environ.get("LONGLIVE_MXU_LSUM", "0") == "1"
    return _flash_attention_jit(
        q, k, v, bias, block_q, block_kv, frame_seq, qk_int8,
        k2, v2, k_scales, skip_ranges, kv_layer, q_rope, interpret,
        exp2=exp2, mxu_lsum=mxu_lsum)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_kv", "frame_seq", "qk_int8",
                              "interpret", "exp2", "mxu_lsum")
)
def _flash_attention_jit(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    block_q: int,
    block_kv: int,
    frame_seq: Optional[int] = None,
    qk_int8: bool = False,
    k2: Optional[jax.Array] = None,
    v2: Optional[jax.Array] = None,
    k_scales: Optional[jax.Array] = None,
    skip_ranges: Optional[jax.Array] = None,
    kv_layer: Optional[jax.Array] = None,
    q_rope: Optional[Tuple[jax.Array, jax.Array]] = None,
    interpret: bool = False,
    exp2: bool = False,
    mxu_lsum: bool = False,
) -> jax.Array:
    """Pallas flash attention.

    q: [B, Sq, N, D]; k, v: [B, Skv, N, D]; bias: [B, Skv] f32 additive
    (0 for valid, -inf for masked) or None.  ``frame_seq`` (tokens per
    latent frame) unlocks frame-aligned q tiling on the decode path.
    ``k2``/``v2`` append a second, fully-valid KV segment (the fresh
    block on the decode path) WITHOUT concatenating buffers — the online
    softmax spans [k ++ k2]; ``bias`` applies to the first segment only.
    ``k_scales`` [B, Skv, N] marks ``k`` as PRE-quantized int8 with
    per-token dequant scales (the int8-KV-cache serving mode: keys are
    quantized once at cache-write time, so this call only quantizes q);
    requires ``qk_int8=True``.  ``skip_ranges`` [R, 2] int32 token ranges
    of the FIRST segment that are fully bias-masked: fully-covered kv
    tiles are skipped via scalar-prefetch index redirection (dead-tile
    elision — zero DMA, zero compute).

    ``kv_layer`` (traced int32 scalar) switches k/v to KERNEL-LAYOUT
    CACHE mode: k, v are the FULL stacked per-layer cache in the
    kernel's own operand layout ``[L*B*N, S_pad, D]`` (token-padded to a
    block_kv multiple at cache init), and the kernel reads layer
    ``kv_layer``'s rows directly via a scalar-prefetch offset in the
    BlockSpec index maps.  This makes the per-layer decode attention
    ZERO-COPY on the cache side: no [B,S,N,D]->[B*N,S,D] relayout and no
    written-through scan-ys cache copy per layer (the measured ~16
    ms/forward KV-write tax, PERF.md).  Requires ``bias`` (pad + warmup
    slots must be masked); mutually exclusive with qk_int8/k2/skip_ranges.

    Returns [B, Sq, N, D].
    """
    b, sq, n, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    if exp2:
        # exp(x) == exp2(x * log2 e): fold log2(e) into the prefolded
        # softmax scale (and the bias below) so the kernel's hot softmax
        # pass runs exp2 with zero extra elementwise work
        scale *= math.log2(math.e)
    has_bias = bias is not None
    has_seg2 = k2 is not None
    use_kl = kv_layer is not None
    use_rope = q_rope is not None
    if use_kl:
        if qk_int8 or has_seg2 or skip_ranges is not None or k_scales is not None:
            raise ValueError("kv_layer mode supports the plain bf16 "
                             "single-segment kernel only")
        if not has_bias:
            raise ValueError("kv_layer mode requires an explicit bias "
                             "(pad slots must be masked)")
        if skv % block_kv:
            raise ValueError(f"kernel-layout cache token dim {skv} must be "
                             f"a multiple of block_kv {block_kv}")
    if use_rope:
        if qk_int8 or has_seg2 or skip_ranges is not None or k_scales is not None:
            raise ValueError("q_rope (in-kernel q RoPE) supports the plain "
                             "bf16 single-segment kernel only")
        if d % 2:
            raise ValueError("q_rope needs an even head dim")

    sq_p = -(-sq // block_q) * block_q
    skv_p = -(-skv // block_kv) * block_kv
    nkv1 = skv_p // block_kv
    skv2 = k2.shape[1] if has_seg2 else 0
    skv2_p = -(-skv2 // block_kv) * block_kv if has_seg2 else 0
    need_mask = (skv_p != skv) or (has_seg2 and skv2_p != skv2)
    if not has_bias and need_mask:
        # padded KV rows must be masked out
        bias = jnp.zeros((b, skv), jnp.float32)
        has_bias = True

    cs = sn = None
    if use_rope:
        # q arrives UN-roped and UN-scaled; the halfsplit rotation runs in
        # the kernel prologue (see _flash_kernel).  Fold the softmax scale
        # into the [Sq_p, D] multipliers so no elementwise pass ever touches
        # q outside the kernel: roped_scaled = q*cs + swap(q)*sn with
        # cs = scale*[cos ++ cos], sn = scale*[-sin ++ sin].
        rc, rs = q_rope
        rc = rc.astype(jnp.float32) * scale
        rs = rs.astype(jnp.float32) * scale
        cs = _pad_axis(jnp.concatenate([rc, rc], axis=-1), 0, sq_p)
        sn = _pad_axis(jnp.concatenate([-rs, rs], axis=-1), 0, sq_p)
        qs = q
    else:
        # fold the softmax scale into q (saves one [bq, bkv] pass per tile)
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)

    # [B, S, N, D] -> [B*N, S, D]
    def _t(x, sp):
        return _pad_axis(x, 1, sp).transpose(0, 2, 1, 3).reshape(b * n, sp, d)

    qt = _t(qs, sq_p)
    if use_kl:
        kt, vt = k, v  # already [L*B*N, S_pad, D] — zero-copy operands
    else:
        kt = _t(k, skv_p)
        vt = _t(v, skv_p)
    k2t = v2t = None
    if has_seg2:
        k2t = _t(k2, skv2_p)
        v2t = _t(v2, skv2_p)

    # rope mode swaps the outer grid dims to (iq, h, ikv): the cs/sn
    # multiplier blocks then only change on iq steps, so their DMA is
    # elided across the whole head sweep (with h outer they would re-stream
    # ~57 MB/layer).  q/k/v/out DMA counts are unchanged by the swap.
    if use_rope:
        grid = (sq_p // block_q, b * n, (skv_p + skv2_p) // block_kv)
    else:
        grid = (b * n, sq_p // block_q, (skv_p + skv2_p) // block_kv)

    qsc = ksc = None
    if qk_int8:
        # per-token symmetric quantization, one fused XLA pass per operand
        # (pad rows are all-zero -> quantize to 0 with a tiny scale)
        def _q8(x):
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) + 1e-30
            xi = jnp.round(xf * (127.0 / amax)).astype(jnp.int8)
            return xi, amax * (1.0 / 127.0)

        qt, qsc = _q8(qt)          # qsc: [B*N, Sq_p, 1]
        if k_scales is not None:
            # k arrived int8 from the cache; lay its scales out like _q8's
            # (pad rows are masked by bias, so the pad scale is arbitrary)
            ksc_ = _pad_axis(k_scales.astype(jnp.float32), 1, skv_p,
                             value=1.0).transpose(0, 2, 1).reshape(
                                 b * n, skv_p, 1)
        else:
            kt, ksc_ = _q8(kt)
        if has_seg2:
            k2t, ksc2_ = _q8(k2t)
            ksc_ = jnp.concatenate([ksc_, ksc2_], axis=1)
        # [B*N, 1, Skv_p(+Skv2_p)]: kv scales live on the lane axis so the
        # block's trailing dims satisfy Mosaic's (8, 128)-divisibility rule
        ksc = ksc_.transpose(0, 2, 1)

    use_skip = skip_ranges is not None

    def _wrap(map3):
        # scalar-prefetch grid specs APPEND the prefetched refs to every
        # index map's grid-index arguments; rope mode's grid is (iq, h, ikv)
        if use_skip:
            return lambda h, iq, ikv, tm, lv: map3(tm, h, iq, ikv)
        if use_rope and use_kl:
            return lambda iq, h, ikv, li: map3(None, h, iq, ikv)
        if use_rope:
            return lambda iq, h, ikv: map3(None, h, iq, ikv)
        if use_kl:
            return lambda h, iq, ikv, li: map3(None, h, iq, ikv)
        return lambda h, iq, ikv: map3(None, h, iq, ikv)

    # dead first-segment tiles redirect through tm (live tiles: tm[i] == i)
    kv_idx = ((lambda tm, h, iq, ikv: (h, tm[ikv], 0)) if use_skip
              else (lambda tm, h, iq, ikv: (h, ikv, 0)))
    kv_idx2 = ((lambda tm, h, iq, ikv: (h // n, tm[ikv])) if use_skip
               else (lambda tm, h, iq, ikv: (h // n, ikv)))
    ksc_idx = ((lambda tm, h, iq, ikv: (h, 0, tm[ikv])) if use_skip
               else (lambda tm, h, iq, ikv: (h, 0, ikv)))

    in_specs = []
    operands = []
    if has_bias:
        bias = bias.astype(jnp.float32)
        if exp2:
            bias = bias * math.log2(math.e)  # match the exp2 logit domain
        bias = _pad_axis(bias, 1, skv_p, value=_NEG_INF)
        if has_seg2:
            # second segment: all tokens valid, pad rows masked
            bias2 = jnp.zeros((b, skv2), jnp.float32)
            bias2 = _pad_axis(bias2, 1, skv2_p, value=_NEG_INF)
            bias = jnp.concatenate([bias, bias2], axis=1)
        in_specs.append(pl.BlockSpec(
            (1, block_kv), _wrap(kv_idx2), memory_space=pltpu.VMEM))
        operands.append(bias)
    if qk_int8:
        in_specs.append(pl.BlockSpec(
            (1, block_q, 1), _wrap(lambda tm, h, iq, ikv: (h, iq, 0)),
            memory_space=pltpu.VMEM))
        operands.append(qsc)
        in_specs.append(pl.BlockSpec(
            (1, 1, block_kv), _wrap(ksc_idx), memory_space=pltpu.VMEM))
        operands.append(ksc)
    if use_rope:
        rope_map = _wrap(lambda tm, h, iq, ikv: (iq, 0))
        in_specs += [
            pl.BlockSpec((block_q, d), rope_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), rope_map, memory_space=pltpu.VMEM),
        ]
        operands += [cs, sn]
    in_specs += [
        pl.BlockSpec(
            (1, block_q, d), _wrap(lambda tm, h, iq, ikv: (h, iq, 0)),
            memory_space=pltpu.VMEM
        ),
    ]
    operands += [qt]
    if has_seg2:
        # segment-clamped index maps: the off-segment ref re-reads a
        # resident tile (Pallas elides the DMA when the index repeats);
        # with skip, dead seg1 tiles additionally redirect through tm
        if use_skip:
            seg1_map = lambda tm, h, iq, ikv: (
                h, jnp.minimum(tm[ikv], nkv1 - 1), 0)
        else:
            seg1_map = lambda tm, h, iq, ikv: (h, jnp.minimum(ikv, nkv1 - 1), 0)
        seg2_map = lambda tm, h, iq, ikv: (h, jnp.maximum(ikv - nkv1, 0), 0)
        in_specs += [
            pl.BlockSpec((1, block_kv, d), _wrap(seg1_map), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), _wrap(seg1_map), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), _wrap(seg2_map), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), _wrap(seg2_map), memory_space=pltpu.VMEM),
        ]
        operands += [kt, vt, k2t, v2t]
    else:
        if use_kl:
            # layer kv_layer's rows of the stacked [L*B*N, S_pad, D] cache
            bn = b * n
            if use_rope:
                kv_map = lambda iq, h, ikv, li: (li[0] * bn + h, ikv, 0)
            else:
                kv_map = lambda h, iq, ikv, li: (li[0] * bn + h, ikv, 0)
        else:
            kv_map = _wrap(kv_idx)
        in_specs += [
            pl.BlockSpec((1, block_kv, d), kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), kv_map,
                         memory_space=pltpu.VMEM),
        ]
        operands += [kt, vt]

    scratch_shapes = [
        pltpu.VMEM((block_q, _LANES), jnp.float32),
        pltpu.VMEM((block_q, _LANES), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    if use_rope:
        # the roped+scaled q tile, written once per (iq, h) in the prologue
        scratch_shapes.append(pltpu.VMEM((block_q, d), q.dtype))

    kernel = functools.partial(_flash_kernel, has_bias=has_bias,
                               qk_int8=qk_int8,
                               nkv1=nkv1 if has_seg2 else 0, skip=use_skip,
                               kl=use_kl, rope=use_rope, exp2=exp2,
                               mxu_lsum=mxu_lsum)
    out_spec = pl.BlockSpec(
        (1, block_q, d), _wrap(lambda tm, h, iq, ikv: (h, iq, 0)),
        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b * n, sq_p, d), q.dtype)
    if use_skip:
        tm, lv = _skip_tile_arrays(
            jnp.asarray(skip_ranges, jnp.int32).reshape(-1, 2),
            nkv1, skv2_p // block_kv, block_kv)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=grid, in_specs=in_specs,
            out_specs=out_spec, scratch_shapes=scratch_shapes)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(tm, lv, *operands)
    elif use_kl:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=out_spec, scratch_shapes=scratch_shapes)
        li = jnp.asarray(kv_layer, jnp.int32).reshape(1)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(li, *operands)
    else:
        # strip the unused leading arg the _wrap shim added
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(*operands)

    out = out.reshape(b, n, sq_p, d).transpose(0, 2, 1, 3)
    return out[:, :sq]


def _frame_mask_tile_arrays(mask_kind: str, sq_p: int, skv_p: int,
                            block_q: int, block_kv: int, frame_seq: int,
                            nfb: int, local: int, sink: int,
                            clean_frames: int):
    """Static (tile_map, live) int32 [nq*nkv] for the frame-structured
    masks — the TF/elision analogue of ``_skip_tile_arrays`` (VERDICT r4
    item 5).  Everything the mask depends on is STATIC (frame ids from
    token indices), so per-tile liveness is computed exactly in numpy at
    trace time: a tile is live iff any (qi, ki) pair in it is unmasked.
    Dead tiles redirect their kv block index to the NEXT live tile in the
    same q row (falling back to the previous live one at a dead tail), so
    consecutive grid steps repeat the block index and Pallas elides the
    DMA; the kernel gates the whole accumulate body on ``live``.  Under
    the teacher-forcing mask ~half the (q, kv) plane is dead — the
    flex-attention BlockMask sparsity (causal_model.py:703-788), here as
    grid-step elision."""
    import numpy as _np

    nq = sq_p // block_q
    nkv = skv_p // block_kv
    clean_len = clean_frames * frame_seq

    def tf_parts(tok_lo: int, tok_hi: int):
        """[(is_noise, blk_lo, blk_hi)] attention-block ranges the REAL
        tokens of a [clean | noisy] token range span (padding excluded)."""
        out = []
        for lo, hi, is_noise, off in (
                (max(tok_lo, 0), min(tok_hi, clean_len), False, 0),
                (max(tok_lo, clean_len), min(tok_hi, 2 * clean_len), True,
                 clean_len)):
            if hi > lo:
                out.append((is_noise, (lo - off) // frame_seq // nfb,
                            (hi - 1 - off) // frame_seq // nfb))
        return out

    live = _np.zeros((nq, nkv), _np.int32)
    for iq in range(nq):
        q_lo, q_hi = iq * block_q, (iq + 1) * block_q
        for ikv in range(nkv):
            k_lo, k_hi = ikv * block_kv, (ikv + 1) * block_kv
            alive = False
            if mask_kind == "teacher_forcing":
                for qn, qb0, qb1 in tf_parts(q_lo, q_hi):
                    for kn, kb0, kb1 in tf_parts(k_lo, k_hi):
                        if ((not qn) and (not kn) and kb0 <= qb1) or \
                           (qn and kn and kb0 <= qb1 and kb1 >= qb0) or \
                           (qn and (not kn) and kb0 < qb1):
                            alive = True
                            break
                    if alive:
                        break
            else:
                # frame-index ranges (padding rows get huge frame ids and
                # are masked by the `ends` arithmetic like in-kernel)
                qf_lo, qf_hi = q_lo // frame_seq, (q_hi - 1) // frame_seq
                kf_lo, kf_hi = k_lo // frame_seq, (k_hi - 1) // frame_seq
                ends_lo = (qf_lo // nfb + 1) * nfb
                ends_hi = (qf_hi // nfb + 1) * nfb
                if mask_kind == "block_causal":
                    # union over qf of kf in [ends-local, ends) (or [0, ends))
                    a = ends_lo - local if local != -1 else 0
                    alive = kf_hi >= a and kf_lo < ends_hi
                elif mask_kind == "sink_window":
                    sink_arm = kf_lo < min(sink, ends_hi)
                    win_arm = (kf_hi >= ends_lo - (local - sink)
                               and kf_lo < ends_hi)
                    alive = sink_arm or win_arm
                else:
                    alive = kf_lo < ends_hi
            # the qi == ki diagonal arm
            if not alive and q_lo < k_hi and k_lo < q_hi:
                alive = True
            live[iq, ikv] = 1 if alive else 0

    tm = _np.zeros((nq, nkv), _np.int32)
    for iq in range(nq):
        nxt = nkv  # next live tile at-or-after each position
        prv = 0
        nxts = _np.empty(nkv, _np.int32)
        for ikv in range(nkv - 1, -1, -1):
            if live[iq, ikv]:
                nxt = ikv
            nxts[ikv] = nxt
        for ikv in range(nkv):
            if live[iq, ikv]:
                tm[iq, ikv] = ikv
                prv = ikv
            else:
                tm[iq, ikv] = nxts[ikv] if nxts[ikv] < nkv else prv
    return (jnp.asarray(tm.reshape(-1)), jnp.asarray(live.reshape(-1)),
            int(live.sum()), nq * nkv)


def _masked_flash_kernel(*refs, mask_kind: str, frame_seq: int, nfb: int,
                         local: int, sink: int, clean_frames: int,
                         has_bias: bool = False, skip: bool = False):
    """Flash kernel with the mask computed ARITHMETICALLY per tile from
    token indices — the Pallas analogue of the reference's flex-attention
    BlockMasks (causal_model.py:647-847), usable at full training scale
    (a materialized 32760^2 mask is ~4 GB; this needs none).

    mask kinds:
      block_causal:   kv_f < ends(q_f) [& kv_f >= ends - local]
                      (causal_model.py:677-681)
      sink_window:    block_causal & (kv_f < sink | kv_f >= ends - (local-sink))
                      (the cached sink+ring pattern, ops/masks.py)
      teacher_forcing: [clean | noisy] layout (causal_model.py:762-772)
    """
    lv_ref = None
    if skip:
        # scalar-prefetch (tile_map, live); tile_map is only consumed by
        # the k/v BlockSpec index maps
        lv_ref = refs[1]
        refs = refs[2:]
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
    ikv = pl.program_id(2)
    nkv = pl.num_programs(2)
    iq = pl.program_id(1)

    @pl.when(ikv == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def _accumulate():
        _masked_accumulate(q_ref, k_ref, v_ref, m_ref, l_ref, acc_ref,
                           iq, ikv, mask_kind=mask_kind, frame_seq=frame_seq,
                           nfb=nfb, local=local, sink=sink,
                           clean_frames=clean_frames)

    if skip:
        pl.when(lv_ref[iq * nkv + ikv] == 1)(_accumulate)
    else:
        _accumulate()

    @pl.when(ikv == nkv - 1)
    def _finalize():
        # fully-masked rows (never occur for real tokens: q attends itself)
        d = acc_ref.shape[-1]
        denom = jnp.maximum(pltpu.repeat(l_ref[:], d // _LANES, axis=1)
                            if d > _LANES else l_ref[:, :d], 1e-30)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def _masked_accumulate(q_ref, k_ref, v_ref, m_ref, l_ref, acc_ref, iq, ikv,
                       *, mask_kind: str, frame_seq: int, nfb: int,
                       local: int, sink: int, clean_frames: int):
    q = q_ref[0]
    k = k_ref[0]
    bq, d = q.shape
    bkv = k.shape[0]

    # global token indices for this tile
    qi = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
    ki = ikv * bkv + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)

    if mask_kind == "teacher_forcing":
        clean_len = clean_frames * frame_seq
        q_noise = qi >= clean_len
        k_noise = ki >= clean_len
        qf = jnp.where(q_noise, (qi - clean_len) // frame_seq, qi // frame_seq)
        kf = jnp.where(k_noise, (ki - clean_len) // frame_seq, ki // frame_seq)
        q_blk = qf // nfb
        k_blk = kf // nfb
        # padded kv tokens (ki >= 2*clean_len) land at kf >= clean_frames;
        # without this they'd share the LAST noisy block's id whenever
        # clean_frames % nfb != 0 and noise_own would unmask them (their
        # zero-key logits deflate the softmax denominator)
        k_real = kf < clean_frames
        clean_mask = (~q_noise) & (~k_noise) & (k_blk <= q_blk)
        noise_own = q_noise & k_noise & (k_blk == q_blk)
        noise_ctx = q_noise & (~k_noise) & (k_blk < q_blk)
        mask = ((clean_mask | noise_own | noise_ctx) & k_real) | (qi == ki)
    else:
        qf = qi // frame_seq
        kf = ki // frame_seq
        ends = (qf // nfb + 1) * nfb
        mask = kf < ends
        if mask_kind == "block_causal":
            if local != -1:
                mask = mask & (kf >= ends - local)
        elif mask_kind == "sink_window":
            mask = mask & ((kf < sink) | (kf >= ends - (local - sink)))
        mask = mask | (qi == ki)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = jnp.where(mask, s, _NEG_INF)

    def _to_w(x128, w):
        if w == _LANES:
            return x128
        if w < _LANES:
            return x128[:, :w]
        return pltpu.repeat(x128, w // _LANES, axis=1)

    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_cur = jnp.max(s, axis=-1)[:, None]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - _to_w(m_new, bkv))
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1)[:, None]
    m_ref[:] = m_new
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * _to_w(alpha, d) + pv


@functools.partial(jax.jit, static_argnames=(
    "mask_kind", "frame_seq", "nfb", "local", "sink", "clean_frames",
    "block_q", "block_kv", "interpret", "elide_dead_tiles"))
def flash_attention_frame_masked(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask_kind: str = "block_causal",
    frame_seq: int,
    nfb: int = 1,
    local: int = -1,
    sink: int = 0,
    clean_frames: int = 0,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: bool = False,
    elide_dead_tiles: Optional[bool] = None,
) -> jax.Array:
    """Flash attention with an arithmetic frame-structured mask.
    q, k, v: [B, S, N, D] (self-attention: S_q == S_kv token layout).

    ``elide_dead_tiles`` (default on; LONGLIVE_TF_ELIDE=0 disables): the
    statically-computable fully-masked (q, kv) tiles are skipped — their
    k/v DMA is redirected to the next live tile (index repeat => Pallas
    elides the copy) and the accumulate body is gated off.  Under the
    teacher-forcing mask ~half the tiles are dead, so the 21-frame TF
    forward roughly halves (VERDICT r4 item 5; the reference gets the same
    sparsity from its flex-attention BlockMask, causal_model.py:703-788)."""
    b, sq, n, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    sq_p = -(-sq // block_q) * block_q
    skv_p = -(-skv // block_kv) * block_kv
    # padded kv tokens get frame ids beyond every `ends` -> masked out,
    # except the qi==ki diagonal which only pairs padded q rows (sliced off)

    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qt = _pad_axis(qs, 1, sq_p).transpose(0, 2, 1, 3).reshape(b * n, sq_p, d)
    kt = _pad_axis(k, 1, skv_p).transpose(0, 2, 1, 3).reshape(b * n, skv_p, d)
    vt = _pad_axis(v, 1, skv_p).transpose(0, 2, 1, 3).reshape(b * n, skv_p, d)

    if elide_dead_tiles is None:
        elide_dead_tiles = os.environ.get("LONGLIVE_TF_ELIDE", "1") == "1"
    tm = lv = None
    if elide_dead_tiles:
        tm, lv, n_live, n_total = _frame_mask_tile_arrays(
            mask_kind, sq_p, skv_p, block_q, block_kv, frame_seq, nfb,
            local, sink, clean_frames)
        if n_live == n_total:
            tm = lv = None  # nothing dead: plain grid, no prefetch cost

    grid = (b * n, sq_p // block_q, skv_p // block_kv)
    nkv = grid[2]
    kernel = functools.partial(
        _masked_flash_kernel, mask_kind=mask_kind, frame_seq=frame_seq,
        nfb=nfb, local=local, sink=sink, clean_frames=clean_frames,
        skip=tm is not None,
    )
    scratch_shapes = [
        pltpu.VMEM((block_q, _LANES), jnp.float32),
        pltpu.VMEM((block_q, _LANES), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    out_shape = jax.ShapeDtypeStruct((b * n, sq_p, d), q.dtype)
    if tm is not None:
        # scalar-prefetch grid specs APPEND the prefetched refs to every
        # index map's grid-index arguments
        kv_map = lambda h, iq, ikv, tmr, lvr: (h, tmr[iq * nkv + ikv], 0)
        in_specs = [
            pl.BlockSpec((1, block_q, d),
                         lambda h, iq, ikv, tmr, lvr: (h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), kv_map, memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec(
            (1, block_q, d), lambda h, iq, ikv, tmr, lvr: (h, iq, 0),
            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=grid, in_specs=in_specs,
            out_specs=out_spec, scratch_shapes=scratch_shapes)
        out = pl.pallas_call(kernel, grid_spec=grid_spec,
                             out_shape=out_shape, interpret=interpret,
                             )(tm, lv, qt, kt, vt)
    else:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda h, iq, ikv: (h, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_kv, d), lambda h, iq, ikv: (h, ikv, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_kv, d), lambda h, iq, ikv: (h, ikv, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda h, iq, ikv: (h, iq, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(qt, kt, vt)
    out = out.reshape(b, n, sq_p, d).transpose(0, 2, 1, 3)
    return out[:, :sq]


@functools.partial(jax.jit, static_argnames=("block",))
def flash_attention_trainable(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_valid: Optional[jax.Array] = None,
    block: int = 512,
) -> jax.Array:
    """DIFFERENTIABLE flash attention for the training paths.

    Wraps the upstream Pallas TPU flash kernel
    (jax.experimental.pallas.ops.tpu.flash_attention — it ships forward
    AND backward kernels via custom_vjp), which our hand-written serving
    kernel does not have; dense attention is not an option at training
    scale (a 21-frame critic forward would materialize a 12x32760^2 f32
    logit tensor, ~50 GB/layer).

    KV validity is encoded as segment ids (valid kv = 1, invalid = 0;
    real q rows = 1), which the upstream kernel masks in both the
    forward and the backward.  Padded q rows get id 0 so they attend the
    id-0 kv padding (finite garbage, sliced off; fully-masked rows would
    NaN the backward) — one extra kv block guarantees id-0 tokens exist.

    q: [B, Sq, N, D]; k, v: [B, Skv, N, D]; kv_valid: bool [Skv] or
    [B, Skv].  Returns [B, Sq, N, D].
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention as upstream_flash)

    b, sq, n, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    sq_p = -(-sq // block) * block
    skv_p = -(-skv // block) * block
    if sq_p != sq:
        skv_p += block  # guarantee id-0 kv tokens for the padded q rows

    qt = _pad_axis(q, 1, sq_p).transpose(0, 2, 1, 3)  # [B, N, S, D]
    kt = _pad_axis(k, 1, skv_p).transpose(0, 2, 1, 3)
    vt = _pad_axis(v, 1, skv_p).transpose(0, 2, 1, 3)

    q_ids = jnp.broadcast_to(
        (jnp.arange(sq_p) < sq).astype(jnp.int32)[None], (b, sq_p))
    if kv_valid is None:
        kv_core = jnp.ones((b, skv), jnp.int32)
    else:
        if kv_valid.ndim == 1:
            kv_valid = kv_valid[None, :]
        kv_core = jnp.broadcast_to(kv_valid.astype(jnp.int32), (b, skv))
    kv_ids = _pad_axis(kv_core, 1, skv_p)

    out = upstream_flash(qt, kt, vt, segment_ids=SegmentIds(q=q_ids, kv=kv_ids),
                         sm_scale=scale)
    return out.transpose(0, 2, 1, 3)[:, :sq].astype(q.dtype)


def quantize_k_tokens(k: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-token/head symmetric int8 quantization of roped keys for the
    int8 KV cache.  k: [B, S, N, D] -> (int8 [B, S, N, D], f32 scales
    [B, S, N]) in the dequant convention the flash kernel applies to its
    logits (k_f32 ~= k_int8 * scale)."""
    kf = k.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kf), axis=-1) + 1e-30
    ki = jnp.round(kf * (127.0 / amax[..., None])).astype(jnp.int8)
    return ki, amax * (1.0 / 127.0)


def dequantize_k(k: jax.Array, k_scales: jax.Array, dtype) -> jax.Array:
    return (k.astype(jnp.float32)
            * k_scales.astype(jnp.float32)[..., None]).astype(dtype)


def attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_valid: Optional[jax.Array] = None,
    impl: str = "auto",
    frame_seq: Optional[int] = None,
    k2: Optional[jax.Array] = None,
    v2: Optional[jax.Array] = None,
    k_scales: Optional[jax.Array] = None,
    skip_ranges: Optional[jax.Array] = None,
    kv_layer: Optional[jax.Array] = None,
    q_rope: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """Dispatcher.  kv_valid: bool [Skv] or [B, Skv] (True = attend; first
    KV segment only).  frame_seq: tokens per latent frame (decode path)
    for frame-aligned q tiling.  k2/v2: appended fully-valid KV segment
    (two-segment decode; concatenated explicitly on the xla fallback).
    k_scales: per-token dequant scales when ``k`` is pre-quantized int8
    (int8 KV cache) — pallas impls run int8-QK with the stored scales,
    the xla fallback dequantizes.  skip_ranges [R, 2]: fully-masked token
    ranges of the first segment — pallas serving impls elide those kv
    tiles entirely (zero DMA/compute); fallbacks rely on the bias mask.
    kv_layer (traced int32 scalar): k/v are the full stacked kernel-layout
    cache [L*B*N, S_pad, D] and attention reads layer ``kv_layer``'s rows
    (zero-copy on the pallas path; the xla fallback slices the rows back
    to [B, S_pad, N, D]).  kv_valid must then cover S_pad (pad = False).
    q_rope (cos, sin) [Sq, D//2] f32: q arrives UN-roped (halfsplit param
    layout, rms premul already applied) — pallas serving impls rotate the
    q tile in the kernel prologue (the external rope pass over q and its
    HBM round trip disappear); fallbacks apply ops.rope.apply_rotary."""
    b, _, n, d = q.shape
    bias = None
    if kv_valid is not None:
        if kv_valid.ndim == 1:
            kv_valid = kv_valid[None, :]
        bias = jnp.where(kv_valid, 0.0, _NEG_INF).astype(jnp.float32)

    if impl == "auto":
        impl = "pallas" if (jax.default_backend() == "tpu" and d % 128 == 0) else "xla"
    if q_rope is not None and impl not in ("pallas", "pallas_interpret"):
        # fallbacks (and non-serving impls) rope q outside the kernel —
        # numerically identical to the in-kernel prologue (same f32 algebra
        # on the same bf16-rounded q)
        if impl not in ("xla",):
            raise ValueError(f"q_rope mode unsupported for impl {impl!r}")
        from .rope import apply_rotary as _rot
        q = _rot(q, q_rope[0], q_rope[1], layout="halfsplit")
        q_rope = None
    if kv_layer is not None:
        if impl == "pallas":
            return flash_attention(q, k, v, bias, frame_seq=frame_seq,
                                   kv_layer=kv_layer, q_rope=q_rope)
        if impl == "pallas_interpret":
            return flash_attention(q, k, v, bias, frame_seq=frame_seq,
                                   kv_layer=kv_layer, q_rope=q_rope,
                                   interpret=True)
        if impl != "xla":
            raise ValueError(f"kv_layer mode unsupported for impl {impl!r}")
        # fallback: slice layer rows [B*N, S_pad, D] -> [B, S_pad, N, D]
        bn = b * n
        s_pad = k.shape[1]
        row0 = jnp.asarray(kv_layer, jnp.int32) * bn
        kr = jax.lax.dynamic_slice_in_dim(k, row0, bn, axis=0)
        vr = jax.lax.dynamic_slice_in_dim(v, row0, bn, axis=0)
        kr = kr.reshape(b, n, s_pad, d).transpose(0, 2, 1, 3)
        vr = vr.reshape(b, n, s_pad, d).transpose(0, 2, 1, 3)
        dense_bias = None if bias is None else bias[:, None, None, :]
        return dense_attention(q, kr.astype(q.dtype), vr.astype(q.dtype),
                               dense_bias)
    if impl == "train_auto":
        # training paths need a DIFFERENTIABLE kernel; the serving kernel
        # has no VJP and dense attention cannot fit training shapes
        impl = ("pallas_train"
                if (jax.default_backend() == "tpu" and d % 128 == 0) else "xla")
    if k_scales is not None:
        if impl in ("pallas", "pallas_qk8"):
            return flash_attention(q, k, v, bias, frame_seq=frame_seq,
                                   qk_int8=True, k_scales=k_scales,
                                   k2=k2, v2=v2, skip_ranges=skip_ranges)
        if impl in ("pallas_interpret", "pallas_qk8_interpret"):
            return flash_attention(q, k, v, bias, frame_seq=frame_seq,
                                   qk_int8=True, k_scales=k_scales,
                                   k2=k2, v2=v2, skip_ranges=skip_ranges,
                                   interpret=True)
        # xla/train fallback: dequantize and continue below
        k = dequantize_k(k, k_scales, v.dtype)
    if impl == "pallas_train":
        if k2 is not None:
            k = jnp.concatenate([k, k2], axis=1)
            v = jnp.concatenate([v, v2], axis=1)
            if kv_valid is not None:
                # kv_valid was normalized to [B, Skv] above
                pad = jnp.ones(k2.shape[:2], bool)
                kv_valid = jnp.concatenate([kv_valid, pad], axis=-1)
        return flash_attention_trainable(q, k, v, kv_valid)

    if impl == "pallas":
        return flash_attention(q, k, v, bias, frame_seq=frame_seq, k2=k2, v2=v2,
                               skip_ranges=skip_ranges, q_rope=q_rope)
    if impl == "pallas_qk8":
        # int8-QK serving mode (per-tile Q/K quant on the int8 MXU pipe)
        return flash_attention(q, k, v, bias, frame_seq=frame_seq, qk_int8=True,
                               k2=k2, v2=v2, skip_ranges=skip_ranges)
    if impl == "pallas_interpret":
        return flash_attention(q, k, v, bias, frame_seq=frame_seq, k2=k2, v2=v2,
                               skip_ranges=skip_ranges, q_rope=q_rope,
                               interpret=True)
    if impl == "pallas_qk8_interpret":
        return flash_attention(q, k, v, bias, frame_seq=frame_seq, qk_int8=True,
                               k2=k2, v2=v2, skip_ranges=skip_ranges,
                               interpret=True)
    if impl != "xla":
        raise ValueError(f"unknown attention impl {impl!r}")
    if k2 is not None:
        k = jnp.concatenate([k, k2], axis=1)
        v = jnp.concatenate([v, v2], axis=1)
        if bias is not None:
            bias = jnp.concatenate(
                [bias, jnp.zeros((bias.shape[0], k2.shape[1]), jnp.float32)],
                axis=1)
    dense_bias = None if bias is None else bias[:, None, None, :]
    return dense_attention(q, k, v, dense_bias)
