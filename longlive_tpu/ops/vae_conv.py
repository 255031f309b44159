"""Fused causal-conv3d Pallas kernel for the streaming VAE decoder.

The reference decoder (vae.py:545-569) advances one latent frame at a time;
every ``CausalConv3d`` (vae.py:17-36) concatenates its 2-frame ``feat_cache``
with the incoming frames, runs a cuDNN conv3d over the 3-frame window, and
re-slices the cache.  The XLA translation of that shape (concat -> conv ->
slice, with a separate norm+silu fusion in front) spends ~90 ms of a 253 ms
per-latent-frame decode on pure HBM traffic: the 3-frame concat
materialization (~31 ms), the norm/silu elementwise passes (~60 ms measured),
and the cache re-slice.

This kernel removes all of it for the hot kt=3, unit-temporal-stride convs:

- the three temporal taps are read directly from the cache frames and the
  current chunk (no concatenated buffer ever exists);
- the RMS-norm + SiLU prologue of ``res_block`` (vae.py:186-220) is applied
  once in VMEM staging buffers, so the normalized activation never
  round-trips through HBM;
- the bias add and the residual add of ``res_block`` are epilogues;
- the next call's cache frames (the *normalized* last two input frames,
  exactly what the reference's ``feat_cache`` holds) are emitted as a side
  output, so the cache update is free.

The conv itself is ONE implicit-GEMM per grid step, shaped for the MXU and
for VMEM bandwidth (the v1 design — 27 small [rows,C]x[C,O] matmuls — was
VMEM-read-bound re-streaming the same activations 27x):

- K packs (temporal tap x kernel row): the kernel-row (dy) shift is free at
  copy time (row offsets are unconstrained), so 9 row-shifted VMEM copies
  from the staging buffers build a [rows, W, 9*C] operand and the whole
  stencil-row/tap reduction happens inside one MXU contraction;
- N packs the 3 kernel-column (dx) variants of each O tile, so the
  activation operand is read once for all 27 taps;
- the dx column shifts are applied to the f32 result: in the flattened
  [rows*W, .] layout a column shift is a row shift, i.e. a cheap 32-bit
  sublane roll whose wrap lands in zeroed pad columns (a middle-dim roll
  on the 3D view lowers to a catastrophe of shuffles — measured);
- channel counts are zero-padded to lane tiles (96->128, 192->256): Mosaic
  slices/DMAs need 128-multiple lane extents, and zero lanes are exact
  (zero weights, zero norm contributions).  MXU time is unchanged — a
  masked 96-lane tile costs the same as a padded 128-lane tile.

Spatial SAME padding: halo rows are part of the staged tiles, border
rows/cols zeroed in VMEM.  Time-causal padding: the caller hands in zero
cache frames for the first chunk — identical semantics to the reference.

Layout: frames [T, H, W, C] channels-last; weights arrive in the torch
[O, I, kt, kh, kw] layout and are re-packed per call (small, fused by XLA).
B == 1 only — the streaming decode path; wider batches fall back to the XLA
path in models/vae.py.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm_silu_tile(tile_f32: jax.Array, gamma: jax.Array, out_dtype,
                    true_c: int) -> jax.Array:
    """RMS_norm(channel) + SiLU exactly as models/vae.rms_norm_channel +
    models/nn.silu compute it (f32 norm, bf16 rounding between the two).
    ``true_c`` is the unpadded channel count (lane padding is zeros, which
    contribute nothing to the sum of squares)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(tile_f32), axis=-1, keepdims=True)) + 1e-12
    y = tile_f32 / norm * (float(true_c) ** 0.5)
    yb = (y * gamma[None, None, :]).astype(out_dtype)
    sig = jax.nn.sigmoid(yb.astype(jnp.float32)).astype(out_dtype)
    return yb * sig


def _fused_kernel(
    # refs (order: gamma?, bias?, residual?, [wsc], w, cache, x, out, nx,
    #        stage0, stage1, stage2, kbuf, [kbuf8, ascale], sems)
    *refs,
    th: int,
    bo: int,
    t_frames: int,
    width: int,
    n_rows: int,
    true_c: int,
    cp: int,
    kh: int,
    kw: int,
    apply_norm: bool,
    has_bias: bool,
    has_residual: bool,
    int8: bool = False,
    ablate: str = "",
):
    idx = 0
    gamma_ref = None
    bias_ref = None
    res_ref = None
    wsc_ref = None
    if apply_norm:
        gamma_ref = refs[idx]; idx += 1
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    if has_residual:
        res_ref = refs[idx]; idx += 1
    ginv_ref = None
    if int8:
        wsc_ref = refs[idx]; ginv_ref = refs[idx + 1]; idx += 2
    w_ref, cache_ref, x_ref = refs[idx], refs[idx + 1], refs[idx + 2]
    out_ref, nx_ref = refs[idx + 3], refs[idx + 4]
    stage_refs = refs[idx + 5 : idx + 8]
    kbuf_ref = refs[idx + 8]
    idx += 9
    kbuf8_ref = ascale_ref = None
    if int8:
        kbuf8_ref, ascale_ref = refs[idx], refs[idx + 1]
        idx += 2
    sems_ref = refs[idx]

    r = pl.program_id(0)
    t = pl.program_id(1)
    o = pl.program_id(2)
    num_r = pl.num_programs(0)
    dma_on = ablate != "no_dma"

    # ---- staging-window bookkeeping ----------------------------------
    # Virtual frame v (v0 = cache frame 0, v1 = cache frame 1, v(j+2) =
    # x frame j) lives in stage_refs[v % 3].  At output frame t the
    # window is {v_t, v_{t+1}, v_{t+2}} — all three stages — and after
    # the K-pack copies the OLDEST stage (index t % 3) is dead, so the
    # next frame's HBM DMA targets it and overlaps this step's GEMM
    # (waited at the start of the next (r, t) step).  This replaces the
    # round-1 shift-copy window (stage0 <- stage1 <- stage2 per frame:
    # two full-tile VMEM passes) AND hides the measured ~3.7 ms/conv of
    # exposed stage DMA (r2g ablation) with zero extra VMEM.

    def _stage_dma(src_ref, src_idx, stage_ref, rr, sem, op):
        """Start or wait the halo'd row DMA of frame ``src_idx`` into a
        staging buffer for row-tile ``rr``.  Start and wait run in
        DIFFERENT grid steps; the descriptor is rebuilt identically on
        both sides (same predicates, same slices, same semaphore)."""
        if not dma_on:  # ablation timing: stage keeps stale data
            return

        def _cp(src_row0, dst_row0, nrows):
            return pltpu.make_async_copy(
                src_ref.at[src_idx, pl.ds(src_row0, nrows)],
                stage_ref.at[pl.ds(dst_row0, nrows), pl.ds(8, width)],
                sem,
            )

        if n_rows == 1:  # single row tile: th == H
            getattr(_cp(0, 1, th), op)()
        else:
            @pl.when(rr == 0)
            def _top():
                getattr(_cp(0, 1, th + 1), op)()

            @pl.when((rr > 0) & (rr < num_r - 1))
            def _mid():
                getattr(_cp(rr * th - 1, 0, th + 2), op)()

            @pl.when((rr == num_r - 1) & (rr > 0))
            def _bot():
                getattr(_cp(rr * th - 1, 0, th + 1), op)()

    def _finish_stage(stage_ref, normalize, nx_idx):
        """Post-arrival tile work: zero the halo/pad borders (SAME
        padding), optionally norm+silu, optionally emit the tile to
        nx[nx_idx] (the next call's cache frames)."""
        if n_rows == 1:
            stage_ref[0:1] = jnp.zeros_like(stage_ref[0:1])
            stage_ref[th + 1 : th + 2] = jnp.zeros_like(
                stage_ref[th + 1 : th + 2]
            )
        else:
            @pl.when(r == 0)
            def _top():
                stage_ref[0:1] = jnp.zeros_like(stage_ref[0:1])

            @pl.when(r == num_r - 1)
            def _bot():
                stage_ref[th + 1 : th + 2] = jnp.zeros_like(
                    stage_ref[th + 1 : th + 2]
                )

        # zero the border columns: data occupies columns [8, 8+W); cols
        # [0,8) and [W+8, W+16) are the pad, all offsets 8-aligned for
        # Mosaic's sublane tiling
        stage_ref[:, 0:8] = jnp.zeros_like(stage_ref[:, 0:8])
        stage_ref[:, width + 8 : width + 16] = jnp.zeros_like(
            stage_ref[:, width + 8 : width + 16]
        )

        if normalize and ablate != "no_norm":
            tile = stage_ref[...].astype(jnp.float32)
            stage_ref[...] = _norm_silu_tile(
                tile, gamma_ref[0].astype(jnp.float32), stage_ref.dtype, true_c
            )

        # next-call cache frames: virtual frame u = src_idx + 2 (x frames),
        # needed when u >= T  <=>  src_idx >= T - 2
        if nx_idx is not None and dma_on:
            @pl.when(nx_idx >= 0)
            def _emit():
                cp_ = pltpu.make_async_copy(
                    stage_ref.at[pl.ds(1, th), pl.ds(8, width)],
                    nx_ref.at[nx_idx, pl.ds(r * th, th)],
                    sems_ref.at[0],
                )
                cp_.start()
                cp_.wait()

    def _pack_kbuf(perm):
        """3*kh row-shifted VMEM copies staging -> K-packed GEMM operand.
        ``perm[tau]`` maps window position tau (oldest..newest) to its
        stage index ((t + tau) % 3).  kh==3: dy in {0,1,2} (one-row
        shifts against the halo'd staging); kh==1: only the center band
        (dy=1) — the (3,1,1) time-conv case."""
        if ablate == "no_pack":  # ablation timing: kbuf keeps stale data
            return
        dys = range(3) if kh == 3 else (1,)
        copies = []
        for tau in range(3):
            for j, dy in enumerate(dys):
                kblk = (kh * tau + j) * cp
                copies.append(pltpu.make_async_copy(
                    stage_refs[perm[tau]].at[pl.ds(dy, th)],
                    kbuf_ref.at[:, :, pl.ds(kblk, cp)],
                    sems_ref.at[kh * tau + j],
                ))
        for c_ in copies:
            c_.start()
        for c_ in copies:
            c_.wait()

    def _quant_kbuf():
        """int8 mode: the per-channel factor ``ginv`` (1/max(|gamma|, eps)
        for norm prologues, ones otherwise; its inverse is pre-folded into
        the quantized weights) uniformizes the K-dim dynamic range, then
        one symmetric scalar scale covers the whole K-packed tile (the
        contraction dim mixes all taps, so the residual scale must be
        uniform along K; per-output-channel granularity lives in the
        weight scales).  Runs once per (r, t) — the int8 operand is
        reused by every O tile."""
        a = kbuf_ref[...].astype(jnp.float32) * ginv_ref[0][None, None, :]
        amax = jnp.maximum(jnp.max(jnp.abs(a)), 1e-8)
        s = amax / 127.0
        kbuf8_ref[...] = jnp.round(a / s).astype(jnp.int8)
        ascale_ref[0, 0] = s

    # ---- tap loading (only on the first O tile of each (r, t)) ----
    zero = jnp.zeros((), jnp.int32)
    one = jnp.ones((), jnp.int32)

    @pl.when((o == 0) & (t == 0) & (r == 0))
    def _cold_start():
        # very first (r, t): nothing prefetched — blocking parallel loads
        _stage_dma(cache_ref, zero, stage_refs[0], r, sems_ref.at[9], "start")
        _stage_dma(cache_ref, one, stage_refs[1], r, sems_ref.at[10], "start")
        _stage_dma(x_ref, zero, stage_refs[2], r, sems_ref.at[11], "start")
        _stage_dma(cache_ref, zero, stage_refs[0], r, sems_ref.at[9], "wait")
        _stage_dma(cache_ref, one, stage_refs[1], r, sems_ref.at[10], "wait")
        _stage_dma(x_ref, zero, stage_refs[2], r, sems_ref.at[11], "wait")

    @pl.when((o == 0) & (t == 0) & (r > 0))
    def _warm_start():
        # the previous row-tile's last step started these three DMAs
        _stage_dma(cache_ref, zero, stage_refs[0], r, sems_ref.at[9], "wait")
        _stage_dma(cache_ref, one, stage_refs[1], r, sems_ref.at[10], "wait")
        _stage_dma(x_ref, zero, stage_refs[2], r, sems_ref.at[11], "wait")

    @pl.when((o == 0) & (t == 0))
    def _first_finish():
        _finish_stage(stage_refs[0], normalize=False, nx_idx=None)
        _finish_stage(stage_refs[1], normalize=False, nx_idx=None)
        # x frame 0 -> virtual frame 2; cache-emit when 0 >= T - 2
        _finish_stage(stage_refs[2], normalize=apply_norm,
                      nx_idx=jnp.asarray(2 - t_frames, jnp.int32))

    @pl.when(o == 0)
    def _window_step():
        for k in range(3):  # t % 3 == k: window stages (k, k+1, k+2) % 3
            @pl.when(t % 3 == k)
            def _step(k=k):
                @pl.when(t > 0)
                def _arrive():
                    # x frame t (virtual t+2), started at step t-1 into
                    # the stage freed by that step's pack
                    arr = stage_refs[(k + 2) % 3]
                    _stage_dma(x_ref, t, arr, r, sems_ref.at[12], "wait")
                    _finish_stage(
                        arr, normalize=apply_norm,
                        nx_idx=t - jnp.asarray(t_frames - 2, jnp.int32))

                _pack_kbuf((k, (k + 1) % 3, (k + 2) % 3))

                @pl.when(t + 1 < t_frames)
                def _prefetch_x():
                    # stage k (virtual frame t) is dead after the pack
                    _stage_dma(x_ref, t + 1, stage_refs[k], r,
                               sems_ref.at[12], "start")

        @pl.when((t + 1 == t_frames) & (r + 1 < num_r))
        def _prefetch_next_row():
            # all stages are dead after the last pack of this row-tile;
            # start the next row-tile's three loads (waited by _warm_start)
            _stage_dma(cache_ref, zero, stage_refs[0], r + 1,
                       sems_ref.at[9], "start")
            _stage_dma(cache_ref, one, stage_refs[1], r + 1,
                       sems_ref.at[10], "start")
            _stage_dma(x_ref, zero, stage_refs[2], r + 1,
                       sems_ref.at[11], "start")

        if int8:
            _quant_kbuf()

    # ---- the GEMM: [th*wp, 3*kh*cp] x [3*kh*cp, kw*bo], all taps at once --
    wp = width + 16
    if int8:
        lhs8 = kbuf8_ref[...].reshape(th * wp, 3 * kh * cp)
        s32 = jax.lax.dot_general(
            lhs8, w_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [th*wp, kw*bo] on the int8 MXU pipe (2x bf16 rate)
        out9 = s32.astype(jnp.float32) * (
            ascale_ref[0, 0] * wsc_ref[0, 0][None, :]
        )
    elif ablate == "no_gemm":
        # ablation timing: skip the MXU contraction, keep everything else
        out9 = jnp.zeros((th * wp, kw * bo), jnp.float32)
    else:
        lhs = kbuf_ref[...].reshape(th * wp, 3 * kh * cp)
        out9 = jax.lax.dot_general(
            lhs, w_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [th*wp, kw*bo]

    # Output col w sums input cols w+8-kw//2+dx.  In the flattened rows a
    # column shift of s is a row shift of s, and the wrap between h-blocks
    # lands in the zeroed pad columns (wp - W = 16 > kw): a cheap f32
    # sublane roll.  (kw==1: the single variant just shifts data from
    # staging columns [8, 8+W) back to [0, W).)
    n = th * wp
    if ablate == "no_roll":
        acc = out9[:, 0:bo]
    else:
        acc = sum(
            pltpu.roll(out9[:, dx * bo : (dx + 1) * bo], n - (8 - kw // 2 + dx), 0)
            for dx in range(kw)
        )
    acc = acc.reshape(th, wp, bo)[:, 0:width, :]

    if has_bias:
        acc = acc + bias_ref[0].astype(jnp.float32)[None, None, :]
    y = acc.astype(out_ref.dtype)
    if has_residual:
        y = y + res_ref[0]
    out_ref[0] = y


def _pick_tiles(cp: int, op: int, h: int, w: int, dtype_bytes: int,
                kh: int = 3, kw: int = 3,
                budget: Optional[float] = None) -> Tuple[int, int]:
    """Choose (row-tile, O-tile) fitting the VMEM budget.  th must divide H;
    bo must divide O_pad and be a lane-tile multiple (or the whole of a
    sub-tile O).

    The budget sets the row tile at real geometry: 20e6 picks th=2 at the
    full-res 96ch stage / th=4 at 192/384ch (2x / 1.5x redundant halo
    reads and per-step overhead); ~45e6 picks th=8 everywhere, inside the
    kernel's 100MB vmem_limit.  LONGLIVE_VAE_VMEM_BUDGET overrides for
    on-chip A/B."""
    if budget is None:
        budget = float(os.environ.get("LONGLIVE_VAE_VMEM_BUDGET", "20e6"))
    bo_cands = [op]
    if op % 128 == 0:
        bo_cands += [b for b in (256, 128) if b < op and op % b == 0]
    wp = w + 16
    for th in (8, 6, 4, 2):
        if h % th:
            continue
        for bo in bo_cands:
            kbuf = th * wp * 3 * kh * cp * dtype_bytes
            stag = 3 * (th + 2) * wp * cp * dtype_bytes
            wght = 3 * kh * cp * kw * bo * dtype_bytes * 2  # pallas double-buffers
            out9 = th * wp * kw * bo * 4
            io = 2 * 2 * th * w * bo * dtype_bytes
            if kbuf + stag + wght + out9 + io < budget:
                return th, bo
    return 2, min(bo_cands[-1], 128)


@functools.partial(jax.jit, static_argnames=("true_c", "kh", "kw",
                                              "interpret", "th", "bo",
                                              "ablate"))
def _fused_causal_conv_impl(x, cache, wp9, b, gamma, residual, true_c: int,
                            kh: int = 3, kw: int = 3,
                            interpret: bool = False,
                            wsc: Optional[jax.Array] = None,
                            ginv: Optional[jax.Array] = None,
                            th: int = 2, bo: int = 128,
                            ablate: str = ""):
    # th/bo are chosen by the CALLER (fused_causal_conv) and passed static:
    # choosing them here would read LONGLIVE_VAE_VMEM_BUDGET at trace time
    # only, so an in-process A/B of the knob (vae_probe fused_bigtiles)
    # would silently re-measure the first compile's tiling
    t, h, wd, src_c = x.shape
    cp = _aligned(src_c)
    op = wp9.shape[0] * wp9.shape[2] // kw
    assert wp9.shape == (op // bo, 3 * kh * cp, kw * bo), (wp9.shape, cp, op, bo)
    grid = (h // th, t, op // bo)

    apply_norm = gamma is not None
    has_bias = b is not None
    has_residual = residual is not None
    int8 = wsc is not None

    in_specs = []
    operands = []
    if apply_norm:
        in_specs.append(pl.BlockSpec((1, cp), lambda r, tt, oo: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(gamma.reshape(1, cp).astype(jnp.float32))
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bo), lambda r, tt, oo: (0, oo),
                                     memory_space=pltpu.VMEM))
        operands.append(b.reshape(1, op).astype(jnp.float32))
    if has_residual:
        in_specs.append(pl.BlockSpec(
            (1, th, wd, bo), lambda r, tt, oo: (tt, r, 0, oo),
            memory_space=pltpu.VMEM))
        operands.append(residual)
    if int8:
        in_specs.append(pl.BlockSpec((1, 1, kw * bo),
                                     lambda r, tt, oo: (oo, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(wsc)
        assert ginv is not None  # pack_weights_int8 always produces one
        in_specs.append(pl.BlockSpec((1, 3 * kh * cp),
                                     lambda r, tt, oo: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(ginv)
    in_specs += [
        pl.BlockSpec((1, 3 * kh * cp, kw * bo), lambda r, tt, oo: (oo, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # cache frames
        pl.BlockSpec(memory_space=pl.ANY),  # x frames
    ]
    operands += [wp9, cache, x]

    wp_ = wd + 16
    out, nx = pl.pallas_call(
        functools.partial(
            _fused_kernel, th=th, bo=bo, t_frames=t, width=wd,
            n_rows=h // th, true_c=true_c, cp=cp, kh=kh, kw=kw,
            apply_norm=apply_norm,
            has_bias=has_bias, has_residual=has_residual, int8=int8,
            ablate=ablate,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, th, wd, bo), lambda r, tt, oo: (tt, r, 0, oo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, h, wd, op), x.dtype),
            jax.ShapeDtypeStruct((2, h, wd, src_c), x.dtype),
        ],
        scratch_shapes=[
            # data at columns [8, 8+W); 8 pad columns each side keep every
            # second-minor offset 8-aligned for Mosaic
            pltpu.VMEM((th + 2, wp_, cp), x.dtype),
            pltpu.VMEM((th + 2, wp_, cp), x.dtype),
            pltpu.VMEM((th + 2, wp_, cp), x.dtype),
            pltpu.VMEM((th, wp_, 3 * kh * cp), x.dtype),
        ] + ([
            pltpu.VMEM((th, wp_, 3 * kh * cp), jnp.int8),
            pltpu.SMEM((1, 1), jnp.float32),
        ] if int8 else []) + [
            # 0: nx emit; 1..8: K-pack copies; 9/10/11: the three t==0
            # stage loads (prefetched across row-tiles); 12: the
            # within-row x-frame prefetch
            pltpu.SemaphoreType.DMA((13,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # Mosaic's scoped accounting charges the GEMM-operand and roll
            # intermediates on top of the scratch buffers; the 16M default
            # is far below physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out, nx


def _aligned(n: int) -> int:
    """Lane-align real channel counts; leave sub-96 (test) sizes alone."""
    return n if (n < 96 or n % 128 == 0) else -(-n // 128) * 128


def pack_weights(w: jax.Array, cp: int, op: int, bo: int, dtype) -> jax.Array:
    """[O, I, 3, kh, kw] torch layout -> [op//bo, 3*kh*cp, kw*bo]: K packs
    (tap, dy, channel), N packs each O tile's kw dx variants contiguously.
    kh, kw in {1, 3} (the (3,3,3) res-block convs and (3,1,1) time convs)."""
    o, ci = int(w.shape[0]), int(w.shape[1])
    kh, kw = int(w.shape[3]), int(w.shape[4])
    wt = w.astype(dtype).transpose(2, 3, 4, 1, 0)  # [kt, kh, kw, I, O]
    wt = jnp.pad(wt, [(0, 0), (0, 0), (0, 0), (0, cp - ci), (0, op - o)])
    wt = wt.transpose(0, 1, 3, 2, 4)               # [tau, dy, cp, dx, op]
    wt = wt.reshape(3 * kh * cp, kw, op // bo, bo)
    # NO leading (blockable dim); (3kh*cp, kw*bo) trailing (lane-tile aligned)
    return wt.transpose(2, 0, 1, 3).reshape(op // bo, 3 * kh * cp, kw * bo)


def pack_weights_int8(w: jax.Array, cp: int, op: int, bo: int,
                      kh: int, g: Optional[jax.Array] = None
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """pack_weights + symmetric per-column int8 quantization.  Each packed
    column is one (dx, output-channel) pair, so the scales are exactly the
    standard per-output-channel granularity; the contraction (K) axis keeps
    a single scale as required for an int32 MXU accumulate.

    ``g`` [cp] (norm prologues: max(|gamma|, eps)) is folded INTO the
    weights along K and divided OUT of the activations in the kernel —
    exact algebra that removes the per-channel gamma spread from the
    single-scale activation quantization.  Returns (wq, scales, ginv_k)
    with ginv_k [1, 3*kh*cp] laid out like the K packing."""
    wf = pack_weights(w, cp, op, bo, jnp.float32)
    if g is None:
        g = jnp.ones((cp,), jnp.float32)
    gk = jnp.tile(g.astype(jnp.float32), 3 * kh)          # K = (tau, dy, c)
    wf = wf * gk[None, :, None]
    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)    # [op//bo, 1, kw*bo]
    sc = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.round(wf / sc).astype(jnp.int8)
    return wq, sc.astype(jnp.float32), (1.0 / gk)[None, :]


def fused_causal_conv(
    x: jax.Array,
    cache: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    gamma: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused [norm+silu ->] causal conv3d(k=3x3x3, stride 1, SAME) [-> +res].

    x: [T, H, W, C] raw frames; cache: [2, H, W, C] — the previous two conv
    *input* frames (normalized when ``gamma`` is given), zeros for the first
    chunk; w: [O, C, 3, 3, 3] torch layout; residual: [T, H, W, O_pad].

    Returns (out, new_cache).  Mosaic requires lane extents that are tile
    multiples, so real channel counts (>= 96) are padded to 128-multiples
    with zero lanes (zero weights and zero norm contributions make this
    exact):

    - ``x`` may arrive already lane-padded from an upstream fused conv
      (true channel count = w's input dim); it is padded here otherwise.
    - ``out`` is [T, H, W, O_pad] (NOT stripped — the padded layout flows
      through the res-block chain for free; consumers with true-width
      weights slice as needed).
    - ``new_cache`` is [2, H, W, C_pad], holding the last two (normalized)
      input frames — semantics of the reference's ``feat_cache =
      full[:, -2:]`` (vae.py:30-33); feed it back verbatim.
    """

    def _lane_pad(a, to):
        if a is None or a.shape[-1] == to:
            return a
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, to - a.shape[-1])])

    o, ci = int(w.shape[0]), int(w.shape[1])
    kt, kh, kw = (int(s) for s in w.shape[2:])
    assert kt == 3 and kh in (1, 3) and kw in (1, 3), w.shape
    cp = _aligned(max(x.shape[-1], ci))
    op = _aligned(o)
    th, bo = _pick_tiles(cp, op, x.shape[1], x.shape[2], x.dtype.itemsize,
                         kh, kw)

    # LONGLIVE_VAE_INT8=1: the GEMM runs on the int8 MXU pipe (2x the bf16
    # rate) — per-output-channel weight scales, one dynamic activation
    # scale per (row-tile, frame) quantized in VMEM (never re-streams HBM,
    # unlike the XLA int8-conv path whose layout poisoning blocked mixing
    # with the fused kernel, PERF.md r1), gamma spread folded into the
    # weights.  Quantization-bounded, not exact; opt-in for the A/B.
    int8 = os.environ.get("LONGLIVE_VAE_INT8", "0") == "1"
    if int8:
        g = (jnp.maximum(jnp.abs(_lane_pad(gamma, cp)), 1e-6)
             if gamma is not None else None)
        wp9, wsc, ginv = pack_weights_int8(w, cp, op, bo, kh, g)
    else:
        wp9, wsc, ginv = pack_weights(w, cp, op, bo, x.dtype), None, None
    # Lane padding is mandatory, not an optimization choice.  "Dense"
    # true-width HBM streaming (the round-1 hypothesis of a (cp/C)^2
    # stream tax) is structurally impossible on TPU — measured negative
    # result, PERF.md round 2:
    #   (a) XLA lane-pads HBM *storage* to (8,128) tiles regardless of the
    #       logical width (a [..,96] array occupies and streams 128 lanes;
    #       scan-rate ground truth 0.989), so there are no bytes to save;
    #   (b) Mosaic rejects every sub-tile lane slice of an HBM memref —
    #       even [0:96] of a 96-wide array ("Slice shape along dimension 3
    #       must be aligned to tiling (128)") — so such a kernel cannot
    #       even compile at the real stage widths.
    x = _lane_pad(x, cp)
    cache = _lane_pad(cache, cp)
    residual = _lane_pad(residual, op)
    gamma = _lane_pad(gamma, cp)
    b = _lane_pad(b, op)

    # LONGLIVE_VAE_ABLATE in {no_dma, no_pack, no_norm, no_gemm, no_roll}:
    # TIMING-ONLY ablations (wrong outputs) that remove one kernel
    # component each, to attribute the fused-conv step time on chip
    ablate = os.environ.get("LONGLIVE_VAE_ABLATE", "")
    out, nx = _fused_causal_conv_impl(x, cache, wp9, b, gamma, residual,
                                      true_c=ci,
                                      kh=kh, kw=kw, interpret=interpret,
                                      wsc=wsc, ginv=ginv, th=th, bo=bo,
                                      ablate=ablate)
    if x.shape[0] == 1:
        # only nx[1] was computable from x; frame 0 of the new cache is the
        # old cache's frame 1
        nx = jnp.concatenate([cache[1:2], nx[1:2]], axis=0)
    return out, nx


# ---------------------------------------------------------------------------
# res_block pair fusion: BOTH convs of a ResidualBlock (vae.py:186-220) in a
# single kernel.  conv1's normalized output never round-trips HBM: it is
# computed into a 3-frame VMEM staging window (exactly the x window of the
# single-conv kernel, but written by the MXU instead of DMA'd from HBM) and
# conv2 consumes it in the same grid step.  Eliminated per res_block vs the
# 2-call chain: the intermediate activation's HBM write + (halo-redundant)
# re-read, one kernel dispatch, and conv2's staging-DMA critical path.
# Cost: conv1 recomputes its per-row-tile halo rows ((th+2)/th FLOP
# redundancy), so the pair kernel wants the LARGE row tiles the single-conv
# kernel measured against (r2 "bigtiles") — the A/B decides per stage.
# Scope: the no-shortcut (C == O) res blocks, kt=kh=kw=3 stride 1, bf16,
# B == 1 streaming decode.  Shortcut blocks fall back to the 2-call chain.


def _pair_kernel(
    gamma1_ref, gamma2_ref, b1_ref, b2_ref, w1_ref, w2_ref,
    cache1_ref, cache2_ref, x_ref, res_ref,
    out_ref, nc1_ref, nc2_ref,
    xs0, xs1, xs2, ys0, ys1, ys2, kbuf1, kbuf2, sems,
    *,
    th: int,
    t_frames: int,
    width: int,
    n_rows: int,
    c1_true: int,
    c2_true: int,
    cp: int,
    cp2: int,
    op1: int,
    op2: int,
):
    r = pl.program_id(0)
    t = pl.program_id(1)
    num_r = pl.num_programs(0)
    xs_refs = (xs0, xs1, xs2)
    ys_refs = (ys0, ys1, ys2)
    zero = jnp.zeros((), jnp.int32)
    one = jnp.ones((), jnp.int32)

    # ---- staging DMA (x window: halo 2 -> th+4 rows; y window: halo 1) ----
    def _xdma(src_ref, src_idx, stage_ref, rr, sem, op):
        def _cp(src_row0, dst_row0, nrows):
            return pltpu.make_async_copy(
                src_ref.at[src_idx, pl.ds(src_row0, nrows)],
                stage_ref.at[pl.ds(dst_row0, nrows), pl.ds(8, width)],
                sem,
            )

        if n_rows == 1:
            getattr(_cp(0, 2, th), op)()
        else:
            @pl.when(rr == 0)
            def _top():
                getattr(_cp(0, 2, th + 2), op)()

            @pl.when((rr > 0) & (rr < num_r - 1))
            def _mid():
                getattr(_cp(rr * th - 2, 0, th + 4), op)()

            @pl.when((rr == num_r - 1) & (rr > 0))
            def _bot():
                getattr(_cp(rr * th - 2, 0, th + 2), op)()

    def _ydma(src_idx, stage_ref, rr, sem, op):
        def _cp(src_row0, dst_row0, nrows):
            return pltpu.make_async_copy(
                cache2_ref.at[src_idx, pl.ds(src_row0, nrows)],
                stage_ref.at[pl.ds(dst_row0, nrows), pl.ds(8, width)],
                sem,
            )

        if n_rows == 1:
            getattr(_cp(0, 1, th), op)()
        else:
            @pl.when(rr == 0)
            def _top():
                getattr(_cp(0, 1, th + 1), op)()

            @pl.when((rr > 0) & (rr < num_r - 1))
            def _mid():
                getattr(_cp(rr * th - 1, 0, th + 2), op)()

            @pl.when((rr == num_r - 1) & (rr > 0))
            def _bot():
                getattr(_cp(rr * th - 1, 0, th + 1), op)()

    # ---- stage finishing -------------------------------------------------
    def _zero_cols(stage_ref):
        stage_ref[:, 0:8] = jnp.zeros_like(stage_ref[:, 0:8])
        stage_ref[:, width + 8 : width + 16] = jnp.zeros_like(
            stage_ref[:, width + 8 : width + 16])

    def _finish_x(stage_ref, normalize, nx_idx):
        """Zero the halo-2 borders, optionally norm1+silu, optionally emit
        image rows [2, 2+th) to nc1[nx_idx]."""
        if n_rows == 1:
            stage_ref[0:2] = jnp.zeros_like(stage_ref[0:2])
            stage_ref[th + 2 : th + 4] = jnp.zeros_like(
                stage_ref[th + 2 : th + 4])
        else:
            @pl.when(r == 0)
            def _top():
                stage_ref[0:2] = jnp.zeros_like(stage_ref[0:2])

            @pl.when(r == num_r - 1)
            def _bot():
                stage_ref[th + 2 : th + 4] = jnp.zeros_like(
                    stage_ref[th + 2 : th + 4])

        _zero_cols(stage_ref)
        if normalize:
            tile = stage_ref[...].astype(jnp.float32)
            stage_ref[...] = _norm_silu_tile(
                tile, gamma1_ref[0].astype(jnp.float32), stage_ref.dtype,
                c1_true)
        if nx_idx is not None:
            @pl.when(nx_idx >= 0)
            def _emit():
                cp_ = pltpu.make_async_copy(
                    stage_ref.at[pl.ds(2, th), pl.ds(8, width)],
                    nc1_ref.at[nx_idx, pl.ds(r * th, th)],
                    sems.at[0],
                )
                cp_.start()
                cp_.wait()

    def _finish_y_loaded(stage_ref):
        """cache2 frames arrive already normalized — just zero borders."""
        if n_rows == 1:
            stage_ref[0:1] = jnp.zeros_like(stage_ref[0:1])
            stage_ref[th + 1 : th + 2] = jnp.zeros_like(
                stage_ref[th + 1 : th + 2])
        else:
            @pl.when(r == 0)
            def _top():
                stage_ref[0:1] = jnp.zeros_like(stage_ref[0:1])

            @pl.when(r == num_r - 1)
            def _bot():
                stage_ref[th + 1 : th + 2] = jnp.zeros_like(
                    stage_ref[th + 1 : th + 2])

        _zero_cols(stage_ref)

    # ---- K-packing (9 row-shifted VMEM copies each, sems 1..9 shared) ----
    def _pack1(perm):
        copies = []
        for tau in range(3):
            for dy in range(3):
                kblk = (3 * tau + dy) * cp
                copies.append(pltpu.make_async_copy(
                    xs_refs[perm[tau]].at[pl.ds(dy, th + 2)],
                    kbuf1.at[:, :, pl.ds(kblk, cp)],
                    sems.at[3 * tau + dy + 1],
                ))
        for c_ in copies:
            c_.start()
        for c_ in copies:
            c_.wait()

    def _pack2(perm):
        copies = []
        for tau in range(3):
            for dy in range(3):
                kblk = (3 * tau + dy) * cp2
                copies.append(pltpu.make_async_copy(
                    ys_refs[perm[tau]].at[pl.ds(dy, th)],
                    kbuf2.at[:, :, pl.ds(kblk, cp2)],
                    sems.at[3 * tau + dy + 1],
                ))
        for c_ in copies:
            c_.start()
        for c_ in copies:
            c_.wait()

    def _start_t0_loads(rr):
        _xdma(cache1_ref, zero, xs0, rr, sems.at[10], "start")
        _xdma(cache1_ref, one, xs1, rr, sems.at[11], "start")
        _xdma(x_ref, zero, xs2, rr, sems.at[12], "start")
        _ydma(zero, ys0, rr, sems.at[13], "start")
        _ydma(one, ys1, rr, sems.at[14], "start")

    def _wait_t0_loads(rr):
        _xdma(cache1_ref, zero, xs0, rr, sems.at[10], "wait")
        _xdma(cache1_ref, one, xs1, rr, sems.at[11], "wait")
        _xdma(x_ref, zero, xs2, rr, sems.at[12], "wait")
        _ydma(zero, ys0, rr, sems.at[13], "wait")
        _ydma(one, ys1, rr, sems.at[14], "wait")

    @pl.when((t == 0) & (r == 0))
    def _cold_start():
        _start_t0_loads(r)
        _wait_t0_loads(r)

    @pl.when((t == 0) & (r > 0))
    def _warm_start():
        # started by the previous row-tile's last step
        _wait_t0_loads(r)

    @pl.when(t == 0)
    def _first_finish():
        _finish_x(xs0, normalize=False, nx_idx=None)
        _finish_x(xs1, normalize=False, nx_idx=None)
        _finish_x(xs2, normalize=True,
                  nx_idx=jnp.asarray(2 - t_frames, jnp.int32))
        _finish_y_loaded(ys0)
        _finish_y_loaded(ys1)

    # ---- window step A: x arrival + pack1 + x prefetch -------------------
    for k in range(3):
        @pl.when(t % 3 == k)
        def _step_a(k=k):
            @pl.when(t > 0)
            def _arrive():
                arr = xs_refs[(k + 2) % 3]
                _xdma(x_ref, t, arr, r, sems.at[15], "wait")
                _finish_x(arr, normalize=True,
                          nx_idx=t - jnp.asarray(t_frames - 2, jnp.int32))

            _pack1((k, (k + 1) % 3, (k + 2) % 3))

            @pl.when(t + 1 < t_frames)
            def _prefetch_x():
                _xdma(x_ref, t + 1, xs_refs[k], r, sems.at[15], "start")

    # ---- conv1 GEMM: y frame t, staged layout (data at cols [8, 8+W)) ----
    wp = width + 16
    n1 = (th + 2) * wp
    lhs1 = kbuf1[...].reshape(n1, 3 * 3 * cp)
    o1 = jax.lax.dot_general(
        lhs1, w1_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [(th+2)*wp, 3*op1]
    # keep the result in the STAGED column layout: output staged col c sums
    # input staged cols c + (dx - 1) -> shift by (1 - dx); wraps land in the
    # zeroed pad columns (o1's pad cols are zero because the x stages' are)
    y_stage = sum(
        pltpu.roll(o1[:, dx * op1 : (dx + 1) * op1], (1 - dx) % n1, 0)
        for dx in range(3)
    )
    y_stage = y_stage + b1_ref[0].astype(jnp.float32)[None, :]
    y_bf = y_stage.reshape(th + 2, wp, op1).astype(out_ref.dtype)

    # ---- window step B: store y, norm2+silu, emit nc2, pack2 -------------
    for k in range(3):
        @pl.when(t % 3 == k)
        def _step_b(k=k):
            ref = ys_refs[(k + 2) % 3]
            ref[...] = y_bf
            _finish_y_loaded(ref)  # zero halo/border (r edges + pad cols)
            tile = ref[...].astype(jnp.float32)
            ref[...] = _norm_silu_tile(
                tile, gamma2_ref[0].astype(jnp.float32), ref.dtype, c2_true)
            nx2 = t - jnp.asarray(t_frames - 2, jnp.int32)

            @pl.when(nx2 >= 0)
            def _emit():
                cp_ = pltpu.make_async_copy(
                    ref.at[pl.ds(1, th), pl.ds(8, width)],
                    nc2_ref.at[nx2, pl.ds(r * th, th)],
                    sems.at[0],
                )
                cp_.start()
                cp_.wait()

            _pack2((k, (k + 1) % 3, (k + 2) % 3))

    @pl.when((t + 1 == t_frames) & (r + 1 < num_r))
    def _prefetch_next_row():
        _start_t0_loads(r + 1)

    # ---- conv2 GEMM + residual epilogue ----------------------------------
    n2 = th * wp
    lhs2 = kbuf2[...].reshape(n2, 3 * 3 * cp2)
    o2 = jax.lax.dot_general(
        lhs2, w2_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [th*wp, 3*op2]
    acc = sum(
        pltpu.roll(o2[:, dx * op2 : (dx + 1) * op2], n2 - (7 + dx), 0)
        for dx in range(3)
    )
    acc = acc.reshape(th, wp, op2)[:, 0:width, :]
    acc = acc + b2_ref[0].astype(jnp.float32)[None, None, :]
    out_ref[0] = acc.astype(out_ref.dtype) + res_ref[0]


def _pick_tile_pair(cp: int, cp2: int, op1: int, op2: int, h: int, w: int,
                    dtype_bytes: int) -> Optional[int]:
    """Row tile for the pair kernel (whole-O tiles both convs).  Needs
    th >= 4 to bound conv1's halo recompute at (th+2)/th <= 1.5; returns
    None (caller falls back to the 2-call chain) when nothing fits the
    budget.  LONGLIVE_VAE_PAIR_TH forces a tile for on-chip A/B."""
    forced = os.environ.get("LONGLIVE_VAE_PAIR_TH")
    if forced:
        th = int(forced)
        return th if h % th == 0 else None
    budget = float(os.environ.get("LONGLIVE_VAE_PAIR_BUDGET", "80e6"))
    wp = w + 16
    for th in (8, 6, 4):
        if h % th:
            continue
        xs = 3 * (th + 4) * wp * cp * dtype_bytes
        ys = 3 * (th + 2) * wp * cp2 * dtype_bytes
        kb1 = (th + 2) * wp * 9 * cp * dtype_bytes
        kb2 = th * wp * 9 * cp2 * dtype_bytes
        o91 = (th + 2) * wp * 3 * op1 * 4
        o92 = th * wp * 3 * op2 * 4
        wt = 2 * (9 * cp * 3 * op1 + 9 * cp2 * 3 * op2) * dtype_bytes
        io = 3 * th * w * op2 * dtype_bytes  # out + residual tiles
        if xs + ys + kb1 + kb2 + o91 + o92 + wt + io < budget:
            return th
    return None


@functools.partial(jax.jit, static_argnames=("c1_true", "c2_true", "th",
                                              "interpret"))
def _fused_res_block_impl(x, cache1, cache2, w1p, b1, gamma1, w2p, b2,
                          gamma2, c1_true: int, c2_true: int, th: int,
                          interpret: bool = False):
    t, h, wd, cp = x.shape
    cp2 = cache2.shape[-1]
    op1 = w1p.shape[2] // 3
    op2 = w2p.shape[2] // 3
    assert w1p.shape == (1, 9 * cp, 3 * op1), (w1p.shape, cp)
    assert w2p.shape == (1, 9 * cp2, 3 * op2), (w2p.shape, cp2)
    grid = (h // th, t)
    wp_ = wd + 16

    in_specs = [
        pl.BlockSpec((1, cp), lambda r, tt: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cp2), lambda r, tt: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, op1), lambda r, tt: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, op2), lambda r, tt: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 9 * cp, 3 * op1), lambda r, tt: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 9 * cp2, 3 * op2), lambda r, tt: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # cache1
        pl.BlockSpec(memory_space=pl.ANY),  # cache2
        pl.BlockSpec(memory_space=pl.ANY),  # x
        pl.BlockSpec((1, th, wd, op2), lambda r, tt: (tt, r, 0, 0),
                     memory_space=pltpu.VMEM),  # residual = x re-read
    ]
    operands = [
        gamma1.reshape(1, cp).astype(jnp.float32),
        gamma2.reshape(1, cp2).astype(jnp.float32),
        b1.reshape(1, op1).astype(jnp.float32),
        b2.reshape(1, op2).astype(jnp.float32),
        w1p, w2p, cache1, cache2, x, x,
    ]

    out, nc1, nc2 = pl.pallas_call(
        functools.partial(
            _pair_kernel, th=th, t_frames=t, width=wd, n_rows=h // th,
            c1_true=c1_true, c2_true=c2_true, cp=cp, cp2=cp2,
            op1=op1, op2=op2,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, th, wd, op2), lambda r, tt: (tt, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, h, wd, op2), x.dtype),
            jax.ShapeDtypeStruct((2, h, wd, cp), x.dtype),
            jax.ShapeDtypeStruct((2, h, wd, cp2), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((th + 4, wp_, cp), x.dtype),
            pltpu.VMEM((th + 4, wp_, cp), x.dtype),
            pltpu.VMEM((th + 4, wp_, cp), x.dtype),
            pltpu.VMEM((th + 2, wp_, cp2), x.dtype),
            pltpu.VMEM((th + 2, wp_, cp2), x.dtype),
            pltpu.VMEM((th + 2, wp_, cp2), x.dtype),
            pltpu.VMEM((th + 2, wp_, 9 * cp), x.dtype),
            pltpu.VMEM((th, wp_, 9 * cp2), x.dtype),
            # 0: nc emits; 1..9: K-pack copies (shared by both packs);
            # 10..14: the five t==0 stage loads (prefetched across row
            # tiles); 15: the within-row x-frame prefetch
            pltpu.SemaphoreType.DMA((16,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out, nc1, nc2


def fused_res_block(
    x: jax.Array,
    cache1: jax.Array,
    cache2: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    gamma1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    gamma2: jax.Array,
    interpret: bool = False,
) -> Optional[Tuple[jax.Array, jax.Array, jax.Array]]:
    """Whole no-shortcut ResidualBlock (vae.py:186-220) in one kernel:
    ``out = conv2(silu(norm2(conv1(silu(norm1(x)))))) + x`` with both causal
    conv caches threaded.  Bitwise-equal to the two ``fused_causal_conv``
    calls it replaces (same GEMM operands, same rounding points — the
    intermediate just never leaves VMEM).

    x: [T, H, W, C]; cache1: [2, H, W, C] normalized (norm1) input frames;
    cache2: [2, H, W, C] normalized (norm2) conv1-output frames — both
    exactly what the chain's per-conv ``feat_cache`` slots hold.  Returns
    (out, new_cache1, new_cache2) or None when the geometry doesn't fit
    (caller falls back)."""
    o1, ci1 = int(w1.shape[0]), int(w1.shape[1])
    o2, ci2 = int(w2.shape[0]), int(w2.shape[1])
    assert tuple(w1.shape[2:]) == (3, 3, 3) and tuple(w2.shape[2:]) == (3, 3, 3)
    assert o1 == ci2 and o2 == ci1, (w1.shape, w2.shape)
    cp = _aligned(max(x.shape[-1], ci1))
    cp2 = _aligned(o1)
    op1, op2 = cp2, cp  # C == O chain
    th = _pick_tile_pair(cp, cp2, op1, op2, x.shape[1], x.shape[2],
                         x.dtype.itemsize)
    if th is None:
        return None

    def _lane_pad(a, to):
        if a is None or a.shape[-1] == to:
            return a
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, to - a.shape[-1])])

    w1p = pack_weights(w1, cp, op1, op1, x.dtype)
    w2p = pack_weights(w2, cp2, op2, op2, x.dtype)
    x = _lane_pad(x, cp)
    cache1 = _lane_pad(cache1, cp)
    cache2 = _lane_pad(cache2, cp2)
    out, nc1, nc2 = _fused_res_block_impl(
        x, cache1, cache2, w1p, _lane_pad(b1, op1), _lane_pad(gamma1, cp),
        w2p, _lane_pad(b2, op2), _lane_pad(gamma2, cp2),
        c1_true=ci1, c2_true=ci2, th=th, interpret=interpret)
    if x.shape[0] == 1:
        nc1 = jnp.concatenate([cache1[1:2], nc1[1:2]], axis=0)
        nc2 = jnp.concatenate([cache2[1:2], nc2[1:2]], axis=0)
    return out, nc1, nc2
