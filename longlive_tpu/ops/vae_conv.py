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
