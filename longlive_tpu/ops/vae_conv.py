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
  in VMEM on the raw input tile, so the normalized activation never round-
  trips through HBM;
- the residual add of ``res_block`` is an epilogue;
- the conv itself is an implicit GEMM: 27 (tap, dy, dx) shifted [rows, C] x
  [C, O] matmuls accumulated in f32 — the same contraction XLA performs,
  without the layout passes;
- the next call's cache frames (i.e. the *normalized* last two input frames,
  exactly what the reference's ``feat_cache`` holds) are emitted as a side
  output, so the cache update is free.

Spatial SAME padding is handled in VMEM (halo rows DMA'd per tile, border
rows/cols zeroed), time-causal padding by the caller handing in zero cache
frames for the first chunk — identical semantics to the reference.

Layout: frames are [T, H, W, C] channels-last; weights arrive in the torch
[O, I, kt, kh, kw] layout and are re-packed once per call to [27, C, O]
(tap-major).  B == 1 only — the streaming decode path; wider batches fall
back to the XLA path in models/vae.py.
"""

from __future__ import annotations

import functools
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
    # refs (order: gamma?, bias?, residual?, w, cache, x, out, nx, scratch...)
    *refs,
    th: int,
    bo: int,
    t_frames: int,
    height: int,
    width: int,
    n_rows: int,
    true_c: int,
    apply_norm: bool,
    has_bias: bool,
    has_residual: bool,
):
    idx = 0
    gamma_ref = None
    bias_ref = None
    res_ref = None
    if apply_norm:
        gamma_ref = refs[idx]; idx += 1
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    if has_residual:
        res_ref = refs[idx]; idx += 1
    w_ref, cache_ref, x_ref = refs[idx], refs[idx + 1], refs[idx + 2]
    out_ref, nx_ref = refs[idx + 3], refs[idx + 4]
    tap0_ref, tap1_ref, tap2_ref, sem_ref = refs[idx + 5 : idx + 9]

    r = pl.program_id(0)
    t = pl.program_id(1)
    o = pl.program_id(2)
    num_r = pl.num_programs(0)

    def _load(src_ref, src_idx, tap_ref, normalize, nx_idx):
        """DMA rows [r*th-1, r*th+th] of frame ``src_idx`` into ``tap_ref``
        (halo-padded), zero the borders, optionally norm+silu, optionally
        emit the tile to nx[nx_idx] (the next cache frames).  The tap refs
        are static — Mosaic cannot slice a dynamically-indexed buffer whose
        lane dim is not a multiple of 128 (e.g. C=192)."""
        row0 = r * th - 1

        if n_rows == 1:  # single row tile: th == H, zero both halo rows
            cp = pltpu.make_async_copy(
                src_ref.at[src_idx, pl.ds(0, th)],
                tap_ref.at[pl.ds(1, th), pl.ds(8, width)],
                sem_ref,
            )
            cp.start()
            cp.wait()
            tap_ref[0:1] = jnp.zeros_like(tap_ref[0:1])
            tap_ref[th + 1 : th + 2] = jnp.zeros_like(tap_ref[th + 1 : th + 2])
        else:
            @pl.when(r == 0)
            def _top():
                cp = pltpu.make_async_copy(
                    src_ref.at[src_idx, pl.ds(0, th + 1)],
                    tap_ref.at[pl.ds(1, th + 1), pl.ds(8, width)],
                    sem_ref,
                )
                cp.start()
                cp.wait()
                tap_ref[0:1] = jnp.zeros_like(tap_ref[0:1])

            @pl.when((r > 0) & (r < num_r - 1))
            def _mid():
                cp = pltpu.make_async_copy(
                    src_ref.at[src_idx, pl.ds(row0, th + 2)],
                    tap_ref.at[pl.ds(0, th + 2), pl.ds(8, width)],
                    sem_ref,
                )
                cp.start()
                cp.wait()

            @pl.when((r == num_r - 1) & (r > 0))
            def _bot():
                cp = pltpu.make_async_copy(
                    src_ref.at[src_idx, pl.ds(row0, th + 1)],
                    tap_ref.at[pl.ds(0, th + 1), pl.ds(8, width)],
                    sem_ref,
                )
                cp.start()
                cp.wait()
                tap_ref[th + 1 : th + 2] = jnp.zeros_like(
                    tap_ref[th + 1 : th + 2]
                )

        # zero the border columns (SAME padding): data occupies columns
        # [8, 8+W); cols [0,8) and [W+8, W+16) are the pad, all offsets
        # 8-aligned for Mosaic's sublane tiling
        tap_ref[:, 0:8] = jnp.zeros_like(tap_ref[:, 0:8])
        tap_ref[:, width + 8 : width + 16] = jnp.zeros_like(
            tap_ref[:, width + 8 : width + 16]
        )

        if normalize:
            tile = tap_ref[...].astype(jnp.float32)
            tap_ref[...] = _norm_silu_tile(
                tile, gamma_ref[0].astype(jnp.float32), tap_ref.dtype, true_c
            )

        # next-call cache frames: virtual frame u = src_idx + 2 (x frames),
        # needed when u >= T  <=>  src_idx >= T - 2
        if nx_idx is not None:
            @pl.when(nx_idx >= 0)
            def _emit():
                cp = pltpu.make_async_copy(
                    tap_ref.at[pl.ds(1, th), pl.ds(8, width)],
                    nx_ref.at[nx_idx, pl.ds(r * th, th)],
                    sem_ref,
                )
                cp.start()
                cp.wait()

    # ---- tap loading (only on the first O tile of each (r, t)) ----
    # taps hold virtual frames [t, t+1, t+2] of [cache0, cache1, x...]; at
    # each new t the window advances one frame via two VMEM shift-copies
    @pl.when((o == 0) & (t == 0))
    def _load_initial():
        zero = jnp.zeros((), jnp.int32)
        one = jnp.ones((), jnp.int32)
        _load(cache_ref, zero, tap0_ref, normalize=False, nx_idx=None)
        _load(cache_ref, one, tap1_ref, normalize=False, nx_idx=None)
        # x frame 0 -> virtual frame 2; cache-emit when 0 >= T - 2
        nx0 = jnp.asarray(2 - t_frames, jnp.int32)  # = 0 - (T - 2)
        _load(x_ref, zero, tap2_ref, normalize=apply_norm, nx_idx=nx0)

    @pl.when((o == 0) & (t > 0))
    def _load_next():
        tap0_ref[...] = tap1_ref[...]
        tap1_ref[...] = tap2_ref[...]
        _load(x_ref, t, tap2_ref, normalize=apply_norm,
              nx_idx=t - jnp.asarray(t_frames - 2, jnp.int32))

    # ---- implicit GEMM: 27 shifted matmuls ----
    # Unaligned second-minor slicing / bf16 sublane rotates are not
    # available on Mosaic, so the +-1 column shifts are applied on the f32
    # accumulators instead: matmul over the full padded width into one
    # accumulator per dx, then three 32-bit rolls recover the stencil
    # (wraparound lands in the zeroed pad columns).
    wp = width + 16
    c_pad = tap0_ref.shape[-1]
    # one [th*wp, C] x [C, bo] GEMM per (tap, dy, dx) — keeping rows 3D
    # makes Mosaic issue th separate small matmuls (measured 17x slower)
    accs = [jnp.zeros((th * wp, bo), jnp.float32) for _ in range(3)]
    for tau, tap_ref in enumerate((tap0_ref, tap1_ref, tap2_ref)):
        tile = tap_ref[...]  # [th+2, W+16, C]
        for dy in range(3):
            a = tile[dy : dy + th].reshape(th * wp, c_pad)
            for dx in range(3):
                wk = w_ref[tau * 9 + dy * 3 + dx]  # [C, bo]
                accs[dx] = accs[dx] + jax.lax.dot_general(
                    a, wk,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    # Output col w sums input cols w+7+dx.  In the flattened [th*wp, bo]
    # accumulator a column shift of s is a row shift of s (rows are
    # h*wp + w), and the wrap between h-blocks lands in the zeroed pad
    # columns (wp - W = 16 > 9), so the shift is a cheap f32 SUBLANE roll —
    # a middle-dim roll on the 3D view lowers to a catastrophe of shuffles.
    n = th * wp
    acc = sum(
        pltpu.roll(accs[dx], n - (7 + dx), 0) for dx in range(3)
    ).reshape(th, wp, bo)[:, 0:width, :]

    if has_bias:
        acc = acc + bias_ref[0].astype(jnp.float32)[None, None, :]
    y = acc.astype(out_ref.dtype)
    if has_residual:
        y = y + res_ref[0]
    out_ref[0] = y


def _pick_tiles(c: int, o: int, h: int, w: int, dtype_bytes: int,
                budget: float = 12.5e6) -> Tuple[int, int]:
    """Choose (row-tile, O-tile) fitting the VMEM budget.  th must divide H."""
    # O tiles must be the full O or a multiple of 128 (Mosaic lane tiling)
    bo_cands = [o]
    if o % 256 == 0 and o > 256:
        bo_cands.append(256)
    if o % 128 == 0 and o > 128:
        bo_cands.append(128)
    for th in (8, 6, 4, 2):
        if h % th:
            continue
        for bo in bo_cands:
            taps = 3 * (th + 2) * (w + 16) * c * dtype_bytes
            wght = 27 * c * bo * dtype_bytes * 2  # double-buffered by pallas
            accb = 3 * th * (w + 16) * bo * 4 + 2 * th * w * bo * dtype_bytes
            if taps + wght + accb < budget:
                return th, bo
    return 2, min(bo_cands[-1], 128)


@functools.partial(jax.jit, static_argnames=("true_c", "interpret"))
def _fused_causal_conv_impl(x, cache, w27, b, gamma, residual, true_c: int,
                            interpret: bool = False):
    t, h, wd, c = x.shape
    o = w27.shape[-1]
    th, bo = _pick_tiles(c, o, h, wd, x.dtype.itemsize)
    grid = (h // th, t, o // bo if o % bo == 0 else -(-o // bo))
    o_pad = grid[2] * bo

    apply_norm = gamma is not None
    has_bias = b is not None
    has_residual = residual is not None

    if o_pad != o:
        w27 = jnp.pad(w27, [(0, 0), (0, 0), (0, o_pad - o)])
        if has_bias:
            b = jnp.pad(b, [(0, o_pad - o)])
        if has_residual:
            residual = jnp.pad(residual, [(0, 0)] * 3 + [(0, o_pad - o)])

    in_specs = []
    operands = []
    if apply_norm:
        in_specs.append(pl.BlockSpec((1, c), lambda r, tt, oo: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(gamma.reshape(1, c).astype(jnp.float32))
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bo), lambda r, tt, oo: (0, oo),
                                     memory_space=pltpu.VMEM))
        operands.append(b.reshape(1, o_pad).astype(jnp.float32))
    if has_residual:
        in_specs.append(pl.BlockSpec(
            (1, th, wd, bo), lambda r, tt, oo: (tt, r, 0, oo),
            memory_space=pltpu.VMEM))
        operands.append(residual)
    in_specs += [
        pl.BlockSpec((27, c, bo), lambda r, tt, oo: (0, 0, oo),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),  # cache frames
        pl.BlockSpec(memory_space=pltpu.ANY),  # x frames
    ]
    operands += [w27, cache, x]

    out, nx = pl.pallas_call(
        functools.partial(
            _fused_kernel, th=th, bo=bo, t_frames=t, height=h, width=wd,
            n_rows=h // th, true_c=true_c, apply_norm=apply_norm,
            has_bias=has_bias, has_residual=has_residual,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, th, wd, bo), lambda r, tt, oo: (tt, r, 0, oo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, h, wd, o_pad), x.dtype),
            jax.ShapeDtypeStruct((2, h, wd, c), x.dtype),
        ],
        scratch_shapes=[
            # data at columns [8, 8+W); 8 pad columns each side keep every
            # second-minor offset 8-aligned for Mosaic
            pltpu.VMEM((th + 2, wd + 16, c), x.dtype),
            pltpu.VMEM((th + 2, wd + 16, c), x.dtype),
            pltpu.VMEM((th + 2, wd + 16, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(*operands)
    if o_pad != o:
        out = out[..., :o]
    return out, nx


def pack_weights(w: jax.Array, dtype) -> jax.Array:
    """[O, I, 3, kh, kw] torch layout -> [27, I, O] tap-major (kt, kh, kw)."""
    o, i = w.shape[:2]
    return w.astype(dtype).transpose(2, 3, 4, 1, 0).reshape(27, i, o)


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
    chunk; w: [O, C, 3, 3, 3] torch layout; residual: [T, H, W, O].

    Returns (out [T, H, W, O], new_cache [2, H, W, C]) where new_cache holds
    the last two (normalized) input frames — drop-in for the reference's
    ``feat_cache = full[:, -2:]`` (vae.py:30-33).
    """
    w27 = pack_weights(w, x.dtype)
    c = x.shape[-1]
    cache_in = cache
    # lane extents in Mosaic slices/DMAs must be <= 128 or 128-multiples:
    # pad C=192 stages to 256 (zero lanes: zero weights + zero norm terms)
    if c > 128 and c % 128:
        cp = -(-c // 128) * 128
        padw = [(0, 0)] * 3 + [(0, cp - c)]
        x = jnp.pad(x, padw)
        cache = jnp.pad(cache, padw)
        w27 = jnp.pad(w27, [(0, 0), (0, cp - c), (0, 0)])
        if gamma is not None:
            gamma = jnp.pad(gamma, [(0, cp - c)])
    out, nx = _fused_causal_conv_impl(x, cache, w27, b, gamma, residual,
                                      true_c=c, interpret=interpret)
    nx = nx[..., :c]
    if x.shape[0] == 1:
        # only nx[1] was computable from x; frame 0 of the new cache is the
        # old cache's frame 1
        nx = jnp.concatenate([cache_in[1:2], nx[1:2]], axis=0)
    return out, nx
