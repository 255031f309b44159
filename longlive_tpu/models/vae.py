"""Causal 3D-conv video VAE (Wan2.1), TPU-native functional re-design.

Re-implements the reference ``WanVAE_`` (wan/modules/vae.py:483-636) with
explicit, statically-shaped conv caches so the streaming decoder is a single
jitted program per chunk size:

- ``CausalConv3d`` (vae.py:17-36): temporal causality = prepend the cached
  last-2 input frames (zeros initially) instead of zero-padding; spatial
  padding is symmetric SAME.
- Temporal up/down sampling ``Resample`` caches (vae.py:101-160): the first
  latent frame bypasses the temporal conv entirely ('Rep' marker) — it maps
  to exactly 1 pixel frame; every later latent frame maps to 4
  (1 + 4*(T-1) pixel frames total, matching VAE stride (4,8,8),
  wan/configs/wan_t2v_1_3B.py:17).
- The reference decodes frame-by-frame in a Python loop threading mutable
  ``feat_cache`` lists (vae.py:545-569, 22 s/video on H100, reports.md:37).
  Here ``decode_step`` takes and returns an immutable cache pytree and jits
  end-to-end; chunked steady-state decode amortizes over T latent frames.

Geometry (dim=96, z=16, dim_mult [1,2,4,4], 2 res blocks,
temporal_downsample [False, True, True]) from vae.py:612-636.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nn
from ..ops import vae_conv as _vc

CACHE_T = 2

WAN_LATENT_MEAN = [
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
]
WAN_LATENT_STD = [
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temperal_downsample: Tuple[bool, ...] = (False, True, True)

    @property
    def temperal_upsample(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.temperal_downsample))


def tiny_vae_config() -> VAEConfig:
    return VAEConfig(dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                     temperal_downsample=(True,))


# ---------------------------------------------------------------------------
# primitive ops


def _conv_pads(kh, kw, spatial_pad):
    if spatial_pad == "same":
        return [(0, 0), ((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)]
    if spatial_pad == "none":
        return [(0, 0), (0, 0), (0, 0)]
    return spatial_pad


def conv3d(x, w, b=None, stride=(1, 1, 1), spatial_pad="same",
           out_dtype=None, out_cf=False):
    """x: [B,T,H,W,C] (channels-last — TPU-preferred feature-minor layout);
    w: [O,I,kt,kh,kw] (torch layout, transposed here; XLA folds the constant
    transpose).  Temporal padding is the caller's job (causal caches);
    spatial is symmetric SAME or explicit.

    ``out_dtype`` overrides the accumulator/output dtype — callers that sum
    several partial convs (the tap-split path) keep f32 partials so the
    result rounds ONCE like a single fused conv would.

    ``out_cf``: channels-FIRST output [B,O,T,H,W].  For narrow outputs
    (the 96->3 RGB head) a channels-last buffer lane-pads 3->128 (42x),
    which is ruinous for f32 tap partials; channels-first keeps W on the
    lane axis (dense)."""
    kt, kh, kw = w.shape[2:]
    pads = _conv_pads(kh, kw, spatial_pad)
    dt = out_dtype or x.dtype
    w_cl = w.astype(x.dtype).transpose(2, 3, 4, 1, 0)  # -> [kt,kh,kw,I,O]
    # default output in the input dtype: f32 conv output buffers cost an
    # extra materialization pass per conv (~4% of decode time) with no
    # accuracy benefit (the MXU accumulates bf16 inputs in f32 regardless)
    y = jax.lax.conv_general_dilated(
        x, w_cl, window_strides=stride, padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NCDHW" if out_cf else "NDHWC"),
        preferred_element_type=dt,
    )
    if b is not None:
        y = y + (b.astype(dt)[None, :, None, None, None] if out_cf
                 else b.astype(dt))
    return y


def conv3d_int8(x, w_int8, w_scale, b=None, stride=(1, 1, 1),
                spatial_pad="same"):
    """int8 conv for the wide (384-ch) decoder stages: dynamic per-tensor
    activation scale x static per-out-channel weight scale, s32 MXU
    accumulation.  Measured ~3x bf16 conv throughput at 384 channels on
    v5e; no gain below ~256 channels (lane packing), so quantize_vae_params
    gates on width.  w_int8: [kt,kh,kw,I,O] (pre-transposed at quant time)."""
    kt, kh, kw = w_int8.shape[:3]
    pads = _conv_pads(kh, kw, spatial_pad)
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) * (1.0 / 127.0)
    xq = jnp.round(xf * (1.0 / sx)).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, w_int8, window_strides=stride, padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * w_scale.astype(jnp.float32))
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_vae_params(params: dict, min_channels: int = 256) -> dict:
    """Quantizes conv weights with in/out channels >= min_channels to int8
    (the 384-wide middle/up0 decoder stages).  Mirrors ops.quant for the
    DiT: static per-out-channel weight scales; activations quantized
    dynamically inside conv3d_int8."""

    def walk(node):
        if isinstance(node, dict):
            if "w" in node and hasattr(node["w"], "ndim") and node["w"].ndim == 5:
                w = node["w"]
                o, i = int(w.shape[0]), int(w.shape[1])
                spatial = int(w.shape[2]) * int(w.shape[3]) * int(w.shape[4])
                # pointwise (1x1x1) convs are a tiny FLOP fraction and are
                # read raw by the attention block — keep them bf16
                if spatial > 1 and o >= min_channels and i >= min_channels:
                    wf = np.asarray(w, np.float32)
                    scale = np.maximum(np.abs(wf).max(axis=(1, 2, 3, 4)), 1e-8) / 127.0
                    wq = np.clip(np.round(wf / scale[:, None, None, None, None]),
                                 -127, 127).astype(np.int8)
                    new = {"w_int8": jnp.asarray(wq.transpose(2, 3, 4, 1, 0)),
                           "w_scale": jnp.asarray(scale, jnp.float32)}
                    if node.get("b") is not None:
                        new["b"] = node["b"]
                    return new
                return node
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def conv2d(x, w, b=None, stride=(1, 1), pad="same"):
    """x: [N,H,W,C]; w: [O,I,kh,kw] (torch layout)."""
    kh, kw = w.shape[2:]
    if pad == "same":
        pads = [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)]
    elif pad == "none":
        pads = [(0, 0), (0, 0)]
    else:
        pads = pad
    w_cl = w.astype(x.dtype).transpose(2, 3, 1, 0)  # -> [kh,kw,I,O]
    y = jax.lax.conv_general_dilated(
        x, w_cl, window_strides=stride, padding=pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def rms_norm_channel(x, gamma):
    """RMS_norm with channel_first, images=False (vae.py:39-54):
    F.normalize over channels * sqrt(C) * gamma.  x: [..., C] channels-last
    — the channel reduction is a cheap minor-axis reduction here."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True)) + 1e-12
    scale = math.sqrt(x.shape[-1])
    y = xf / norm * scale
    return (y * gamma.astype(jnp.float32)).astype(dtype)


class _CacheThread:
    """Static-structure functional analogue of the reference's mutable
    ``feat_cache``/``feat_idx`` threading (vae.py:202-220 etc.)."""

    def __init__(self, caches: Optional[List[Any]]):
        self.caches = list(caches) if caches is not None else None
        self.idx = 0
        self.out: List[Any] = []

    def pull(self):
        if self.caches is None:
            return None
        c = self.caches[self.idx]
        self.idx += 1
        return c

    def push(self, new):
        self.out.append(new)


def _apply_conv3d(x, p, stride=(1, 1, 1), spatial_pad="same"):
    if "w_int8" in p:
        return conv3d_int8(x, p["w_int8"], p["w_scale"], p.get("b"), stride,
                           spatial_pad)
    return conv3d(x, p["w"], p.get("b"), stride, spatial_pad)


def _fusable(x, p, thread: _CacheThread, stride) -> bool:
    """True when the fused Pallas causal-conv kernel (ops/vae_conv.py)
    covers this conv: cached streaming mode, B==1, bf16-path k=3x3x3
    stride-1 convs wide enough for the MXU (C,O >= 96)."""
    if thread.caches is None or "w" not in p or stride != (1, 1, 1):
        return False
    w = p["w"]
    if tuple(w.shape[2:]) not in ((3, 3, 3), (3, 1, 1)) or x.shape[0] != 1:
        return False
    if (tuple(w.shape[2:]) == (3, 1, 1)
            and os.environ.get("LONGLIVE_VAE_FUSED_TIMECONV", "1") == "0"):
        return False  # isolate the time-conv fusion for A/B measurement
    if x.shape[3] % 8 or x.shape[2] % 2:  # kernel tiling needs W%8, H%th
        return False
    # =0 disables (XLA concat path), =interpret runs the kernel
    # interpreted for CPU tests; default on (TPU decode: 253 -> 239
    # ms/latent-frame)
    mode = os.environ.get("LONGLIVE_VAE_FUSED", "1")
    if mode == "0":
        return False
    if mode == "interpret":  # tests: run the kernel anywhere, interpreted
        return True
    # narrow convs (decoder conv1 C=16, 3-channel heads) stay on XLA — the
    # MXU gains nothing below one lane tile and the concat they save is tiny
    if w.shape[0] < 96 or w.shape[1] < 96:
        return False
    # The full-res 96-channel stage pays a (128/96)^2 zero-lane MXU tax
    # that cancels the kernel's advantage over XLA (measured: 17.7 ms
    # fused vs ~11.5 ms XLA conv+concat+norm per stage3 conv) — keep it on
    # the XLA path.  Wider stages win: 192ch 9.6 vs ~11.5 ms, 384ch 0.41
    # vs ~0.7 ms, 384->768 time conv 5.4 vs ~9 ms.
    if w.shape[0] < 128 and os.environ.get("LONGLIVE_VAE_FUSED_96", "1") != "1":
        # full-res 96ch stage: the v1 kernel lost to XLA here (17.7 vs
        # ~11.5 ms/conv, lane-pad tax); the v3 single-GEMM K-packed form
        # WINS on the same stage (decode 222.4 -> 218.0 ms/latent-frame,
        # scripts/vae_probe.py fused_96 A/B) — fused is now the default,
        # LONGLIVE_VAE_FUSED_96=0 restores the XLA path
        return False
    return jax.default_backend() == "tpu"


def _fused_conv(x, p, thread: _CacheThread, gamma=None, residual=None):
    """Dispatch to ops.vae_conv.fused_causal_conv (B folded out)."""
    cache = thread.pull().astype(x.dtype)
    out, nx = _vc.fused_causal_conv(
        x[0], cache[0], p["w"], p.get("b"), gamma,
        None if residual is None else residual[0],
        interpret=os.environ.get("LONGLIVE_VAE_FUSED") == "interpret",
    )
    thread.push(nx[None])
    return out[None]


def norm_silu_causal_conv(x, gamma, p, thread: _CacheThread, residual=None):
    """silu(rms_norm_channel(x, gamma)) -> causal conv3d [-> + residual]:
    the res_block hot pattern (vae.py:186-220), fused into one Pallas kernel
    on the TPU streaming path."""
    if _fusable(x, p, thread, (1, 1, 1)):
        return _fused_conv(x, p, thread, gamma=gamma, residual=residual)
    if x.shape[-1] != gamma.shape[0]:
        x = x[..., : gamma.shape[0]]  # strip fused-path lane padding
    y = rms_norm_channel(x, gamma)
    y = nn.silu(y)
    y = causal_conv3d(y, p, thread)
    if residual is not None:
        y = y + residual
    return y


def causal_conv3d(x, p, thread: _CacheThread, stride=(1, 1, 1)):
    """CausalConv3d with explicit 2-frame input cache (vae.py:17-36).
    x: [B,T,H,W,C].  Uncached mode (thread.caches None) zero-pads."""
    kt = p["w"].shape[2] if "w" in p else p["w_int8"].shape[0]
    cache = thread.pull()
    if kt == 1:
        if thread.caches is not None:
            thread.push(cache)  # kernel t=1 has no temporal context
        return _apply_conv3d(x, p, stride)
    if thread.caches is None:
        xt = jnp.pad(x, [(0, 0), (kt - 1, 0), (0, 0), (0, 0), (0, 0)])
        return _apply_conv3d(xt, p, stride)
    cache = cache.astype(x.dtype)
    if (x.shape[1] == 1 and kt == 3 and stride == (1, 1, 1) and "w" in p
            and os.environ.get("LONGLIVE_VAE_TAPSPLIT", "1") == "1"):
        # Tap decomposition for the per-frame streaming path: the kt=3
        # conv over [c0, c1, x] is the sum of one spatial conv per
        # temporal tap, so the 3-frame concatenated buffer (a full
        # write+read of 3 frames per conv, ~31 ms/latent-frame across the
        # round-1 XLA decode) never materializes.  Partial sums stay f32
        # so the output rounds ONCE, like the fused conv (this XLA path
        # only serves the narrow non-kernel convs, where the f32 buffers
        # are cheap); equal to the concat form up to f32 summation order.
        w = p["w"]
        # narrow-output (RGB head) convs: channels-last f32 partials
        # lane-pad 3->128 (~818 MB/latent-frame each at full res); compute
        # them channels-first (dense) and transpose ONCE at the end
        cf = (w.shape[0] <= 8
              and os.environ.get("LONGLIVE_VAE_HEAD_CF", "1") == "1")
        y = conv3d(x, w[:, :, 2:3], p.get("b"), stride,
                   out_dtype=jnp.float32, out_cf=cf)
        y = y + conv3d(cache[:, 1:2], w[:, :, 1:2], None, stride,
                       out_dtype=jnp.float32, out_cf=cf)
        y = y + conv3d(cache[:, 0:1], w[:, :, 0:1], None, stride,
                       out_dtype=jnp.float32, out_cf=cf)
        y = y.astype(x.dtype)
        if cf:
            y = y.transpose(0, 2, 3, 4, 1)  # [B,O,T,H,W] -> [B,T,H,W,O]
        thread.push(jnp.concatenate([cache[:, 1:], x], axis=1))
        return y
    full = jnp.concatenate([cache, x], axis=1)
    thread.push(full[:, -CACHE_T:])
    return _apply_conv3d(full, p, stride)


# ---------------------------------------------------------------------------
# blocks


def _pair_fusable(x, p, thread: _CacheThread) -> bool:
    """True when the whole-res_block pair kernel (ops/vae_conv.fused_res_block)
    covers this block: LONGLIVE_VAE_PAIR=1, no shortcut (C == O), both convs
    individually fusable, bf16 path."""
    if os.environ.get("LONGLIVE_VAE_PAIR", "0") != "1":
        return False
    if os.environ.get("LONGLIVE_VAE_INT8", "0") == "1":
        return False  # pair kernel is bf16-only; don't mix with int8 convs
    if p.get("shortcut") is not None:
        return False
    if p["conv1"].get("b") is None or p["conv2"].get("b") is None:
        return False  # kernel assumes bias epilogues (all Wan VAE convs)
    if not (_fusable(x, p["conv1"], thread, (1, 1, 1))
            and _fusable(x, p["conv2"], thread, (1, 1, 1))):
        return False
    w1, w2 = p["conv1"]["w"], p["conv2"]["w"]
    if tuple(w1.shape[2:]) != (3, 3, 3) or tuple(w2.shape[2:]) != (3, 3, 3):
        return False
    return w1.shape[0] == w2.shape[1] and w2.shape[0] == w1.shape[1]


def res_block(x, p, thread: _CacheThread):
    """ResidualBlock (vae.py:186-220)."""
    h = x
    if p.get("shortcut") is not None:
        sc_thread = _CacheThread(None)
        h = causal_conv3d(x, p["shortcut"], sc_thread)  # 1x1x1, no cache use
    elif _pair_fusable(x, p, thread):
        c1 = thread.pull().astype(x.dtype)
        c2 = thread.pull().astype(x.dtype)
        pair = _vc.fused_res_block(
            x[0], c1[0], c2[0],
            p["conv1"]["w"], p["conv1"].get("b"), p["norm1"],
            p["conv2"]["w"], p["conv2"].get("b"), p["norm2"],
            interpret=os.environ.get("LONGLIVE_VAE_FUSED") == "interpret",
        )
        if pair is not None:
            out, n1, n2 = pair
            thread.push(n1[None])
            thread.push(n2[None])
            return out[None]
        # geometry didn't fit the pair budget: fall back to the 2-call chain
        thread.idx -= 2
    y = norm_silu_causal_conv(x, p["norm1"], p["conv1"], thread)
    return norm_silu_causal_conv(y, p["norm2"], p["conv2"], thread, residual=h)


def attention_block(x, p):
    """Single-head per-frame spatial attention (vae.py:223-262).
    x: [B,T,H,W,C]; the 1x1 qkv/proj convs are plain matmuls here."""
    b, t, h, w, c = x.shape
    identity = x
    y = rms_norm_channel(x, p["norm"])
    y = y.reshape(b * t, h * w, c)
    wq = p["qkv"]["w"].reshape(3 * c, c).T  # [C, 3C]
    qkv = (jnp.einsum("bsc,cd->bsd", y, wq.astype(y.dtype),
                      preferred_element_type=jnp.float32)
           + p["qkv"]["b"].astype(jnp.float32)).astype(y.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits / math.sqrt(c), axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v)
    wp = p["proj"]["w"].reshape(c, c).T
    o = (jnp.einsum("bsc,cd->bsd", o, wp.astype(o.dtype),
                    preferred_element_type=jnp.float32)
         + p["proj"]["b"].astype(jnp.float32)).astype(o.dtype)
    return o.reshape(b, t, h, w, c) + identity


def _spatial(fn, x):
    # channels-last: folding T into batch is a pure reshape (no transpose)
    b, t, h, w, c = x.shape
    y = fn(x.reshape(b * t, h, w, c))
    h2, w2, c2 = y.shape[1:]
    return y.reshape(b, t, h2, w2, c2)


def upsample2d_nearest(x2d):
    # [N,H,W,C]: nearest 2x on H and W
    return jnp.repeat(jnp.repeat(x2d, 2, axis=1), 2, axis=2)


def upsample_conv2d_subpixel(x, w, b=None):
    """EXACT reformulation of ``conv2d(upsample2d_nearest(x), w, b)`` for the
    decoder's 3x3 'same' resample convs (reference wan/modules/vae.py:76-86:
    Upsample(2x nearest) -> Conv2d(k=3, p=1)).

    Nearest-2x duplication makes adjacent conv taps read the SAME source
    pixel, so each of the 4 output phases (dy, dx) collapses to a 2x2 conv
    over the LOW-RES input with axis-summed weights
    ``W_eff[dy,dx] = A[dy] @ W @ A[dx]^T`` where ``A[0] = [[1,0,0],[0,1,1]]``
    (source rows y-1, y) and ``A[1] = [[1,1,0],[0,0,1]]`` (rows y, y+1).
    4 * 2x2 low-res convs = 44% of the upsampled 3x3 conv's MACs, the input
    streams at 1/4 the pixels, and the [2H, 2W, C] nearest-upsampled
    intermediate never exists; a depth-to-space interleave emits the output.
    x: [N,H,W,C]; w: [O,I,3,3] (torch layout)."""
    o_ch = w.shape[0]
    assert w.shape[2:] == (3, 3), w.shape
    wf = w.astype(jnp.float32)
    a = (jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]], jnp.float32),
         jnp.asarray([[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32))
    n, h, wd, _ = x.shape
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    rows = []
    for dy in (0, 1):
        cols = []
        for dx in (0, 1):
            w_eff = jnp.einsum("ra,oiab,cb->oirc", a[dy], wf, a[dx])
            cols.append(conv2d(xp[:, dy : dy + h + 1, dx : dx + wd + 1],
                               w_eff, None, pad="none"))
        rows.append(jnp.stack(cols, axis=0))
    y = jnp.stack(rows, axis=0)  # [dy, dx, N, H, W, O]
    y = y.transpose(2, 3, 0, 4, 1, 5).reshape(n, 2 * h, 2 * wd, o_ch)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def resample_up(x, p, thread: _CacheThread, temporal: bool, first_frame: bool):
    """Resample upsample2d/3d (vae.py:76-86, 101-141).  In streaming mode the
    first latent frame skips the temporal conv ('Rep' marker)."""
    if temporal and "time_conv" in p:
        tc = p["time_conv"]
        ci = tc["w"].shape[1] if "w" in tc else tc["w_int8"].shape[3]
    else:
        ci = p["conv"]["w"].shape[1]
    if x.shape[-1] != ci:
        x = x[..., :ci]  # strip fused-path lane padding at stage boundary
    if temporal:
        if thread.caches is not None:
            cache = thread.pull()
            if first_frame:
                # 'Rep': pass through untouched; prime cache with zeros so the
                # next chunk's window is [0, 0, x] like the reference
                # (vae.py:120-127 zero-fills the short cache).
                thread.push(jnp.zeros_like(cache))
            elif _fusable(x, p["time_conv"], thread, (1, 1, 1)):
                # re-insert the pulled cache: _fused_conv pulls it itself
                thread.idx -= 1
                y = _fused_conv(x, p["time_conv"], thread)
                b, t, h, w, c2 = y.shape
                c = c2 // 2
                y = y.reshape(b, t, h, w, 2, c).transpose(0, 1, 4, 2, 3, 5)
                x = y.reshape(b, t * 2, h, w, c)
            else:
                full = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
                thread.push(full[:, -CACHE_T:])
                y = _apply_conv3d(full, p["time_conv"], (1, 1, 1))
                b, t, h, w, c2 = y.shape
                c = c2 // 2
                # interleave the two channel halves in time (vae.py:134-137):
                # channel axis splits [2, c] major-minor (torch O-order)
                y = y.reshape(b, t, h, w, 2, c).transpose(0, 1, 4, 2, 3, 5)
                x = y.reshape(b, t * 2, h, w, c)
        else:
            xt = jnp.pad(x, [(0, 0), (2, 0), (0, 0), (0, 0), (0, 0)])
            y = _apply_conv3d(xt, p["time_conv"], (1, 1, 1))
            b, t, h, w, c2 = y.shape
            c = c2 // 2
            y = y.reshape(b, t, h, w, 2, c).transpose(0, 1, 4, 2, 3, 5)
            x = y.reshape(b, t * 2, h, w, c)
    if os.environ.get("LONGLIVE_VAE_SUBPIXEL", "1") == "1":
        return _spatial(
            lambda z: upsample_conv2d_subpixel(z, p["conv"]["w"], p["conv"]["b"]), x
        )
    return _spatial(
        lambda z: conv2d(upsample2d_nearest(z), p["conv"]["w"], p["conv"]["b"]), x
    )


def resample_down(x, p, thread: _CacheThread, temporal: bool, first_chunk: bool):
    """Resample downsample2d/3d (vae.py:87-96, 143-159)."""
    ci = p["conv"]["w"].shape[1]
    if x.shape[-1] != ci:
        x = x[..., :ci]  # strip fused-path lane padding at stage boundary
    x = _spatial(
        lambda z: conv2d(
            jnp.pad(z, [(0, 0), (0, 1), (0, 1), (0, 0)]),
            p["conv"]["w"], p["conv"]["b"], stride=(2, 2), pad="none",
        ),
        x,
    )
    if temporal:
        if thread.caches is not None:
            cache = thread.pull()
            if first_chunk:
                thread.push(x[:, -1:])  # cache the chunk's last frame
            else:
                full = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
                thread.push(x[:, -1:])
                x = _apply_conv3d(full, p["time_conv"],
                                  stride=(2, 1, 1), spatial_pad="none")
        else:
            x = _apply_conv3d(x, p["time_conv"],
                              stride=(2, 1, 1), spatial_pad="none")
    return x


# ---------------------------------------------------------------------------
# decoder / encoder


def decoder_apply(params, cfg: VAEConfig, z, caches, first_frame: bool):
    """Decoder3d forward over a chunk of latent frames (vae.py:369-472).
    z: [B, T, h, w, z_dim] channels-last.  Returns ([B,T_out,H,W,3], caches')."""
    thread = _CacheThread(caches)
    x = causal_conv3d(z, params["conv1"], thread)
    x = res_block(x, params["middle"][0], thread)
    x = attention_block(x, params["middle"][1])
    x = res_block(x, params["middle"][2], thread)
    ups = cfg.temperal_upsample
    bi = 0
    for i in range(len(cfg.dim_mult)):
        for _ in range(cfg.num_res_blocks + 1):
            x = res_block(x, params["upsamples"][bi], thread)
            bi += 1
        if i != len(cfg.dim_mult) - 1:
            x = resample_up(x, params["upsamples"][bi], thread, ups[i], first_frame)
            bi += 1
    x = norm_silu_causal_conv(x, params["head_norm"], params["head_conv"], thread)
    return x, (thread.out if caches is not None else None)


def encoder_apply(params, cfg: VAEConfig, x, caches, first_chunk: bool):
    """Encoder3d forward over a chunk of pixel frames (vae.py:265-366).
    x: [B, T, H, W, 3] channels-last."""
    thread = _CacheThread(caches)
    y = causal_conv3d(x, params["conv1"], thread)
    downs = cfg.temperal_downsample
    bi = 0
    for i in range(len(cfg.dim_mult)):
        for _ in range(cfg.num_res_blocks):
            y = res_block(y, params["downsamples"][bi], thread)
            bi += 1
        if i != len(cfg.dim_mult) - 1:
            y = resample_down(y, params["downsamples"][bi], thread, downs[i], first_chunk)
            bi += 1
    y = res_block(y, params["middle"][0], thread)
    y = attention_block(y, params["middle"][1])
    y = res_block(y, params["middle"][2], thread)
    y = norm_silu_causal_conv(y, params["head_norm"], params["head_conv"], thread)
    return y, (thread.out if caches is not None else None)


# ---------------------------------------------------------------------------
# cache initialization (shapes mirror the conv traversal order above)


def init_decoder_caches(params, cfg: VAEConfig, batch, height, width, dtype=jnp.float32):
    """Zero caches for streaming decode.  height/width are LATENT dims."""
    shapes = decoder_cache_shapes(cfg, batch, height, width)
    return [jnp.zeros(s, dtype) for s in shapes]


def decoder_cache_shapes(cfg: VAEConfig, b, h, w) -> List[Tuple[int, ...]]:
    dims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    shapes: List[Tuple[int, ...]] = []

    def conv_cache(c, hh, ww, t=CACHE_T):
        shapes.append((b, t, hh, ww, c))

    def res_caches(c_in, c_out, hh, ww):
        conv_cache(c_in, hh, ww)   # res conv1 input
        conv_cache(c_out, hh, ww)  # res conv2 input

    conv_cache(cfg.z_dim, h, w)  # decoder conv1
    res_caches(dims[0], dims[0], h, w)  # middle res0
    res_caches(dims[0], dims[0], h, w)  # middle res1
    ups = cfg.temperal_upsample
    hh, ww = h, w
    in_dim = dims[0]
    for i in range(len(cfg.dim_mult)):
        out_dim = dims[i + 1]
        if i >= 1:
            in_dim = in_dim // 2
        for _ in range(cfg.num_res_blocks + 1):
            res_caches(in_dim, out_dim, hh, ww)
            in_dim = out_dim
        if i != len(cfg.dim_mult) - 1:
            if ups[i]:
                conv_cache(out_dim, hh, ww)  # up3d time_conv (pre-upsample res)
            hh, ww = hh * 2, ww * 2
    conv_cache(dims[-1], hh, ww)  # head conv
    return shapes


def init_encoder_caches(params, cfg: VAEConfig, batch, height, width, dtype=jnp.float32):
    shapes = encoder_cache_shapes(cfg, batch, height, width)
    return [jnp.zeros(s, dtype) for s in shapes]


def encoder_cache_shapes(cfg: VAEConfig, b, h, w) -> List[Tuple[int, ...]]:
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    shapes: List[Tuple[int, ...]] = []

    def conv_cache(c, hh, ww, t=CACHE_T):
        shapes.append((b, t, hh, ww, c))

    def res_caches(c_in, c_out, hh, ww):
        conv_cache(c_in, hh, ww)
        conv_cache(c_out, hh, ww)

    conv_cache(3, h, w)  # encoder conv1
    hh, ww = h, w
    downs = cfg.temperal_downsample
    for i in range(len(cfg.dim_mult)):
        c_in, c_out = dims[i], dims[i + 1]
        for _ in range(cfg.num_res_blocks):
            res_caches(c_in, c_out, hh, ww)
            c_in = c_out
        if i != len(cfg.dim_mult) - 1:
            # asymmetric ZeroPad2d((0,1,0,1)) + k3 s2 conv (vae.py:87-96)
            hh, ww = (hh - 2) // 2 + 1, (ww - 2) // 2 + 1
            if downs[i]:
                conv_cache(c_out, hh, ww, t=1)  # down3d time cache: 1 frame
    res_caches(dims[-1], dims[-1], hh, ww)  # middle res0
    res_caches(dims[-1], dims[-1], hh, ww)  # middle res1
    conv_cache(dims[-1], hh, ww)  # head conv
    return shapes


# ---------------------------------------------------------------------------
# parameter init


def _conv3d_init(rng, c_in, c_out, k, dtype):
    kt, kh, kw = (k, k, k) if isinstance(k, int) else k
    fan_in = c_in * kt * kh * kw
    std = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(rng)
    return {
        "w": jax.random.uniform(k1, (c_out, c_in, kt, kh, kw), dtype, -std, std),
        "b": jax.random.uniform(k2, (c_out,), dtype, -std, std),
    }


def _conv2d_init(rng, c_in, c_out, k, dtype):
    fan_in = c_in * k * k
    std = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(rng)
    return {
        "w": jax.random.uniform(k1, (c_out, c_in, k, k), dtype, -std, std),
        "b": jax.random.uniform(k2, (c_out,), dtype, -std, std),
    }


def _res_block_init(rng, c_in, c_out, dtype):
    ks = jax.random.split(rng, 3)
    return {
        "norm1": jnp.ones((c_in,), dtype),
        "conv1": _conv3d_init(ks[0], c_in, c_out, 3, dtype),
        "norm2": jnp.ones((c_out,), dtype),
        "conv2": _conv3d_init(ks[1], c_out, c_out, 3, dtype),
        "shortcut": _conv3d_init(ks[2], c_in, c_out, 1, dtype) if c_in != c_out else None,
    }


def _attn_block_init(rng, c, dtype):
    ks = jax.random.split(rng, 2)
    p = {
        "norm": jnp.ones((c,), dtype),
        "qkv": _conv2d_init(ks[0], c, 3 * c, 1, dtype),
        "proj": _conv2d_init(ks[1], c, c, 1, dtype),
    }
    p["proj"]["w"] = jnp.zeros_like(p["proj"]["w"])  # vae.py:238
    return p


def init_vae_params(rng, cfg: VAEConfig = VAEConfig(), dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 256))
    z2 = cfg.z_dim * 2

    # decoder
    dims_d = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    ups: List[dict] = []
    for i in range(len(cfg.dim_mult)):
        # reference halves in_dim for stages >= 1 because the preceding
        # Resample conv halves channels (vae.py:401-404)
        in_dim = dims_d[i] // 2 if i >= 1 else dims_d[i]
        out_dim = dims_d[i + 1]
        for _ in range(cfg.num_res_blocks + 1):
            ups.append(_res_block_init(next(keys), in_dim, out_dim, dtype))
            in_dim = out_dim
        if i != len(cfg.dim_mult) - 1:
            p = {"conv": _conv2d_init(next(keys), out_dim, out_dim // 2, 3, dtype)}
            if cfg.temperal_upsample[i]:
                p["time_conv"] = _conv3d_init(next(keys), out_dim, out_dim * 2, (3, 1, 1), dtype)
            ups.append(p)
    decoder = {
        "conv1": _conv3d_init(next(keys), cfg.z_dim, dims_d[0], 3, dtype),
        "middle": [
            _res_block_init(next(keys), dims_d[0], dims_d[0], dtype),
            _attn_block_init(next(keys), dims_d[0], dtype),
            _res_block_init(next(keys), dims_d[0], dims_d[0], dtype),
        ],
        "upsamples": ups,
        "head_norm": jnp.ones((dims_d[-1],), dtype),
        "head_conv": _conv3d_init(next(keys), dims_d[-1], 3, 3, dtype),
    }

    # encoder
    dims_e = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    downs: List[dict] = []
    for i in range(len(cfg.dim_mult)):
        c_in, c_out = dims_e[i], dims_e[i + 1]
        for _ in range(cfg.num_res_blocks):
            downs.append(_res_block_init(next(keys), c_in, c_out, dtype))
            c_in = c_out
        if i != len(cfg.dim_mult) - 1:
            p = {"conv": _conv2d_init(next(keys), c_out, c_out, 3, dtype)}
            if cfg.temperal_downsample[i]:
                p["time_conv"] = _conv3d_init(next(keys), c_out, c_out, (3, 1, 1), dtype)
            downs.append(p)
    encoder = {
        "conv1": _conv3d_init(next(keys), 3, dims_e[0], 3, dtype),
        "downsamples": downs,
        "middle": [
            _res_block_init(next(keys), dims_e[-1], dims_e[-1], dtype),
            _attn_block_init(next(keys), dims_e[-1], dtype),
            _res_block_init(next(keys), dims_e[-1], dims_e[-1], dtype),
        ],
        "head_norm": jnp.ones((dims_e[-1],), dtype),
        "head_conv": _conv3d_init(next(keys), dims_e[-1], z2, 3, dtype),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "conv1": _conv3d_init(next(keys), z2, z2, 1, dtype),  # enc out 1x1
        "conv2": _conv3d_init(next(keys), cfg.z_dim, cfg.z_dim, 1, dtype),  # dec in 1x1
        "mean": jnp.asarray(WAN_LATENT_MEAN[: cfg.z_dim], jnp.float32),
        "std": jnp.asarray(WAN_LATENT_STD[: cfg.z_dim], jnp.float32),
    }


# ---------------------------------------------------------------------------
# top-level encode/decode (reference WanVAE_.encode/decode, vae.py:517-593)


def vae_decode_chunk(params, cfg: VAEConfig, z_chunk, caches, first: bool):
    """One streaming decode step.  z_chunk: [B, T, z, h, w] NORMALIZED latents
    (wrapper layout).  Returns (pixels [B, T_out, 3, H, W] in [-1,1], caches').
    Internals run channels-last ([B,T,H,W,C]); only the API boundary
    transposes.
    """
    z = z_chunk.transpose(0, 1, 3, 4, 2)  # -> [B, T, h, w, z]
    std = params["std"].astype(jnp.float32)
    mean = params["mean"].astype(jnp.float32)
    z = (z.astype(jnp.float32) * std + mean).astype(z_chunk.dtype)
    thread = _CacheThread(None)
    x = causal_conv3d(z, params["conv2"], thread)  # 1x1x1
    out, caches = decoder_apply(params["decoder"], cfg, x, caches, first)
    out = jnp.clip(out.astype(jnp.float32), -1.0, 1.0)
    return out.transpose(0, 1, 4, 2, 3), caches


def vae_decode(params, cfg: VAEConfig, latents, chunk: int = 1):
    """Full-video decode: frame 0 alone, then ``chunk`` frames at a time.
    latents: [B, T, z, h, w] -> pixels [B, 1+4*(T-1), 3, H, W]."""
    b, t, zc, h, w = latents.shape
    caches = init_decoder_caches(params, cfg, b, h, w, latents.dtype)
    outs = []
    x0, caches = vae_decode_chunk(params, cfg, latents[:, :1], caches, True)
    outs.append(x0)
    i = 1
    while i < t:
        n = min(chunk, t - i)
        xi, caches = vae_decode_chunk(params, cfg, latents[:, i : i + n], caches, False)
        outs.append(xi)
        i += n
    return jnp.concatenate(outs, axis=1)


def vae_decode_scan(params, cfg: VAEConfig, latents, caches=None, first: bool = True):
    """Whole-segment streaming decode as ONE program: frame 0 via the
    first-frame path, remaining frames under ``lax.scan`` with the conv-cache
    pytree as carry.  Returns (pixels [B, 1+4*(T-1), 3, H, W], caches')."""
    b, t, zc, h, w = latents.shape
    if caches is None:
        caches = init_decoder_caches(params, cfg, b, h, w, latents.dtype)
    outs = []
    rest = latents
    if first:
        px0, caches = vae_decode_chunk(params, cfg, latents[:, :1], caches, True)
        outs.append(px0)
        rest = latents[:, 1:]
    if rest.shape[1] > 0:
        def body(carry, z):
            px, carry = vae_decode_chunk(params, cfg, z[:, None], carry, False)
            return carry, px

        caches, ys = jax.lax.scan(body, caches, rest.transpose(1, 0, 2, 3, 4))
        # ys: [T', B, S, 3, H, W] -> [B, T'*S, 3, H, W]
        tprime, bb, s = ys.shape[:3]
        outs.append(ys.transpose(1, 0, 2, 3, 4, 5).reshape(bb, tprime * s, *ys.shape[3:]))
    return jnp.concatenate(outs, axis=1), caches


def vae_encode(params, cfg: VAEConfig, pixels):
    """Encode pixels [B, T, 3, H, W] (T = 1 + 4k) -> normalized latents
    [B, 1+(T-1)/4, z, h, w] (reference encode chunks time 1+4+4+...,
    vae.py:517-543)."""
    b, t, c, H, W = pixels.shape
    x = pixels
    caches = init_encoder_caches(params, cfg, b, H, W, pixels.dtype)
    outs = []
    stride_t = 2 ** sum(cfg.temperal_downsample)
    chunks = [(0, 1)] + [(1 + stride_t * i, 1 + stride_t * (i + 1))
                         for i in range((t - 1) // stride_t)]
    for ci, (s, e) in enumerate(chunks):
        xc = x[:, s:e].transpose(0, 1, 3, 4, 2)  # [B, T, H, W, 3]
        y, caches = encoder_apply(params["encoder"], cfg, xc, caches, ci == 0)
        outs.append(y)
    y = jnp.concatenate(outs, axis=1)  # [B, T', h, w, 2z]
    thread = _CacheThread(None)
    y = causal_conv3d(y, params["conv1"], thread)  # 1x1x1
    mu = y[..., : cfg.z_dim]
    mean = params["mean"].astype(jnp.float32)
    std = params["std"].astype(jnp.float32)
    mu = (mu.astype(jnp.float32) - mean) / std
    return mu.astype(pixels.dtype).transpose(0, 1, 4, 2, 3)
