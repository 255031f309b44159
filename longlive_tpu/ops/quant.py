"""Int8 quantized matmul path for the DiT.

The reference README claims a 24.8 FPS FP8/INT8 mode but ships no
quantization code (reports.md:24; SURVEY.md §2.5) — this is the TPU-native
realization: dynamic per-token activation quantization x per-channel weight
quantization feeding the MXU's int8 path (2x bf16 throughput on v5e/v6e),
with f32 rescale fused into the epilogue by XLA.

  y = (q(x) @ q(W)) * s_x * s_W + b
  q(x): int8, per-row scale s_x = max|x_row| / 127 (dynamic)
  q(W): int8, per-column scale s_W = max|W_col| / 127 (static, at load)

Quantization is applied to the transformer-block linears (self/cross attn
q,k,v,o and ffn) which carry ~40% of the DiT FLOPs; embeddings, head, norms,
modulation, and attention itself stay bf16.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def quantize_weight(kernel: jax.Array) -> Dict[str, jax.Array]:
    """kernel: [..., in, out] -> int8 weights + per-out-channel scales."""
    kf = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(kf), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    w = jnp.clip(jnp.round(kf / scale), -127, 127).astype(jnp.int8)
    return {"w_int8": w, "w_scale": scale.squeeze(-2)}


def quantize_activations(x: jax.Array):
    """x: [..., in] -> (int8 x, per-row scale [..., 1])."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def linear_int8(x: jax.Array, p: dict) -> jax.Array:
    """Quantized linear: p holds {w_int8 [..,in,out], w_scale [..,out],
    bias?}.  int8 x int8 -> int32 on the MXU, rescaled in f32."""
    xq, sx = quantize_activations(x)
    acc = jax.lax.dot_general(
        xq, p["w_int8"],
        dimension_numbers=(((x.ndim - 1,), (p["w_int8"].ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * p["w_scale"].astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


_QUANT_KEYS = ("self_attn", "cross_attn", "ffn")


def quantize_dit_params(params: dict) -> dict:
    """Converts the stacked block linears of a DiT param pytree to int8.
    Leaves everything else untouched.  The result is consumed by
    models.nn.linear, which dispatches on the presence of 'w_int8'."""
    out = dict(params)
    blocks = dict(params["blocks"])
    for key in _QUANT_KEYS:
        grp = dict(blocks[key])
        for name, p in list(grp.items()):
            if isinstance(p, dict) and "kernel" in p:
                q = quantize_weight(p["kernel"])
                if "bias" in p:
                    q["bias"] = p["bias"]
                grp[name] = q
        blocks[key] = grp
    out["blocks"] = blocks
    return out


def _cat_lin(parts, axis=-1):
    out = {}
    keys = parts[0].keys()
    for key in keys:
        out[key] = jnp.concatenate([p[key] for p in parts], axis=axis)
    return out


def fuse_qkv_params(params: dict) -> dict:
    """SERVING transform: concatenates the self-attention q/k/v linears into
    one ``qkv`` linear ([.., in, 3*out]) so the decode path reads the normed
    activations once (instead of 3x) and — on the int8 path — runs ONE
    dynamic activation-quantize pass instead of three identical ones.
    Exact: a column-concatenated matmul computes the same columns (int8
    per-column weight scales are column-local).  Apply AFTER
    canonicalize_rope_layout / LoRA folding and only for single-device
    serving (the SP decode path and training read q/k/v separately).
    Works on bf16 ('kernel') and quantized ('w_int8') params."""
    blocks = dict(params["blocks"])
    sa = dict(blocks["self_attn"])
    if "qkv" in sa or "q" not in sa:
        return params
    sa["qkv"] = _cat_lin([sa.pop("q"), sa.pop("k"), sa.pop("v")])
    blocks = dict(blocks)
    blocks["self_attn"] = sa
    out = dict(params)
    out["blocks"] = blocks
    return out


# -- fused dynamic-quant int8 matmul (Pallas) -------------------------------
#
# linear_int8 above quantizes activations in a separate XLA pass: the bf16
# activation makes one extra HBM round trip (read for amax/quantize, int8
# write, int8 re-read by the matmul) — measured ~10 ms/forward across the
# block linears (PERF.md "where the time goes").  This kernel folds the
# per-row quantize into the matmul itself: the bf16 activation tile is
# read ONCE into VMEM, quantized in-register when the N sweep first
# touches it, and the int8 MXU consumes the VMEM-resident copy for every
# N tile.  Epilogue applies s_x * s_W + bias in f32.  Same scale
# definition as linear_int8; the multiply-by-reciprocal rounding can
# differ by 1 int8 LSB (measured ~2e-4 mean relative output delta).

import functools as _ft
import os as _os

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_q_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, xq_ref, xs_ref, *,
                 has_bias: bool, out_dtype):
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _quantize():  # once per M tile, VPU work amortized over the N sweep
        xf = x_ref[...].astype(jnp.float32)  # [bm, K]
        amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
        r = 127.0 / amax  # [bm, 1]
        xq_ref[...] = jnp.clip(jnp.round(xf * r), -127, 127).astype(jnp.int8)
        # [bm, 128] lane-replicated ((bm, 1) layouts relayout on every op)
        xs_ref[...] = jnp.broadcast_to(amax * (1.0 / 127.0),
                                       xs_ref.shape)

    acc = jax.lax.dot_general(
        xq_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [bm, bn]
    bn = acc.shape[1]
    xs = xs_ref[...]
    if bn != xs.shape[1]:
        xs = (pltpu.repeat(xs, bn // xs.shape[1], axis=1) if bn > xs.shape[1]
              else xs[:, :bn])
    y = acc.astype(jnp.float32) * xs * ws_ref[...]
    if has_bias:
        y = y + b_ref[...]
    o_ref[...] = y.astype(out_dtype)


def _pick_tile(n: int, cap: int) -> int:
    """Largest 128-multiple divisor of ``n`` that is <= cap (n is assumed a
    128-multiple or gets one pad tile)."""
    best = 128
    for t in range(128, cap + 1, 128):
        if n % t == 0:
            best = t
    return best


@_ft.partial(jax.jit, static_argnames=("has_bias", "bm", "bn", "interpret"))
def _mm_q_call(x2, w, ws, b, has_bias: bool, bm: int, bn: int,
               interpret: bool = False):
    m, k = x2.shape
    n = w.shape[1]
    mp = -(-m // bm) * bm
    np_ = -(-n // bn) * bn
    if mp != m:
        x2 = jnp.pad(x2, [(0, mp - m), (0, 0)])
    wp = jnp.pad(w, [(0, 0), (0, np_ - n)]) if np_ != n else w
    wsp = jnp.pad(ws.reshape(1, n).astype(jnp.float32),
                  [(0, 0), (0, np_ - n)], constant_values=1.0)
    bp = (jnp.pad(b.reshape(1, n).astype(jnp.float32), [(0, 0), (0, np_ - n)])
          if has_bias else jnp.zeros((1, np_), jnp.float32))
    grid = (mp // bm, np_ // bn)
    out = pl.pallas_call(
        _ft.partial(_mm_q_kernel, has_bias=has_bias, out_dtype=x2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda im, jn: (im, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda im, jn: (0, jn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda im, jn: (0, jn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda im, jn: (0, jn),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda im, jn: (im, jn),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),
            pltpu.VMEM((bm, 128), jnp.float32),
        ],
        interpret=interpret,
    )(x2, wp, wsp, bp)
    return out[:m, :n]


def linear_int8_fused(x: jax.Array, p: dict) -> jax.Array:
    """Drop-in for linear_int8 with the quantize pass fused into the matmul
    kernel.  Falls back to linear_int8 off-TPU or at unsupported shapes
    (K-tiling is not implemented: K must fit one VMEM-resident M tile, so
    the ffn.fc2 K=8960 contraction stays on the XLA path)."""
    w = p["w_int8"]
    k, n = w.shape[-2], w.shape[-1]
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    interpret = _os.environ.get("LONGLIVE_INT8_FUSED") == "interpret"
    if (jax.default_backend() != "tpu" and not interpret) or w.ndim != 2 \
            or k > 4096 or k % 128 or m < 256:
        return linear_int8(x, p)
    # M tile: largest 8-multiple divisor of m within VMEM budget, else 512
    env_bm = _os.environ.get("LONGLIVE_INT8_BM")
    # largest 8-multiple divisor of m among the measured-safe candidates
    # (an explicit LONGLIVE_INT8_BM wins unconditionally)
    bm = 512
    candidates = (int(env_bm),) if env_bm else (520, 512, 584, 312, 468)
    divisors = [t for t in candidates if m % t == 0 and t % 8 == 0]
    if divisors:
        bm = divisors[0] if env_bm else max(divisors)
    bn = _pick_tile(n if n % 128 == 0 else -(-n // 128) * 128, 512)
    x2 = x.reshape(m, k)
    has_bias = "bias" in p
    out = _mm_q_call(x2, w, p["w_scale"], p.get("bias"), has_bias, bm, bn,
                     interpret=interpret)
    return out.reshape(*lead, n).astype(x.dtype)
