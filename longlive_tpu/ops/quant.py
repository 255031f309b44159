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
