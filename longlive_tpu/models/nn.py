"""Minimal functional NN primitives shared by the models.

Dtype policy mirrors the reference: matmuls run in the parameter dtype
(bf16 at inference), normalizations compute in float32 and cast back
(WanRMSNorm: wan/modules/model.py:70-86; WanLayerNorm: model.py:89-99).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def linear(x: jax.Array, p: dict) -> jax.Array:
    """x @ kernel + bias.  kernel: [in, out]; bias optional.
    Accumulates in f32 on the MXU (like torch bf16 linears), output in the
    input dtype.  Dispatches to the int8 path when the params were quantized
    (ops.quant.quantize_dit_params)."""
    if "w_int8" in p:
        import os

        from ..ops.quant import linear_int8, linear_int8_fused

        # LONGLIVE_INT8_FUSED=1: the activation-quantize pass runs inside
        # the matmul kernel (one bf16 read instead of a quantize round
        # trip); same scales/rounding as linear_int8
        if os.environ.get("LONGLIVE_INT8_FUSED", "0") != "0":
            return linear_int8_fused(x, p)
        return linear_int8(x, p)
    kernel = p["kernel"]
    if "lora_a" in p:
        # LoRA applied per layer INSIDE the scanned layer body (the PEFT
        # model: reference wraps each nn.Linear, utils/lora_utils.py:19-103;
        # trainer/distillation.py:1398-1456).  The delta materializes one
        # LAYER at a time (~90 MB transient), never a full merged model —
        # materializing merged generator+critic copies alongside their
        # bases and the teacher is 5x1.3B of weights, which cannot fit a
        # 16 GB chip.  delta-form (A@B then one GEMM) beats (x@A)@B at
        # decode/training token counts (S > d_in).
        delta = jnp.dot(p["lora_a"].astype(jnp.float32),
                        p["lora_b"].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        kernel = (kernel.astype(jnp.float32)
                  + p["lora_s"] * delta).astype(kernel.dtype)
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(
    x: jax.Array,
    eps: float = 1e-6,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """LayerNorm in f32, cast back (WanLayerNorm, model.py:89-99)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.astype(dtype)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return y


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm with f32 statistics (WanRMSNorm, model.py:70-86).

    The scale is applied in the input dtype: upcasting the whole tensor and
    casting back (the literal reference recipe) blocks XLA fusion and costs
    ~1.7 ms/layer on the 4680x1536 decode activations; only the reduction
    runs in f32 here (identical result in f32, ~1 ulp difference in bf16).
    """
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jax.lax.rsqrt(var + eps).astype(x.dtype)
    return x * scale * weight


def rms_scale(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Returns the elementwise factor of an RMS norm (rsqrt(mean x^2) * w)
    WITHOUT applying it — for fusion into a downstream f32 op (see
    ops.rope.apply_rotary premul)."""
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """GELU(approximate='tanh') (ref nn.GELU(approximate='tanh'))."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (xf + 0.044715 * xf**3)))
    return y.astype(x.dtype)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch nn.GELU() default, used by MLPProj and the
    CLIP ViT (ref wan/modules/model.py:469-482, clip.py:141-144)."""
    xf = x.astype(jnp.float32)
    return (jax.nn.gelu(xf, approximate=False)).astype(x.dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) (ref clip.py:41-44)."""
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


# ---------------------------------------------------------------------------
# initializers (reference init_weights: causal_model.py:1265-1287)


def xavier_uniform(rng, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


def normal_init(rng, shape, std, dtype=jnp.float32):
    return jax.random.normal(rng, shape, dtype) * std


def init_linear(rng, d_in, d_out, init="xavier", std=0.02, bias=True, dtype=jnp.float32):
    kr, _ = jax.random.split(rng)
    if init == "xavier":
        kernel = xavier_uniform(kr, (d_in, d_out), dtype)
    elif init == "normal":
        kernel = normal_init(kr, (d_in, d_out), std, dtype)
    elif init == "zeros":
        kernel = jnp.zeros((d_in, d_out), dtype)
    else:
        raise ValueError(init)
    p = {"kernel": kernel}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p
