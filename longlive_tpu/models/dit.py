"""Causal Wan DiT, TPU-native functional re-design.

Re-implements the semantics of the reference ``CausalWanModel``
(wan/modules/causal_model.py:511-1068) as pure functions over a stacked-layer
parameter pytree:

- the 30 transformer layers run under one ``lax.scan`` with parameters
  stacked on a leading [L] axis — one compiled layer body instead of 30
  Python-dispatched modules;
- the KV cache is the functional ring buffer from ``ops.kv_cache`` — the
  reference's per-layer clone/roll/insert + deferred `_apply_cache_updates`
  (causal_model.py:250-325, 849-905) becomes per-frame
  ``dynamic_update_slice`` writes at computed slots;
- RoPE uses absolute ``start_frame`` offsets (causal_model.py:206-211);
- cross-attention K/V are precomputed once per prompt
  (``prepare_cross_kv``), replacing the lazily-initialized crossattn_cache
  (wan/modules/model.py:174-183);
- adaLN: 6-way per-frame modulation per block + 2-way at the head
  (causal_model.py:413-477, 480-508).

Layer math parity is tested against a from-scratch torch re-derivation in
tests/test_dit.py.
"""

from __future__ import annotations

import os
import dataclasses
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CacheConfig, DiTConfig
from ..ops import kv_cache as kvc
from ..ops.attention import (attend, dense_attention, dequantize_k,
                             quantize_k_tokens)
from ..ops.embeddings import sinusoidal_embedding_1d
from ..ops.rope import RopeTables, apply_rotary, rope_multipliers
from . import nn


class CrossKV(NamedTuple):
    """Per-layer cross-attention K/V for one (padded) prompt.
    k, v: [L, B, text_len, N, D]."""

    k: jax.Array
    v: jax.Array


# ---------------------------------------------------------------------------
# parameter initialization


def canonicalize_rope_layout(params: dict, cfg: DiTConfig) -> dict:
    """When ``cfg.rope_layout == "halfsplit"``, permutes the self-attention
    q/k OUTPUT features (kernel columns, bias, qk-norm gamma) so each head's
    complex pairs are stored (re half ++ im half) — see
    ops.rope.halfsplit_qk_perm.  Attention is invariant to a consistent q/k
    channel permutation (QK^T contracts over it; V/o are untouched), so this
    changes no model output; it removes the rotation's stride-2 pair gather.
    Must be applied EXACTLY ONCE to any param tree built outside
    init_dit_params / the torch converters (both already call it)."""
    if cfg.rope_layout != "halfsplit":
        return params
    from ..ops.rope import halfsplit_qk_perm

    perm = jnp.asarray(halfsplit_qk_perm(cfg.head_dim, cfg.num_heads))
    params = dict(params)
    blocks = dict(params["blocks"])
    sa = dict(blocks["self_attn"])
    for name in ("q", "k"):
        p = dict(sa[name])
        p["kernel"] = p["kernel"][..., perm]
        if p.get("bias") is not None:
            p["bias"] = p["bias"][..., perm]
        sa[name] = p
    for name in ("norm_q", "norm_k"):
        if name in sa:
            sa[name] = {"scale": sa[name]["scale"][..., perm]}
    blocks["self_attn"] = sa
    params["blocks"] = blocks
    return params


def init_dit_params(
    rng: jax.Array, cfg: DiTConfig, dtype=jnp.float32, zero_head: bool = True
) -> dict:
    """Random init mirroring reference init_weights
    (causal_model.py:1265-1287): xavier for linears, N(0, .02) for text/time
    embeddings, zeros for the head projection."""
    d, ffn, L = cfg.dim, cfg.ffn_dim, cfg.num_layers
    pt = math.prod(cfg.patch_size)
    keys = iter(jax.random.split(rng, 64))

    def lin(d_in, d_out, init="xavier", std=0.02, bias=True):
        return nn.init_linear(next(keys), d_in, d_out, init, std, bias, dtype)

    def stacked_lin(d_in, d_out, bias=True):
        ks = jax.random.split(next(keys), L)
        p = jax.vmap(lambda k: nn.init_linear(k, d_in, d_out, "xavier", bias=bias, dtype=dtype))(
            ks
        )
        return p

    def attn_params():
        p = {
            "q": stacked_lin(d, d),
            "k": stacked_lin(d, d),
            "v": stacked_lin(d, d),
            "o": stacked_lin(d, d),
        }
        if cfg.qk_norm:
            p["norm_q"] = {"scale": jnp.ones((L, d), dtype)}
            p["norm_k"] = {"scale": jnp.ones((L, d), dtype)}
        return p

    cross = attn_params()
    if cfg.model_type == "i2v":
        # image-branch K/V per block (WanI2VCrossAttention, model.py:234-237)
        cross["k_img"] = stacked_lin(d, d)
        cross["v_img"] = stacked_lin(d, d)
        if cfg.qk_norm:
            cross["norm_k_img"] = {"scale": jnp.ones((L, d), dtype)}
    blocks = {
        "self_attn": attn_params(),
        "cross_attn": cross,
        "ffn": {"fc1": stacked_lin(d, ffn), "fc2": stacked_lin(ffn, d)},
        "modulation": jax.random.normal(next(keys), (L, 6, d), dtype) / math.sqrt(d),
    }
    if cfg.cross_attn_norm:
        blocks["norm3"] = {
            "scale": jnp.ones((L, d), dtype),
            "bias": jnp.zeros((L, d), dtype),
        }

    extra = {}
    if cfg.model_type == "i2v":
        # MLPProj: LayerNorm, Linear, GELU, Linear, LayerNorm
        # (model.py:469-482)
        cd = cfg.clip_dim
        extra["img_emb"] = {
            "ln1": {"scale": jnp.ones((cd,), dtype), "bias": jnp.zeros((cd,), dtype)},
            "fc1": lin(cd, cd),
            "fc2": lin(cd, d),
            "ln2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        }

    return canonicalize_rope_layout(extra | {
        "patch_embedding": lin(cfg.in_dim * pt, d),
        "text_embedding": {
            "fc1": lin(cfg.text_dim, d, "normal"),
            "fc2": lin(d, d, "normal"),
        },
        "time_embedding": {
            "fc1": lin(cfg.freq_dim, d, "normal"),
            "fc2": lin(d, d, "normal"),
        },
        "time_projection": {"fc": lin(d, 6 * d)},
        "blocks": blocks,
        "head": {
            # reference zero-inits the output projection (causal_model.py:1287);
            # tests pass zero_head=False so random-param flows are non-trivial.
            "head": lin(d, cfg.out_dim * pt, "zeros" if zero_head else "xavier"),
            "modulation": jax.random.normal(next(keys), (2, d), dtype) / math.sqrt(d),
        },
    }, cfg)


# ---------------------------------------------------------------------------
# patching


def patchify(x: jax.Array, cfg: DiTConfig) -> jax.Array:
    """[B, F, C, H, W] -> [B, F*(H/ph)*(W/pw), C*ph*pw] with the channel-major
    patch order of Conv3d (weight [dim, C, pt, ph, pw]) and f,h,w token order
    (causal_model.py:959-966)."""
    pt, ph, pw = cfg.patch_size
    assert pt == 1, "temporal patch 1 (Wan uses (1,2,2))"
    b, f, c, h, w = x.shape
    x = x.reshape(b, f, c, h // ph, ph, w // pw, pw)
    # -> [B, F, H', W', C, ph, pw]
    x = x.transpose(0, 1, 3, 5, 2, 4, 6)
    return x.reshape(b, f * (h // ph) * (w // pw), c * ph * pw)


def unpatchify(tokens: jax.Array, cfg: DiTConfig, f: int, h: int, w: int) -> jax.Array:
    """[B, S, out*ph*pw] -> [B, F, C_out, H, W] (ref unpatchify
    causal_model.py:1240-1263, einsum 'fhwpqrc->cfphqwr')."""
    pt, ph, pw = cfg.patch_size
    b = tokens.shape[0]
    hp, wp = h // ph, w // pw
    x = tokens.reshape(b, f, hp, wp, pt, ph, pw, cfg.out_dim)
    # [B, F, H', W', pt, ph, pw, C] -> [B, F, C, H', ph, W', pw]
    x = x.transpose(0, 1, 7, 2, 5, 3, 6, 4).squeeze(-1)
    return x.reshape(b, f, cfg.out_dim, h, w)


# ---------------------------------------------------------------------------
# embeddings / conditioning


def time_modulation(params: dict, cfg: DiTConfig, t: jax.Array, dtype) -> Tuple[jax.Array, jax.Array]:
    """t: [B, F] timesteps -> (e [B, F, dim], e0 [B, F, 6, dim])
    (causal_model.py:974-979)."""
    b, f = t.shape
    emb = sinusoidal_embedding_1d(cfg.freq_dim, t.reshape(-1)).astype(dtype)
    e = nn.linear(nn.silu(nn.linear(emb, params["time_embedding"]["fc1"])),
                  params["time_embedding"]["fc2"])
    e0 = nn.linear(nn.silu(e), params["time_projection"]["fc"])
    return e.reshape(b, f, cfg.dim), e0.reshape(b, f, 6, cfg.dim)


def embed_text(params: dict, prompt_embeds: jax.Array, dtype) -> jax.Array:
    """T5 features [B, text_len, text_dim] -> context [B, text_len, dim]
    (causal_model.py:601-603, 984-989).  Padding rows stay zero-embedded and
    *participate* in cross attention, matching the reference (no k_lens mask
    on the t2v cross-attn path, model.py:159-194)."""
    p = params["text_embedding"]
    x = prompt_embeds.astype(dtype)
    return nn.linear(nn.gelu_tanh(nn.linear(x, p["fc1"])), p["fc2"])


def prepare_cross_kv(params: dict, cfg: DiTConfig, prompt_embeds: jax.Array,
                     dtype=jnp.bfloat16) -> CrossKV:
    """Precomputes per-layer cross-attention K/V for a prompt — the
    functional replacement of crossattn_cache (causal_inference.py:281-293,
    model.py:174-183)."""
    ctx = embed_text(params, prompt_embeds, dtype)
    n, hd = cfg.num_heads, cfg.head_dim
    bp = params["blocks"]["cross_attn"]

    def one_layer(layer_p):
        k = nn.linear(ctx, layer_p["k"])
        if cfg.qk_norm:
            k = nn.rms_norm(k, layer_p["norm_k"]["scale"], cfg.eps)
        v = nn.linear(ctx, layer_p["v"])
        b, s, _ = k.shape
        return k.reshape(b, s, n, hd), v.reshape(b, s, n, hd)

    k, v = jax.lax.map(one_layer, bp)
    return CrossKV(k=k, v=v)


# ---------------------------------------------------------------------------
# transformer layer


def _per_frame(x: jax.Array, f: int) -> jax.Array:
    """[B, F*fs, d] -> [B, F, fs, d]"""
    b, s, d = x.shape
    return x.reshape(b, f, s // f, d)


def _flat(x: jax.Array) -> jax.Array:
    b, f, fs, d = x.shape
    return x.reshape(b, f * fs, d)


def _consecutive(frames: Tuple[int, ...]) -> bool:
    return len(frames) > 1 and all(
        b - a == 1 for a, b in zip(frames, frames[1:]))


def _slice_lin(p: dict, lo: int, hi: int) -> dict:
    """Column slice [lo, hi) of a (possibly int8-quantized) linear param."""
    out = {}
    if "w_int8" in p:
        out["w_int8"] = p["w_int8"][..., lo:hi]
        out["w_scale"] = p["w_scale"][..., lo:hi]
    else:
        out["kernel"] = p["kernel"][..., lo:hi]
    if "bias" in p:
        out["bias"] = p["bias"][..., lo:hi]
    return out


def _attention_layer_cached(
    layer_p: dict,
    cfg: DiTConfig,
    cache_cfg: CacheConfig,
    x: jax.Array,  # [B, S, dim] (already modulated + normed)
    rope_cos: jax.Array,
    rope_sin: jax.Array,
    cache_k: jax.Array,  # [B, S_cache, N, D] (int8 in the int8-KV mode)
    cache_v: jax.Array,
    kv_valid: jax.Array,  # [S_cache] bool
    offsets: jax.Array,  # [F] int32 token offsets
    write_frames: Tuple[int, ...],
    attn_impl: str,
    two_segment: bool = False,
    cache_sc: Optional[jax.Array] = None,  # [B, S_cache, N] int8-KV scales
    skip_ranges: Optional[jax.Array] = None,  # [F, 2] dead cache-token ranges
    cache_vsc: Optional[jax.Array] = None,  # [B, S_cache, N] int8-V scales
    kv_only: bool = False,  # compute/write K,V only (no q, no attention)
    contig_writes: bool = False,  # caller guarantees consecutive ring slots
    fused_rope: bool = False,  # q RoPE in the flash-kernel prologue
):
    b, s, _ = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    dout = n * hd
    if "qkv" in layer_p:
        # fused serving projection (ops.quant.fuse_qkv_params): one matmul
        # reads the normed activations once; the int8 path runs ONE dynamic
        # activation-quantize pass instead of three identical ones
        if kv_only:
            kv = nn.linear(x, _slice_lin(layer_p["qkv"], dout, 3 * dout))
            k, v = kv[..., :dout], kv[..., dout:]
            q_raw = None
        else:
            qkv = nn.linear(x, layer_p["qkv"])
            q_raw = qkv[..., :dout]
            k, v = qkv[..., dout:2 * dout], qkv[..., 2 * dout:]
    else:
        k = nn.linear(x, layer_p["k"])
        v = nn.linear(x, layer_p["v"])
        q_raw = None if kv_only else nn.linear(x, layer_p["q"])
    v = v.reshape(b, s, n, hd)
    k_pre = None
    if cfg.qk_norm:
        # fuse the RMS scale into RoPE's f32 domain (saves a bf16 round trip
        # between the projection and the rotation)
        k_pre = nn.rms_scale(k, layer_p["norm_k"]["scale"], cfg.eps)
    k = apply_rotary(k.reshape(b, s, n, hd), rope_cos, rope_sin, premul=k_pre,
                     layout=cfg.rope_layout)
    int8_cache = cache_k.dtype == jnp.int8 or cache_v.dtype == jnp.int8
    # fused q-rope applies on the plain single-segment serving attend only
    # (the two-segment and int8 kernels quantize/split q before the
    # rotation could run in the prologue), and ONLY in the halfsplit param
    # layout — the kernel prologue computes the halfsplit rotation
    fused_rope = (fused_rope and not two_segment and not int8_cache
                  and cfg.rope_layout == "halfsplit")
    q_rope = None
    if not kv_only:
        q = q_raw
        q_pre = (nn.rms_scale(q, layer_p["norm_q"]["scale"], cfg.eps)
                 if cfg.qk_norm else None)
        if fused_rope:
            if q_pre is not None:
                q = (q.astype(jnp.float32) * q_pre).astype(q.dtype)
            q = q.reshape(b, s, n, hd)
            q_rope = (rope_cos, rope_sin)
        else:
            q = apply_rotary(q.reshape(b, s, n, hd), rope_cos, rope_sin,
                             premul=q_pre, layout=cfg.rope_layout)

    fs = cache_cfg.frame_seq
    if two_segment:
        # attend [old cache ++ fresh block] without writing/copying the
        # full cache per layer (kv_valid excludes the block's own slots;
        # the caller commits the returned block K/V once, outside the
        # layer scan, in place on the donated cache buffer).  An int8
        # training cache (rollout cache_int8 mode — K *and* V stored
        # int8 with per-token scales, halving the rollout's dominant HBM
        # resident + remat residual) is dequantized here per layer: one
        # [S_cache, N, D] VPU pass, recomputed (not stored) under
        # remat_layers.
        if kv_only:
            return None, k, v, None, None
        ck, cv = cache_k, cache_v
        if ck.dtype == jnp.int8:
            ck = dequantize_k(ck, cache_sc, q.dtype)
        if cv.dtype == jnp.int8:
            cv = dequantize_k(cv, cache_vsc, q.dtype)
        out = attend(q, ck.astype(q.dtype), cv.astype(q.dtype),
                     kv_valid, impl=attn_impl, frame_seq=fs, k2=k, v2=v,
                     skip_ranges=skip_ranges)
        out = nn.linear(out.reshape(b, s, n * hd), layer_p["o"])
        return out, k, v, None, None

    int8_kv = cache_k.dtype == jnp.int8
    int8_v = cache_v.dtype == jnp.int8
    if int8_kv:
        # int8 KV: the fresh block's roped keys are quantized ONCE here
        # (4680 tokens) and written with their per-token scales; the big
        # cached K never sees a quantize pass (the cost that made
        # per-forward int8-QK a net loss, PERF.md negative result #2)
        k_w, k_sc = quantize_k_tokens(k)
    else:
        k_w, k_sc = k, None
    if int8_v:
        v_w, v_sc = quantize_k_tokens(v)
    else:
        v_w, v_sc = v, None

    new_k, new_v, new_sc, new_vsc = cache_k, cache_v, cache_sc, cache_vsc
    if contig_writes and _consecutive(write_frames):
        # ONE dynamic_update_slice for the whole block: each DUS in the
        # per-frame chain below costs XLA a copy-sized pass over the cache
        # buffer (the scan's ys cannot alias its xs), measured ~480 us/layer
        # at the decode shape vs ~36 us of actual update bytes.  The caller
        # asserts the static ring invariants (sink % F == ring % F == 0 and
        # all start/recache frames multiples of F) that make a block's ring
        # slots consecutive — see CausalInferencePipeline._contig.
        i0, nf = write_frames[0], len(write_frames)
        groups = [(i0, nf)]
    else:
        groups = [(i, 1) for i in write_frames]
    for i, nf in groups:
        kf = jax.lax.dynamic_slice_in_dim(k_w, i * fs, nf * fs, axis=1)
        vf = jax.lax.dynamic_slice_in_dim(v_w, i * fs, nf * fs, axis=1)
        new_k = jax.lax.dynamic_update_slice_in_dim(
            new_k, kf.astype(new_k.dtype), offsets[i], axis=1
        )
        new_v = jax.lax.dynamic_update_slice_in_dim(
            new_v, vf.astype(new_v.dtype), offsets[i], axis=1
        )
        if int8_kv:
            sf = jax.lax.dynamic_slice_in_dim(k_sc, i * fs, nf * fs, axis=1)
            new_sc = jax.lax.dynamic_update_slice_in_dim(
                new_sc, sf.astype(new_sc.dtype), offsets[i], axis=1
            )
        if int8_v:
            sf = jax.lax.dynamic_slice_in_dim(v_sc, i * fs, nf * fs, axis=1)
            new_vsc = jax.lax.dynamic_update_slice_in_dim(
                new_vsc, sf.astype(new_vsc.dtype), offsets[i], axis=1
            )

    if kv_only:
        return None, new_k, new_v, new_sc, new_vsc
    if int8_v:
        # training int8 cache: dequantize both operands and attend bf16
        # (the int8-QK kernel path is a serving mode; training impls need
        # a differentiable bf16 attend)
        out = attend(q, dequantize_k(new_k, new_sc, q.dtype),
                     dequantize_k(new_v, new_vsc, q.dtype), kv_valid,
                     impl=attn_impl, frame_seq=fs)
    else:
        out = attend(q, new_k if int8_kv else new_k.astype(q.dtype),
                     new_v.astype(q.dtype), kv_valid,
                     impl=attn_impl, frame_seq=fs, k_scales=new_sc,
                     q_rope=q_rope)
    out = nn.linear(out.reshape(b, s, n * hd), layer_p["o"])
    return out, new_k, new_v, new_sc, new_vsc


def _cross_attention_layer(
    layer_p: dict, cfg: DiTConfig, x: jax.Array, ck: jax.Array, cv: jax.Array,
    attn_impl: str = "xla",
) -> jax.Array:
    b, s, _ = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    q = nn.linear(x, layer_p["q"])
    if cfg.qk_norm:
        q = nn.rms_norm(q, layer_p["norm_q"]["scale"], cfg.eps)
    q = q.reshape(b, s, n, hd)
    # Serving default is the XLA einsum: measured 3.25 ms/forward FASTER than
    # routing cross-attention through the flash kernel at the decode shape
    # (dit_breakdown on v5e — at Skv=512 the materialized probs fit XLA's
    # fusion window, and the kernel's grid/scratch overhead dominates its
    # HBM saving).  LONGLIVE_CROSS_FLASH=1 restores the kernel route.
    # int8-QK variants apply to SELF-attention only — cross-attention stays
    # bf16 so int8 A/Bs measure one thing.
    if attn_impl in ("auto", "pallas", "pallas_qk8"):
        impl = ("pallas" if os.environ.get("LONGLIVE_CROSS_FLASH", "0") == "1"
                else "xla")
    elif attn_impl == "pallas_qk8_interpret":
        impl = "pallas_interpret"
    else:
        impl = attn_impl
    out = attend(q, ck.astype(q.dtype), cv.astype(q.dtype), None,
                 impl=impl)
    return nn.linear(out.reshape(b, s, n * hd), layer_p["o"])


def _block_body(
    cfg: DiTConfig,
    cache_cfg: CacheConfig,
    num_frames: int,
    x: jax.Array,
    layer_p: dict,
    cache_k: jax.Array,
    cache_v: jax.Array,
    cross_k: jax.Array,
    cross_v: jax.Array,
    e0: jax.Array,  # [B, F, 6, dim]
    rope_cos: jax.Array,
    rope_sin: jax.Array,
    kv_valid: jax.Array,
    offsets: jax.Array,
    write_frames: Tuple[int, ...],
    attn_impl: str,
    two_segment: bool = False,
    cache_sc: Optional[jax.Array] = None,
    skip_ranges: Optional[jax.Array] = None,
    cache_vsc: Optional[jax.Array] = None,
    kv_only: bool = False,
    contig_writes: bool = False,
    fused_rope: bool = False,
):
    """One CausalWanAttentionBlock (causal_model.py:413-477).

    ``kv_only``: compute and write this layer's K/V but skip its attention,
    cross-attention, and FFN — the LAST layer of a commit/recache forward,
    whose flow output nobody reads (the scan prevents XLA from eliding it)."""
    f = num_frames
    mod = layer_p["modulation"][None, None]  # [1, 1, 6, dim]
    e = mod.astype(e0.dtype) + e0  # [B, F, 6, dim]
    e_ = [e[:, :, i][:, :, None] for i in range(6)]  # each [B, F, 1, dim]

    # self-attention with per-frame adaLN
    h = _per_frame(nn.layer_norm(x, cfg.eps), f)
    h = _flat(h * (1 + e_[1]) + e_[0])
    y, new_k, new_v, new_sc, new_vsc = _attention_layer_cached(
        layer_p["self_attn"], cfg, cache_cfg, h, rope_cos, rope_sin,
        cache_k, cache_v, kv_valid, offsets, write_frames, attn_impl,
        two_segment=two_segment, cache_sc=cache_sc, skip_ranges=skip_ranges,
        cache_vsc=cache_vsc, kv_only=kv_only, contig_writes=contig_writes,
        fused_rope=fused_rope,
    )
    if kv_only:
        return x, new_k, new_v, new_sc, new_vsc
    x = x + _flat(_per_frame(y, f) * e_[2])

    # cross-attention
    norm3 = layer_p.get("norm3")
    h = nn.layer_norm(x, cfg.eps,
                      scale=None if norm3 is None else norm3["scale"],
                      bias=None if norm3 is None else norm3["bias"])
    x = x + _cross_attention_layer(layer_p["cross_attn"], cfg, h, cross_k,
                                   cross_v, attn_impl)

    # ffn with per-frame adaLN
    h = _per_frame(nn.layer_norm(x, cfg.eps), f)
    h = _flat(h * (1 + e_[4]) + e_[3])
    y = nn.linear(nn.gelu_tanh(nn.linear(h, layer_p["ffn"]["fc1"])), layer_p["ffn"]["fc2"])
    x = x + _flat(_per_frame(y, f) * e_[5])
    return x, new_k, new_v, new_sc, new_vsc


def _attention_layer_cached_kl(
    layer_p: dict,
    cfg: DiTConfig,
    cache_cfg: CacheConfig,
    x: jax.Array,  # [B, S, dim] (already modulated + normed)
    rope_cos: jax.Array,
    rope_sin: jax.Array,
    ck: jax.Array,  # [L*B*N, S_pad, D] full kernel-layout cache (carry)
    cv: jax.Array,
    kv_valid_pad: jax.Array,  # [S_pad] bool (pad + warmup slots False)
    layer_idx: jax.Array,  # [] int32
    tok_off: jax.Array,  # [] int32 first token slot of the block's frames
    attn_impl: str,
    kv_only: bool = False,
    fused_rope: bool = False,
):
    """Self-attention against the KERNEL-LAYOUT cache: the fresh block's
    roped K/V are written with ONE in-place dynamic_update_slice into the
    scan-carried [L*B*N, S_pad, D] buffers (the pipeline's contiguous-ring
    invariant guarantees consecutive slots), and the flash kernel reads
    layer ``layer_idx``'s rows directly via a scalar-prefetch offset —
    no per-layer cache relayout and no written-through scan-ys copy
    (together the measured ~16 ms/forward KV-write tax, PERF.md).

    ``fused_rope``: q's rotation runs in the flash-kernel prologue
    (halfsplit layout only) — q never round-trips HBM between the rms
    premul and attention.  One extra bf16 rounding of q between the norm
    and the rotation vs the fused-f32 external form."""
    b, s, _ = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    dout = n * hd
    if "qkv" in layer_p:
        if kv_only:
            kv = nn.linear(x, _slice_lin(layer_p["qkv"], dout, 3 * dout))
            k, v = kv[..., :dout], kv[..., dout:]
            q_raw = None
        else:
            qkv = nn.linear(x, layer_p["qkv"])
            q_raw = qkv[..., :dout]
            k, v = qkv[..., dout:2 * dout], qkv[..., 2 * dout:]
    else:
        k = nn.linear(x, layer_p["k"])
        v = nn.linear(x, layer_p["v"])
        q_raw = None if kv_only else nn.linear(x, layer_p["q"])
    v = v.reshape(b, s, n, hd)
    k_pre = None
    if cfg.qk_norm:
        k_pre = nn.rms_scale(k, layer_p["norm_k"]["scale"], cfg.eps)
    k = apply_rotary(k.reshape(b, s, n, hd), rope_cos, rope_sin, premul=k_pre,
                     layout=cfg.rope_layout)

    # fresh block -> kernel layout [B*N, S, D]; ONE in-place DUS on the
    # carried buffer (XLA aliases the while-loop state, so this is an
    # update-sized write, not a cache-sized copy)
    kt = k.transpose(0, 2, 1, 3).reshape(b * n, s, hd)
    vt = v.transpose(0, 2, 1, 3).reshape(b * n, s, hd)
    row0 = jnp.asarray(layer_idx, jnp.int32) * (b * n)
    start = (row0, jnp.asarray(tok_off, jnp.int32), jnp.zeros([], jnp.int32))
    ck = jax.lax.dynamic_update_slice(ck, kt.astype(ck.dtype), start)
    cv = jax.lax.dynamic_update_slice(cv, vt.astype(cv.dtype), start)
    if kv_only:
        return None, ck, cv

    q = q_raw
    q_pre = (nn.rms_scale(q, layer_p["norm_q"]["scale"], cfg.eps)
             if cfg.qk_norm else None)
    if fused_rope and cfg.rope_layout == "halfsplit":
        if q_pre is not None:
            q = (q.astype(jnp.float32) * q_pre).astype(q.dtype)
        q = q.reshape(b, s, n, hd)
        out = attend(q, ck, cv, kv_valid_pad, impl=attn_impl,
                     frame_seq=cache_cfg.frame_seq, kv_layer=layer_idx,
                     q_rope=(rope_cos, rope_sin))
    else:
        q = apply_rotary(q.reshape(b, s, n, hd), rope_cos, rope_sin,
                         premul=q_pre, layout=cfg.rope_layout)
        out = attend(q, ck, cv, kv_valid_pad, impl=attn_impl,
                     frame_seq=cache_cfg.frame_seq, kv_layer=layer_idx)
    out = nn.linear(out.reshape(b, s, n * hd), layer_p["o"])
    return out, ck, cv


def _block_body_kl(
    cfg: DiTConfig,
    cache_cfg: CacheConfig,
    num_frames: int,
    x: jax.Array,
    layer_p: dict,
    ck: jax.Array,
    cv: jax.Array,
    cross_k: jax.Array,
    cross_v: jax.Array,
    e0: jax.Array,
    rope_cos: jax.Array,
    rope_sin: jax.Array,
    kv_valid_pad: jax.Array,
    layer_idx: jax.Array,
    tok_off: jax.Array,
    attn_impl: str,
    kv_only: bool = False,
    fused_rope: bool = False,
):
    """_block_body for the kernel-layout cache path (carry-resident cache,
    in-place writes).  Cross-attention and FFN are identical."""
    f = num_frames
    mod = layer_p["modulation"][None, None]
    e = mod.astype(e0.dtype) + e0
    e_ = [e[:, :, i][:, :, None] for i in range(6)]

    h = _per_frame(nn.layer_norm(x, cfg.eps), f)
    h = _flat(h * (1 + e_[1]) + e_[0])
    y, ck, cv = _attention_layer_cached_kl(
        layer_p["self_attn"], cfg, cache_cfg, h, rope_cos, rope_sin,
        ck, cv, kv_valid_pad, layer_idx, tok_off, attn_impl, kv_only=kv_only,
        fused_rope=fused_rope,
    )
    if kv_only:
        return x, ck, cv
    x = x + _flat(_per_frame(y, f) * e_[2])

    norm3 = layer_p.get("norm3")
    h = nn.layer_norm(x, cfg.eps,
                      scale=None if norm3 is None else norm3["scale"],
                      bias=None if norm3 is None else norm3["bias"])
    x = x + _cross_attention_layer(layer_p["cross_attn"], cfg, h, cross_k,
                                   cross_v, attn_impl)

    h = _per_frame(nn.layer_norm(x, cfg.eps), f)
    h = _flat(h * (1 + e_[4]) + e_[3])
    y = nn.linear(nn.gelu_tanh(nn.linear(h, layer_p["ffn"]["fc1"])), layer_p["ffn"]["fc2"])
    x = x + _flat(_per_frame(y, f) * e_[5])
    return x, ck, cv


def _head(params: dict, cfg: DiTConfig, x: jax.Array, e: jax.Array, f: int) -> jax.Array:
    """CausalHead (causal_model.py:480-508). e: [B, F, dim]."""
    hp = params["head"]
    mod = hp["modulation"][None, None].astype(e.dtype)  # [1, 1, 2, dim]
    em = mod + e[:, :, None]  # [B, F, 2, dim]
    e0, e1 = em[:, :, 0][:, :, None], em[:, :, 1][:, :, None]
    h = _per_frame(nn.layer_norm(x, cfg.eps), f)
    h = _flat(h * (1 + e1) + e0)
    return nn.linear(h, hp["head"])


# ---------------------------------------------------------------------------
# full cached forward


def dit_forward_full(
    params: dict,
    cfg: DiTConfig,
    tables: RopeTables,
    x: jax.Array,  # [B, F, C, H, W]
    t: jax.Array,  # [B, F]
    cross_kv: CrossKV,
    frame_mask,  # [F, F] bool array OR ops.masks.FrameMaskSpec
    start_frame: jax.Array | int = 0,
    attn_impl: str = "xla",
    remat_layers: bool = False,
) -> jax.Array:
    """Uncached full-sequence forward with a blockwise-causal mask — the
    reference's kv_cache=None path (causal_model.py:130-204) used by training
    rollout supervision and teacher forcing.  Returns flow_pred.

    When ``frame_mask`` is a FrameMaskSpec and attn_impl is a pallas variant,
    self-attention runs through the masked flash kernel (no [S,S] bias
    materialization — required at the 32760-token training scale).

    ``remat_layers``: checkpoint each scanned layer, so a backward through
    this forward stores only the [L, S, dim] carry chain instead of every
    per-layer intermediate (the f32 norm residuals alone are ~5.8 GB at
    the 32760-token training shape) — the standard transformer-training
    remat structure; training callers enable it."""
    from ..ops.attention import flash_attention_frame_masked
    from ..ops.masks import FrameMaskSpec, expand_frame_mask

    b, f, c, h, w = x.shape
    dtype = params["patch_embedding"]["kernel"].dtype
    tokens = nn.linear(patchify(x.astype(dtype), cfg), params["patch_embedding"])
    e, e0 = time_modulation(params, cfg, t, dtype)
    hp, wp = h // cfg.patch_size[1], w // cfg.patch_size[2]
    rope_cos, rope_sin = rope_multipliers(tables, f, hp, wp, start_frame)

    spec = frame_mask if isinstance(frame_mask, FrameMaskSpec) else None
    use_kernel = spec is not None and attn_impl in ("pallas", "pallas_interpret", "auto")
    if use_kernel:
        bias = None
        fs_tokens = hp * wp

        def self_attend(q, k, v):
            return flash_attention_frame_masked(
                q, k, v, mask_kind=spec.kind, frame_seq=fs_tokens,
                nfb=spec.num_frame_per_block, local=spec.local_attn_size,
                sink=spec.sink_frames, clean_frames=spec.clean_frames,
                interpret=(attn_impl == "pallas_interpret"),
            )
    else:
        fm = spec.materialize(f) if spec is not None else frame_mask
        token_mask = expand_frame_mask(fm, hp * wp)
        bias = jnp.where(token_mask, 0.0, -1e30).astype(jnp.float32)[None, None]

        def self_attend(q, k, v):
            return dense_attention(q, k, v, bias)

    def scan_body(carry, xs):
        xcur = carry
        layer_p, ck, cv = xs
        mod = layer_p["modulation"][None, None]
        em = mod.astype(e0.dtype) + e0
        e_ = [em[:, :, i][:, :, None] for i in range(6)]

        hh = _per_frame(nn.layer_norm(xcur, cfg.eps), f)
        hh = _flat(hh * (1 + e_[1]) + e_[0])
        n, hd = cfg.num_heads, cfg.head_dim
        q = nn.linear(hh, layer_p["self_attn"]["q"])
        k = nn.linear(hh, layer_p["self_attn"]["k"])
        if cfg.qk_norm:
            q = nn.rms_norm(q, layer_p["self_attn"]["norm_q"]["scale"], cfg.eps)
            k = nn.rms_norm(k, layer_p["self_attn"]["norm_k"]["scale"], cfg.eps)
        s = hh.shape[1]
        v = nn.linear(hh, layer_p["self_attn"]["v"]).reshape(b, s, n, hd)
        q = apply_rotary(q.reshape(b, s, n, hd), rope_cos, rope_sin,
                         layout=cfg.rope_layout)
        k = apply_rotary(k.reshape(b, s, n, hd), rope_cos, rope_sin,
                         layout=cfg.rope_layout)
        y = self_attend(q, k, v)
        y = nn.linear(y.reshape(b, s, n * hd), layer_p["self_attn"]["o"])
        xcur = xcur + _flat(_per_frame(y, f) * e_[2])

        norm3 = layer_p.get("norm3")
        hh = nn.layer_norm(xcur, cfg.eps,
                           scale=None if norm3 is None else norm3["scale"],
                           bias=None if norm3 is None else norm3["bias"])
        xcur = xcur + _cross_attention_layer(layer_p["cross_attn"], cfg, hh,
                                             ck, cv, attn_impl)

        hh = _per_frame(nn.layer_norm(xcur, cfg.eps), f)
        hh = _flat(hh * (1 + e_[4]) + e_[3])
        y = nn.linear(nn.gelu_tanh(nn.linear(hh, layer_p["ffn"]["fc1"])),
                      layer_p["ffn"]["fc2"])
        xcur = xcur + _flat(_per_frame(y, f) * e_[5])
        return xcur, None

    tokens, _ = jax.lax.scan(
        jax.checkpoint(scan_body) if remat_layers else scan_body,
        tokens, (params["blocks"], cross_kv.k, cross_kv.v)
    )
    out_tokens = _head(params, cfg, tokens, e, f)
    return unpatchify(out_tokens.astype(jnp.float32), cfg, f, h, w)


def dit_forward_teacher_forcing(
    params: dict,
    cfg: DiTConfig,
    tables: RopeTables,
    noisy: jax.Array,  # [B, F, C, H, W]
    clean: jax.Array,  # [B, F, C, H, W]
    t: jax.Array,  # [B, F] timesteps for the noisy half
    cross_kv: CrossKV,
    aug_t: Optional[jax.Array] = None,  # [B, F] timesteps for the clean half
    attn_impl: str = "xla",
    remat_layers: bool = False,
) -> jax.Array:
    """Teacher-forcing forward: the sequence is [clean | noisy] with the
    teacher-forcing mask — noisy block i attends its own noisy block plus the
    *clean* context of earlier blocks (reference causal_model.py:130-175,
    703-788; wan_wrapper.py:259-268).  Returns flow_pred for the noisy half.

    With a pallas ``attn_impl`` the mask is computed arithmetically inside
    the flash kernel (mask_kind="teacher_forcing") — at the 21-frame
    training geometry the [2S, 2S] = 65520^2 f32 bias the dense path
    materializes is ~17 GB, so the kernel path is the only one usable at
    scale (the reference's flex-attention TF BlockMask, causal_model.py:
    703-788).
    """
    from ..ops.masks import expand_frame_mask, teacher_forcing_frame_mask

    b, f, c, h, w = noisy.shape
    dtype = params["patch_embedding"]["kernel"].dtype
    x2 = jnp.concatenate([clean, noisy], axis=1).astype(dtype)
    tokens = nn.linear(patchify(x2, cfg), params["patch_embedding"])

    if aug_t is None:
        aug_t = jnp.zeros_like(t)
    e_clean, e0_clean = time_modulation(params, cfg, aug_t, dtype)
    e_noisy, e0_noisy = time_modulation(params, cfg, t, dtype)
    e = jnp.concatenate([e_clean, e_noisy], axis=1)
    e0 = jnp.concatenate([e0_clean, e0_noisy], axis=1)

    hp, wp = h // cfg.patch_size[1], w // cfg.patch_size[2]
    # RoPE positions repeat for the clean and noisy halves
    # (causal_model.py:132-143: "rope should be same for clean and noisy")
    rope_cos, rope_sin = rope_multipliers(tables, f, hp, wp, 0)
    rope_cos = jnp.concatenate([rope_cos, rope_cos], axis=0)
    rope_sin = jnp.concatenate([rope_sin, rope_sin], axis=0)

    if attn_impl == "auto":
        # resolve like ops.attention.attend(): pallas only on a TPU backend
        # with a lane-aligned head_dim (CPU backends would hit a
        # non-interpret pallas_call at lowering otherwise)
        attn_impl = ("pallas" if (jax.default_backend() == "tpu"
                                  and cfg.head_dim % 128 == 0) else "xla")
    use_kernel = attn_impl in ("pallas", "pallas_interpret")
    if use_kernel:
        from ..ops.attention import flash_attention_frame_masked

        fs_tokens = hp * wp

        def self_attend(q, k, v):
            return flash_attention_frame_masked(
                q, k, v, mask_kind="teacher_forcing", frame_seq=fs_tokens,
                nfb=cfg.num_frame_per_block, clean_frames=f,
                interpret=(attn_impl == "pallas_interpret"))
    else:
        frame_mask = teacher_forcing_frame_mask(f, cfg.num_frame_per_block)
        token_mask = expand_frame_mask(frame_mask, hp * wp)
        bias = jnp.where(token_mask, 0.0, -1e30).astype(jnp.float32)[None, None]

        def self_attend(q, k, v):
            return dense_attention(q, k, v, bias)

    def scan_body(carry, xs):
        xcur = carry
        layer_p, ck, cv = xs
        mod = layer_p["modulation"][None, None]
        em = mod.astype(e0.dtype) + e0
        e_ = [em[:, :, i][:, :, None] for i in range(6)]
        ftot = 2 * f

        hh = _per_frame(nn.layer_norm(xcur, cfg.eps), ftot)
        hh = _flat(hh * (1 + e_[1]) + e_[0])
        n, hd = cfg.num_heads, cfg.head_dim
        q = nn.linear(hh, layer_p["self_attn"]["q"])
        k = nn.linear(hh, layer_p["self_attn"]["k"])
        if cfg.qk_norm:
            q = nn.rms_norm(q, layer_p["self_attn"]["norm_q"]["scale"], cfg.eps)
            k = nn.rms_norm(k, layer_p["self_attn"]["norm_k"]["scale"], cfg.eps)
        s = hh.shape[1]
        v = nn.linear(hh, layer_p["self_attn"]["v"]).reshape(b, s, n, hd)
        q = apply_rotary(q.reshape(b, s, n, hd), rope_cos, rope_sin,
                         layout=cfg.rope_layout)
        k = apply_rotary(k.reshape(b, s, n, hd), rope_cos, rope_sin,
                         layout=cfg.rope_layout)
        y = self_attend(q, k, v)
        y = nn.linear(y.reshape(b, s, n * hd), layer_p["self_attn"]["o"])
        xcur = xcur + _flat(_per_frame(y, ftot) * e_[2])

        norm3 = layer_p.get("norm3")
        hh = nn.layer_norm(xcur, cfg.eps,
                           scale=None if norm3 is None else norm3["scale"],
                           bias=None if norm3 is None else norm3["bias"])
        xcur = xcur + _cross_attention_layer(layer_p["cross_attn"], cfg, hh,
                                             ck, cv, attn_impl)

        hh = _per_frame(nn.layer_norm(xcur, cfg.eps), ftot)
        hh = _flat(hh * (1 + e_[4]) + e_[3])
        y = nn.linear(nn.gelu_tanh(nn.linear(hh, layer_p["ffn"]["fc1"])),
                      layer_p["ffn"]["fc2"])
        xcur = xcur + _flat(_per_frame(y, ftot) * e_[5])
        return xcur, None

    tokens, _ = jax.lax.scan(
        jax.checkpoint(scan_body) if remat_layers else scan_body,
        tokens, (params["blocks"], cross_kv.k, cross_kv.v)
    )
    # keep the noisy half (causal_model.py:1220-1221)
    tokens = tokens[:, tokens.shape[1] // 2 :]
    out_tokens = _head(params, cfg, tokens, e_noisy, f)
    return unpatchify(out_tokens.astype(jnp.float32), cfg, f, h, w)


def _dit_forward_cached_kl(
    params: dict,
    cfg: DiTConfig,
    cache_cfg: CacheConfig,
    tables: RopeTables,
    x: jax.Array,  # [B, F, C, H, W]
    t: jax.Array,  # [B, F]
    cross_kv: CrossKV,
    cache: kvc.KVCache,  # KERNEL-LAYOUT: k/v [L*B*N, S_pad, D]
    start_frame: jax.Array,
    *,
    attn_impl: str = "auto",
    advance_counters: bool = True,
    window_frames: Optional[int] = None,
    kv_only: bool = False,
    fused_rope: bool = False,
) -> Tuple[jax.Array, kvc.KVCache]:
    """Cached DiT forward over a KERNEL-LAYOUT cache (ops.kv_cache
    .init_cache_kl).  The cache buffers ride the layer scan's CARRY, each
    layer commits its block K/V with one in-place dynamic_update_slice,
    and the flash kernel reads the stacked buffer at a scalar-prefetched
    layer offset — eliminating both the per-layer [B,S,N,D]->[B*N,S,D]
    relayout and the written-through scan-ys cache copy of the
    write-then-attend form (~16 ms/forward at the serving shape, PERF.md).

    Semantics match write-then-attend exactly: the block's slots are
    (over)written before attention each pass, so threading the returned
    cache through consecutive denoise passes reproduces the discard-and
    -rewrite behavior bit-for-bit while keeping the buffer chain aliased.
    Requires the pipeline's contiguous-ring invariant (the block's frames
    occupy consecutive slots)."""
    b, f, c, h, w = x.shape
    dtype = params["patch_embedding"]["kernel"].dtype

    tokens = nn.linear(patchify(x.astype(dtype), cfg), params["patch_embedding"])
    e, e0 = time_modulation(params, cfg, t, dtype)
    hp, wp = h // cfg.patch_size[1], w // cfg.patch_size[2]
    rope_cos, rope_sin = rope_multipliers(tables, f, hp, wp, start_frame)

    offsets = kvc.block_write_offsets(cache_cfg, cache, start_frame, f)
    tok_off = offsets[0]  # consecutive slots by the contig invariant
    kv_valid = kvc.validity_mask(cache_cfg, cache, start_frame, f,
                                 window_frames=window_frames)  # token-level
    s_pad = cache.k.shape[1]
    kv_valid = jnp.concatenate(
        [kv_valid, jnp.zeros((s_pad - kv_valid.shape[0],), bool)])

    L = params["blocks"]["modulation"].shape[0]
    lidx = jnp.arange(L, dtype=jnp.int32)

    def scan_body(carry, xs):
        xcur, ck, cv = carry
        layer_p, xk, xv, li = xs
        xout, ck, cv = _block_body_kl(
            cfg, cache_cfg, f, xcur, layer_p, ck, cv, xk, xv,
            e0, rope_cos, rope_sin, kv_valid, li, tok_off, attn_impl,
            fused_rope=fused_rope,
        )
        return (xout, ck, cv), None

    xs = (params["blocks"], cross_kv.k, cross_kv.v, lidx)
    if kv_only:
        # scan L-1 full layers, then a K/V-projection-only tail (the
        # commit forward's flow output is never read)
        xs_head = jax.tree.map(lambda a: a[:-1], xs)
        (tokens, ck, cv), _ = jax.lax.scan(
            scan_body, (tokens, cache.k, cache.v), xs_head)
        lp, xk, xv, li = jax.tree.map(lambda a: a[-1], xs)
        mod = lp["modulation"][None, None]
        e_ = (mod.astype(e0.dtype) + e0)
        hh = _per_frame(nn.layer_norm(tokens, cfg.eps), f)
        hh = _flat(hh * (1 + e_[:, :, 1][:, :, None]) + e_[:, :, 0][:, :, None])
        _, ck, cv = _attention_layer_cached_kl(
            lp["self_attn"], cfg, cache_cfg, hh, rope_cos, rope_sin,
            ck, cv, kv_valid, li, tok_off, attn_impl, kv_only=True)
        flow = jnp.zeros((b, f, cfg.out_dim, h, w), jnp.float32)
    else:
        (tokens, ck, cv), _ = jax.lax.scan(
            scan_body, (tokens, cache.k, cache.v), xs)
        out_tokens = _head(params, cfg, tokens, e, f)
        flow = unpatchify(out_tokens.astype(jnp.float32), cfg, f, h, w)

    base = kvc.advance(cache_cfg, cache, start_frame, f) if advance_counters else cache
    return flow, dataclasses.replace(base, k=ck, v=cv)


def dit_forward_cached(
    params: dict,
    cfg: DiTConfig,
    cache_cfg: CacheConfig,
    tables: RopeTables,
    x: jax.Array,  # [B, F, C, H, W] noisy latents
    t: jax.Array,  # [B, F] timesteps
    cross_kv: CrossKV,
    cache: kvc.KVCache,
    start_frame: jax.Array,  # [] int32 absolute first-frame index
    *,
    kv_valid: Optional[jax.Array] = None,
    offsets: Optional[jax.Array] = None,
    write_frames: Optional[Tuple[int, ...]] = None,
    attn_impl: str = "auto",
    advance_counters: bool = True,
    window_frames: Optional[int] = None,
    commit_writes: bool = True,
    remat_layers: bool = False,
    two_segment: Optional[bool] = None,
    kv_only: bool = False,
    contig_writes: bool = False,
    fused_rope: bool = False,
) -> Tuple[jax.Array, kvc.KVCache]:
    """One cached DiT forward over a block of ``F`` frames starting at
    absolute frame ``start_frame`` (ref _forward_inference,
    causal_model.py:907-1068).  Returns (flow_pred [B,F,C,H,W], cache').

    The returned cache has the block's roped K/V written at its ring slots
    and fill counters advanced; callers running recompute (denoise) passes
    simply drop it (see ops.kv_cache module docstring) — or pass
    ``commit_writes=False`` to skip materializing the writes entirely.

    On the standard decode path (no explicit kv_valid/offsets/write_frames)
    the layer attention runs in TWO-SEGMENT form: the old cache and the
    fresh block are separate attention operands, so no per-layer
    written-through copy of the full cache is ever materialized; the
    block's K/V are committed in ONE in-place update on the (donated)
    stacked cache after the layer scan.  Paths that supply explicit cache
    plumbing (KV-recache) keep the write-then-attend form.

    A KERNEL-LAYOUT cache (k.ndim == 3, ops.kv_cache.init_cache_kl)
    dispatches to _dit_forward_cached_kl — carry-resident cache with
    in-place writes and zero-copy kernel reads.
    """
    if cache.k.ndim == 3:
        if (kv_valid is not None or offsets is not None
                or write_frames is not None or two_segment or remat_layers):
            raise ValueError("kernel-layout cache supports the standard "
                             "decode path only (no explicit plumbing / "
                             "two-segment / remat)")
        return _dit_forward_cached_kl(
            params, cfg, cache_cfg, tables, x, t, cross_kv, cache,
            start_frame, attn_impl=attn_impl,
            advance_counters=advance_counters, window_frames=window_frames,
            kv_only=kv_only, fused_rope=fused_rope)
    b, f, c, h, w = x.shape
    dtype = params["patch_embedding"]["kernel"].dtype

    tokens = nn.linear(patchify(x.astype(dtype), cfg), params["patch_embedding"])
    e, e0 = time_modulation(params, cfg, t, dtype)

    hp, wp = h // cfg.patch_size[1], w // cfg.patch_size[2]
    rope_cos, rope_sin = rope_multipliers(tables, f, hp, wp, start_frame)

    # Two-segment decode stays opt-in for SERVING (LONGLIVE_TWO_SEGMENT=1):
    # measured e2e it loses 40 ms/latent-frame to the write-then-attend
    # form — the cache operand still streams the block's (masked-invalid)
    # ring slots, +25% attention work at the 12-frame window, outweighing
    # the saved per-layer cache writes (PERF.md negative result #3).
    # TRAINING callers pass ``two_segment=True`` explicitly: there the
    # binding constraint is HBM, and this form never materializes the
    # per-layer written cache stacks (2 x [L, S_cache, N, D] per forward).
    int8_kv = cache.k.dtype == jnp.int8
    int8_v = cache.v.dtype == jnp.int8
    # the serving k-only int8 cache feeds the int8-QK kernel through the
    # write-then-attend form (two-segment was a measured wash there); the
    # TRAINING k+v int8 cache (rollout cache_int8) runs two-segment with a
    # per-layer dequant — disabling two-segment would materialize the very
    # per-layer written cache stacks the mode exists to avoid
    no_explicit_plumbing = (kv_valid is None and offsets is None
                            and write_frames is None)
    if two_segment is None:
        two_segment = os.environ.get("LONGLIVE_TWO_SEGMENT", "0") == "1"
    two_segment = (two_segment and no_explicit_plumbing
                   and not (int8_kv and not int8_v))
    if offsets is None:
        offsets = kvc.block_write_offsets(cache_cfg, cache, start_frame, f)
    if kv_valid is None:
        kv_valid = kvc.validity_mask(cache_cfg, cache, start_frame, f,
                                     window_frames=window_frames,
                                     exclude_block=two_segment)
    if write_frames is None:
        write_frames = tuple(range(f))

    skip_ranges = None
    if two_segment:
        # the block's own ring slots are excluded from kv_valid; hand the
        # kernel their token ranges so it elides those tiles outright
        # (without this the two-segment form pays +25% attention work,
        # PERF.md negative result #3)
        fs_tok = cache_cfg.frame_seq
        starts = jnp.stack([offsets[i] for i in write_frames])
        skip_ranges = jnp.stack([starts, starts + fs_tok], axis=1)

    def scan_body(carry, xs):
        xcur = carry
        layer_p, ck, cv, xk, xv, csc, cvsc = xs
        xout, nk, nv, nsc, nvsc = _block_body(
            cfg, cache_cfg, f, xcur, layer_p, ck, cv, xk, xv,
            e0, rope_cos, rope_sin, kv_valid, offsets, write_frames, attn_impl,
            two_segment=two_segment, cache_sc=csc, skip_ranges=skip_ranges,
            cache_vsc=cvsc, contig_writes=contig_writes,
            fused_rope=fused_rope,
        )
        return xout, (nk, nv, nsc, nvsc)

    blocks_xs = (params["blocks"], cache.k, cache.v, cross_kv.k, cross_kv.v,
                 cache.k_scale, cache.v_scale)
    body = jax.checkpoint(scan_body) if remat_layers else scan_body
    if kv_only and (remat_layers or b > 1):
        # TRAINING commit forwards AND batched serving: keep the uniform
        # L-layer scan and just drop the head.  The L-1 split below slices
        # the stacked params and cache (jax.tree.map a[:-1] / a[-1]):
        # under the rollout VJP that materializes near-full COPIES of
        # every weight stack (measured: 2x 1.42 GB ys + 761 MB ffn-weight
        # copies, 21-frame staged phase-3 compile OOM), and at B>1 the
        # cache.k/.v[:-1] slices alone are 2x 2.33 GB HLO temps — the
        # B=2 e2e compile OOM (chip r3b stage 1).  The split saves only
        # ~1/L of one forward in 5, so it stays a B=1 serving optimization.
        tokens, (new_k, new_v, new_sc, new_vsc) = jax.lax.scan(
            body, tokens, blocks_xs)
        flow = jnp.zeros((b, f, cfg.out_dim, h, w), jnp.float32)
    elif kv_only:
        # commit/recache passes discard the flow output, but the uniform
        # layer scan forces XLA to compute the LAST layer's attention +
        # cross-attn + FFN anyway (~1/30 of the pass) and the head.  Run
        # the scan over L-1 layers and finish with a K/V-projection-only
        # tail; the returned flow is a placeholder of zeros.
        tokens, (new_k, new_v, new_sc, new_vsc) = jax.lax.scan(
            body, tokens, jax.tree.map(lambda a: a[:-1], blocks_xs))
        lp, ck, cv, xk, xv, csc, cvsc = jax.tree.map(
            lambda a: a[-1], blocks_xs)
        _, tk, tv, tsc, tvsc = _block_body(
            cfg, cache_cfg, f, tokens, lp, ck, cv, xk, xv,
            e0, rope_cos, rope_sin, kv_valid, offsets, write_frames,
            attn_impl, two_segment=two_segment, cache_sc=csc,
            skip_ranges=skip_ranges, cache_vsc=cvsc, kv_only=True,
            contig_writes=contig_writes)
        cat = lambda hd_, tl: (None if tl is None
                               else jnp.concatenate([hd_, tl[None]], axis=0))
        new_k, new_v = cat(new_k, tk), cat(new_v, tv)
        new_sc, new_vsc = cat(new_sc, tsc), cat(new_vsc, tvsc)
        # placeholder must match the real flow's shape (out_dim, not in_dim)
        flow = jnp.zeros((b, f, cfg.out_dim, h, w), jnp.float32)
    else:
        tokens, (new_k, new_v, new_sc, new_vsc) = jax.lax.scan(
            body, tokens, blocks_xs)
        out_tokens = _head(params, cfg, tokens, e, f)
        flow = unpatchify(out_tokens.astype(jnp.float32), cfg, f, h, w)

    base = kvc.advance(cache_cfg, cache, start_frame, f) if advance_counters else cache
    if two_segment:
        if not commit_writes:
            return flow, base
        # one in-place commit of all layers' block K/V (ys are
        # [L, B, F*fs, N, D]); XLA aliases the donated cache buffers.
        # int8 caches quantize the block here — once per block, not per
        # layer-forward.  NOTE: this is the [L]-stacked + int8-scales +
        # write_frames-subset generalization of ops.kv_cache.write_block_kv
        # (used by the per-layer SP path) — keep the ring-write convention
        # in sync with it.
        fs = cache_cfg.frame_seq
        ck, cv = cache.k, cache.v
        csk, csv = cache.k_scale, cache.v_scale
        zero = jnp.zeros([], jnp.int32)
        if contig_writes and _consecutive(write_frames):
            groups = [(write_frames[0], len(write_frames))]
        else:
            groups = [(i, 1) for i in write_frames]
        for i, nf in groups:
            kf = jax.lax.dynamic_slice_in_dim(new_k, i * fs, nf * fs, axis=2)
            vf = jax.lax.dynamic_slice_in_dim(new_v, i * fs, nf * fs, axis=2)
            start = (zero, zero, offsets[i], zero, zero)
            if int8_kv:
                kf, ksc = quantize_k_tokens(kf)
                csk = jax.lax.dynamic_update_slice(
                    csk, ksc.astype(csk.dtype), start[:-1])
            if int8_v:
                vf, vsc = quantize_k_tokens(vf)
                csv = jax.lax.dynamic_update_slice(
                    csv, vsc.astype(csv.dtype), start[:-1])
            ck = jax.lax.dynamic_update_slice(ck, kf.astype(ck.dtype), start)
            cv = jax.lax.dynamic_update_slice(cv, vf.astype(cv.dtype), start)
        return flow, dataclasses.replace(base, k=ck, v=cv,
                                         k_scale=csk, v_scale=csv)
    new_cache = dataclasses.replace(base, k=new_k, v=new_v, k_scale=new_sc,
                                    v_scale=new_vsc)
    return flow, new_cache
