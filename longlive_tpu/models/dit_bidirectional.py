"""Bidirectional Wan DiT — the DMD teacher (`real_score`) and critic
(`fake_score`) model (reference wan/modules/model.py:497-771).

Same parameter layout as the causal model (models.dit) — the torch
state_dicts are interchangeable (WanAttentionBlock vs CausalWanAttentionBlock
share weight names), so ``utils.checkpoint.dit_params_from_torch`` loads
both.  Differences from the causal path:
- one timestep per sample: modulation is per-sequence [B, 6, dim]
  (model.py:315-354) instead of per-frame;
- full bidirectional self-attention over all frames (no cache, no mask);
- RoPE always starts at frame 0.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import DiTConfig
from ..ops.attention import attend, dense_attention
from ..ops.embeddings import sinusoidal_embedding_1d
from ..ops.rope import RopeTables, apply_rotary, rope_multipliers
from . import nn
from .dit import CrossKV, patchify, prepare_cross_kv, unpatchify  # noqa: F401  (prepare_cross_kv re-exported for teacher/critic users)


def prepare_img_cross_kv(params: dict, cfg: DiTConfig,
                         clip_fea: jax.Array) -> CrossKV:
    """CLIP image features [B, 257, clip_dim] -> per-layer image-branch
    cross-attention K/V.  Folds the reference's img_emb MLPProj
    (model.py:469-482, 710-712) and each block's k_img/v_img + norm_k_img
    (model.py:234-256) into one precomputed CrossKV, symmetric with the text
    path's prepare_cross_kv."""
    p = params["img_emb"]
    dtype = params["patch_embedding"]["kernel"].dtype
    x = nn.layer_norm(clip_fea.astype(dtype), 1e-5, p["ln1"]["scale"],
                      p["ln1"]["bias"])
    x = nn.gelu_exact(nn.linear(x, p["fc1"]))
    x = nn.linear(x, p["fc2"])
    ctx = nn.layer_norm(x, 1e-5, p["ln2"]["scale"], p["ln2"]["bias"])
    n, hd = cfg.num_heads, cfg.head_dim
    bp = params["blocks"]["cross_attn"]

    def one_layer(layer_p):
        k = nn.linear(ctx, layer_p["k_img"])
        if cfg.qk_norm:
            k = nn.rms_norm(k, layer_p["norm_k_img"]["scale"], cfg.eps)
        v = nn.linear(ctx, layer_p["v_img"])
        b, s, _ = k.shape
        return k.reshape(b, s, n, hd), v.reshape(b, s, n, hd)

    k, v = jax.lax.map(one_layer, {kk: bp[kk] for kk in
                                   ("k_img", "v_img", "norm_k_img")})
    return CrossKV(k=k, v=v)


def _bidi_block(xcur, layer_p, ck, cv, e0, rope_cos, rope_sin,
                cfg: DiTConfig, attn_impl: str, cki=None, cvi=None,
                frame_seq=None):
    """One WanAttentionBlock (model.py:315-354) as a pure module-level
    function — shared by the scanned forward and the host-streamed forward
    (whose per-layer jit needs a stable function identity to compile once)."""
    b, s, _ = xcur.shape
    n, hd = cfg.num_heads, cfg.head_dim
    em = layer_p["modulation"][None].astype(e0.dtype) + e0  # [B, 6, dim]
    e_ = [em[:, i][:, None] for i in range(6)]  # [B, 1, dim]

    hh = nn.layer_norm(xcur, cfg.eps) * (1 + e_[1]) + e_[0]
    q = nn.linear(hh, layer_p["self_attn"]["q"])
    k = nn.linear(hh, layer_p["self_attn"]["k"])
    if cfg.qk_norm:
        q = nn.rms_norm(q, layer_p["self_attn"]["norm_q"]["scale"], cfg.eps)
        k = nn.rms_norm(k, layer_p["self_attn"]["norm_k"]["scale"], cfg.eps)
    v = nn.linear(hh, layer_p["self_attn"]["v"]).reshape(b, s, n, hd)
    q = apply_rotary(q.reshape(b, s, n, hd), rope_cos, rope_sin,
                     layout=cfg.rope_layout)
    k = apply_rotary(k.reshape(b, s, n, hd), rope_cos, rope_sin,
                     layout=cfg.rope_layout)
    y = attend(q, k, v, None, impl=attn_impl, frame_seq=frame_seq)
    y = nn.linear(y.reshape(b, s, n * hd), layer_p["self_attn"]["o"])
    xcur = xcur + y * e_[2]

    norm3 = layer_p.get("norm3")
    hh = nn.layer_norm(xcur, cfg.eps,
                       scale=None if norm3 is None else norm3["scale"],
                       bias=None if norm3 is None else norm3["bias"])
    cq = nn.linear(hh, layer_p["cross_attn"]["q"])
    if cfg.qk_norm:
        cq = nn.rms_norm(cq, layer_p["cross_attn"]["norm_q"]["scale"], cfg.eps)
    cq = cq.reshape(b, s, n, hd)
    co = attend(cq, ck.astype(cq.dtype), cv.astype(cq.dtype), None,
                impl=attn_impl, frame_seq=frame_seq)
    if cki is not None:
        # i2v: image-token attention added to the text attention output
        # before the shared output projection (model.py:255-263).
        co = co + attend(cq, cki.astype(cq.dtype), cvi.astype(cq.dtype),
                         None, impl=attn_impl, frame_seq=frame_seq)
    xcur = xcur + nn.linear(co.reshape(b, s, n * hd), layer_p["cross_attn"]["o"])

    hh = nn.layer_norm(xcur, cfg.eps) * (1 + e_[4]) + e_[3]
    y = nn.linear(nn.gelu_tanh(nn.linear(hh, layer_p["ffn"]["fc1"])),
                  layer_p["ffn"]["fc2"])
    return xcur + y * e_[5]


def bidirectional_forward(
    params: dict,
    cfg: DiTConfig,
    tables: RopeTables,
    x: jax.Array,  # [B, F, C, H, W]
    t: jax.Array,  # [B] one timestep per sample (model.py:694-698)
    cross_kv: CrossKV,
    attn_impl: str = "auto",
    cross_kv_img: "CrossKV | None" = None,  # i2v image branch (model.py:243-263)
    remat_layers: bool = False,
) -> jax.Array:
    """WanModel._forward (model.py:637-771) minus the unused classify/GAN
    branches.  Returns flow prediction [B, F, C, H, W].

    With ``cross_kv_img`` set (model_type='i2v'), each block's cross
    attention adds a second attention over the 257 CLIP image tokens to the
    text attention output before the output projection
    (WanI2VCrossAttention, model.py:240-266)."""
    b, f, c, h, w = x.shape
    dtype = params["patch_embedding"]["kernel"].dtype
    tokens = nn.linear(patchify(x.astype(dtype), cfg), params["patch_embedding"])
    s = tokens.shape[1]
    n, hd = cfg.num_heads, cfg.head_dim

    emb = sinusoidal_embedding_1d(cfg.freq_dim, t).astype(dtype)
    e = nn.linear(nn.silu(nn.linear(emb, params["time_embedding"]["fc1"])),
                  params["time_embedding"]["fc2"])  # [B, dim]
    e0 = nn.linear(nn.silu(e), params["time_projection"]["fc"]).reshape(
        b, 6, cfg.dim
    )

    hp, wp = h // cfg.patch_size[1], w // cfg.patch_size[2]
    rope_cos, rope_sin = rope_multipliers(tables, f, hp, wp, 0)

    def block(xcur, layer_p, ck, cv, cki=None, cvi=None):
        return _bidi_block(xcur, layer_p, ck, cv, e0, rope_cos, rope_sin,
                           cfg, attn_impl, cki, cvi,
                           frame_seq=hp * wp), None

    if cross_kv_img is not None:
        def scan_body(carry, xs):
            layer_p, ck, cv, cki, cvi = xs
            return block(carry, layer_p, ck, cv, cki, cvi)

        tokens, _ = jax.lax.scan(
            jax.checkpoint(scan_body) if remat_layers else scan_body, tokens,
            (params["blocks"], cross_kv.k, cross_kv.v,
             cross_kv_img.k, cross_kv_img.v))
    else:
        def scan_body(carry, xs):
            layer_p, ck, cv = xs
            return block(carry, layer_p, ck, cv)

        # remat_layers: training callers (critic denoising loss) checkpoint
        # each layer so backward stores only the carry chain, not the f32
        # FFN/attention residual stacks (see dit.dit_forward_full)
        tokens, _ = jax.lax.scan(
            jax.checkpoint(scan_body) if remat_layers else scan_body,
            tokens, (params["blocks"], cross_kv.k, cross_kv.v)
        )

    # Head (model.py:439-466): e [B, dim], modulation [2, dim]
    hp_ = params["head"]
    em = hp_["modulation"][None].astype(e.dtype) + e[:, None]  # [B, 2, dim]
    y = nn.layer_norm(tokens, cfg.eps) * (1 + em[:, 1][:, None]) + em[:, 0][:, None]
    out = nn.linear(y, hp_["head"])
    return unpatchify(out.astype(jnp.float32), cfg, f, h, w)


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl",
                                              "frame_seq"))
def _bidi_block_step(xcur, layer_p, ck, cv, e0, rope_cos, rope_sin,
                     cfg: DiTConfig, attn_impl: str, frame_seq=None):
    return _bidi_block(xcur, layer_p, ck, cv, e0, rope_cos, rope_sin,
                       cfg, attn_impl, frame_seq=frame_seq)


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl",
                                              "frame_seq"))
def _bidi_block_step_ctx(xcur, layer_p, ctx, e0, rope_cos, rope_sin,
                         cfg: DiTConfig, attn_impl: str, frame_seq=None):
    """Streamed-layer step that derives the layer's cross-attention K/V from
    the embedded text ``ctx`` inline (prepare_cross_kv's per-layer body) —
    so a host-streamed model never materializes [L, ...] cross arrays."""
    n, hd = cfg.num_heads, cfg.head_dim
    ck = nn.linear(ctx, layer_p["cross_attn"]["k"])
    if cfg.qk_norm:
        ck = nn.rms_norm(ck, layer_p["cross_attn"]["norm_k"]["scale"], cfg.eps)
    cv = nn.linear(ctx, layer_p["cross_attn"]["v"])
    b, s, _ = ck.shape
    return _bidi_block(xcur, layer_p, ck.reshape(b, s, n, hd),
                       cv.reshape(b, s, n, hd), e0, rope_cos, rope_sin,
                       cfg, attn_impl, frame_seq=frame_seq)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _bidi_prologue(params, cfg: DiTConfig, tables: RopeTables, x, t):
    b, f, c, h, w = x.shape
    dtype = params["patch_embedding"]["kernel"].dtype
    tokens = nn.linear(patchify(x.astype(dtype), cfg),
                       params["patch_embedding"])
    emb = sinusoidal_embedding_1d(cfg.freq_dim, t).astype(dtype)
    e = nn.linear(nn.silu(nn.linear(emb, params["time_embedding"]["fc1"])),
                  params["time_embedding"]["fc2"])
    e0 = nn.linear(nn.silu(e), params["time_projection"]["fc"]).reshape(
        b, 6, cfg.dim)
    hp, wp = h // cfg.patch_size[1], w // cfg.patch_size[2]
    rope_cos, rope_sin = rope_multipliers(tables, f, hp, wp, 0)
    return tokens, e, e0, rope_cos, rope_sin


@functools.partial(jax.jit, static_argnames=("cfg", "f", "h", "w"))
def _bidi_head(head_p, cfg: DiTConfig, tokens, e, f: int, h: int, w: int):
    em = head_p["modulation"][None].astype(e.dtype) + e[:, None]
    y = (nn.layer_norm(tokens, cfg.eps) * (1 + em[:, 1][:, None])
         + em[:, 0][:, None])
    out = nn.linear(y, head_p["head"])
    return unpatchify(out.astype(jnp.float32), cfg, f, h, w)


def bidirectional_forward_streamed(
    params: dict,
    cfg: DiTConfig,
    tables: RopeTables,
    x: jax.Array,  # [B, F, C, H, W]
    t: jax.Array,  # [B]
    cross_kv: "CrossKV | None" = None,
    attn_impl: str = "auto",
    context: "jax.Array | None" = None,  # raw T5 features [B, 512, text_dim]
    context_dtype=None,  # embed_text dtype; default = the params' dtype
    context_embedded: bool = False,  # context already through embed_text
) -> jax.Array:
    """`bidirectional_forward` with per-access weight streaming — the
    TPU-native DynamicSwapInstaller path (reference utils/memory.py:13-58,
    applied to the DiT for the <40 GB inference mode, inference.py:62).

    ``params["blocks"]`` leaves live on HOST (see
    utils.memory.blocks_to_host); each layer's slice is device_put one
    layer ahead of its compute (utils.memory.stream_scan), so peak HBM
    holds the embeddings/head plus TWO layers of block weights.  Numerics
    match `bidirectional_forward` exactly (same per-layer math, jitted with
    stable identity — one compile total).  Inference-only: gradients do not
    flow through the host round-trip.

    Pass EITHER ``cross_kv`` (precomputed [L, ...] arrays) OR ``context``
    (raw T5 prompt features): with ``context`` each layer's cross K/V is
    derived inline from its streamed weights, so no [L, ...] cross arrays
    exist — the layout for very large teachers (14B) where even the
    stacked cross K/V is significant HBM.
    """
    from ..utils.memory import stream_scan

    if cross_kv is None and context is None:
        raise ValueError(
            "bidirectional_forward_streamed needs either cross_kv "
            "(precomputed [L, ...] K/V) or context (raw T5 features)")

    b, f, c, h, w = x.shape
    small = {k: params[k] for k in
             ("patch_embedding", "time_embedding", "time_projection")}
    tokens, e, e0, rope_cos, rope_sin = _bidi_prologue(small, cfg, tables, x, t)

    if context is not None:
        if context_embedded:
            ctx = context  # hoisted by the caller (constant across steps)
        else:
            from .dit import embed_text

            ctx = embed_text(params, context, context_dtype or
                             params["patch_embedding"]["kernel"].dtype)

        fs = (h // cfg.patch_size[1]) * (w // cfg.patch_size[2])

        def step(carry, layer_p):
            return _bidi_block_step_ctx(carry, layer_p, ctx, e0, rope_cos,
                                        rope_sin, cfg, attn_impl,
                                        frame_seq=fs)

        tokens = stream_scan(step, tokens, params["blocks"])
    else:
        fs = (h // cfg.patch_size[1]) * (w // cfg.patch_size[2])

        def step(carry, xs):
            layer_p, ck, cv = xs
            return _bidi_block_step(carry, layer_p, ck, cv, e0, rope_cos,
                                    rope_sin, cfg, attn_impl, frame_seq=fs)

        tokens = stream_scan(step, tokens,
                             (params["blocks"], cross_kv.k, cross_kv.v))
    return _bidi_head(params["head"], cfg, tokens, e, f, h, w)


# ---------------------------------------------------------------------------
# GAN / classify branch (reference model.py:357-494, 729-760;
# wan_wrapper.py:153-173 `adding_cls_branch`) — taps hidden states at blocks
# 13/21/29, pools each through a GanAttentionBlock against a learned
# register token, and classifies the concatenated tokens.  Plumbed-but-unused
# by the shipped LongLive configs, kept for parity with the GAN ablations.

GAN_TAP_LAYERS = (13, 21, 29)


def init_cls_branch(rng: jax.Array, cfg: DiTConfig, num_class: int = 4,
                    time_embed_dim: int = 0, dtype=jnp.float32) -> dict:
    d = cfg.dim
    keys = iter(jax.random.split(rng, 16))
    n_reg = len(GAN_TAP_LAYERS)

    def gan_block():
        return {
            "norm3": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "cross_attn": {
                "q": nn.init_linear(next(keys), d, d, dtype=dtype),
                "k": nn.init_linear(next(keys), d, d, dtype=dtype),
                "v": nn.init_linear(next(keys), d, d, dtype=dtype),
                "o": nn.init_linear(next(keys), d, d, dtype=dtype),
                "norm_q": {"scale": jnp.ones((d,), dtype)},
                "norm_k": {"scale": jnp.ones((d,), dtype)},
            },
            "ffn": {
                "fc1": nn.init_linear(next(keys), d, cfg.ffn_dim, dtype=dtype),
                "fc2": nn.init_linear(next(keys), cfg.ffn_dim, d, dtype=dtype),
            },
        }

    in_dim = d * n_reg + time_embed_dim
    return {
        "register_tokens": jax.random.normal(next(keys), (n_reg, d), dtype) * 0.02,
        "register_norm": {"scale": jnp.ones((d,), dtype)},
        "gan_blocks": [gan_block() for _ in range(n_reg)],
        "cls_pred": {
            "norm": {"scale": jnp.ones((in_dim,), dtype),
                     "bias": jnp.zeros((in_dim,), dtype)},
            "fc1": nn.init_linear(next(keys), in_dim, d, dtype=dtype),
            "fc2": nn.init_linear(next(keys), d, num_class, dtype=dtype),
        },
    }


def _gan_cross_attn(p: dict, cfg: DiTConfig, x: jax.Array, token: jax.Array):
    """WanGanCrossAttention (model.py:197-221): query = register token,
    keys/values = hidden states."""
    b, s, _ = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    q = nn.rms_norm(nn.linear(token, p["q"]), p["norm_q"]["scale"], cfg.eps)
    k = nn.rms_norm(nn.linear(x, p["k"]), p["norm_k"]["scale"], cfg.eps)
    v = nn.linear(x, p["v"])
    q = q.reshape(b, 1, -1, hd)  # 1 query token over n*? heads (model.py:210)
    o = dense_attention(q, k.reshape(b, s, n, hd), v.reshape(b, s, n, hd))
    return nn.linear(o.reshape(b, 1, -1), p["o"])


def _gan_block(p: dict, cfg: DiTConfig, x: jax.Array, token: jax.Array):
    """GanAttentionBlock (model.py:397-436)."""
    h = nn.layer_norm(x, cfg.eps, p["norm3"]["scale"], p["norm3"]["bias"])
    tok = token + _gan_cross_attn(p["cross_attn"], cfg, h, token)
    y = nn.linear(nn.gelu_tanh(nn.linear(nn.layer_norm(tok, cfg.eps),
                                         p["ffn"]["fc1"])), p["ffn"]["fc2"])
    return y + tok


def bidirectional_forward_classify(
    params: dict,
    cls_params: dict,
    cfg: DiTConfig,
    tables: RopeTables,
    x: jax.Array,
    t: jax.Array,
    cross_kv: CrossKV,
    concat_time_embeddings: bool = False,
    attn_impl: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """classify_mode forward (model.py:637-771 with classify_mode=True):
    returns (flow_pred, logits).  The layer scan is segmented at the tap
    layers so hidden states can be pooled without materializing all 30."""
    b, f, c, h, w = x.shape
    dtype = params["patch_embedding"]["kernel"].dtype
    tokens = nn.linear(patchify(x.astype(dtype), cfg), params["patch_embedding"])
    s = tokens.shape[1]
    n, hd = cfg.num_heads, cfg.head_dim

    emb = sinusoidal_embedding_1d(cfg.freq_dim, t).astype(dtype)
    e = nn.linear(nn.silu(nn.linear(emb, params["time_embedding"]["fc1"])),
                  params["time_embedding"]["fc2"])
    e0 = nn.linear(nn.silu(e), params["time_projection"]["fc"]).reshape(b, 6, cfg.dim)
    hp, wp = h // cfg.patch_size[1], w // cfg.patch_size[2]
    rope_cos, rope_sin = rope_multipliers(tables, f, hp, wp, 0)

    def layer(xcur, layer_p, ck, cv):
        em = layer_p["modulation"][None].astype(e0.dtype) + e0
        e_ = [em[:, i][:, None] for i in range(6)]
        hh = nn.layer_norm(xcur, cfg.eps) * (1 + e_[1]) + e_[0]
        q = nn.rms_norm(nn.linear(hh, layer_p["self_attn"]["q"]),
                        layer_p["self_attn"]["norm_q"]["scale"], cfg.eps)
        k = nn.rms_norm(nn.linear(hh, layer_p["self_attn"]["k"]),
                        layer_p["self_attn"]["norm_k"]["scale"], cfg.eps)
        v = nn.linear(hh, layer_p["self_attn"]["v"]).reshape(b, s, n, hd)
        q = apply_rotary(q.reshape(b, s, n, hd), rope_cos, rope_sin,
                         layout=cfg.rope_layout)
        k = apply_rotary(k.reshape(b, s, n, hd), rope_cos, rope_sin,
                         layout=cfg.rope_layout)
        y = attend(q, k, v, None, impl=attn_impl)
        xcur = xcur + nn.linear(y.reshape(b, s, n * hd), layer_p["self_attn"]["o"]) * e_[2]
        norm3 = layer_p.get("norm3")
        hh = nn.layer_norm(xcur, cfg.eps,
                           scale=None if norm3 is None else norm3["scale"],
                           bias=None if norm3 is None else norm3["bias"])
        cq = nn.rms_norm(nn.linear(hh, layer_p["cross_attn"]["q"]),
                         layer_p["cross_attn"]["norm_q"]["scale"], cfg.eps)
        co = attend(cq.reshape(b, s, n, hd), ck.astype(cq.dtype),
                    cv.astype(cq.dtype), None, impl=attn_impl)
        xcur = xcur + nn.linear(co.reshape(b, s, n * hd), layer_p["cross_attn"]["o"])
        hh = nn.layer_norm(xcur, cfg.eps) * (1 + e_[4]) + e_[3]
        y = nn.linear(nn.gelu_tanh(nn.linear(hh, layer_p["ffn"]["fc1"])),
                      layer_p["ffn"]["fc2"])
        return xcur + y * e_[5]

    def run_segment(tokens, lo, hi):
        seg = jax.tree.map(lambda a: a[lo:hi], params["blocks"])
        ck_seg, cv_seg = cross_kv.k[lo:hi], cross_kv.v[lo:hi]

        def body(carry, xs):
            lp, ck, cv = xs
            return layer(carry, lp, ck, cv), None

        out, _ = jax.lax.scan(body, tokens, (seg, ck_seg, cv_seg))
        return out

    registers = nn.rms_norm(cls_params["register_tokens"][None],
                            cls_params["register_norm"]["scale"], 1e-6)
    registers = jnp.broadcast_to(registers, (b, *registers.shape[1:])).astype(dtype)

    taps = []
    lo = 0
    for i, tap in enumerate(GAN_TAP_LAYERS):
        tokens = run_segment(tokens, lo, tap + 1)
        taps.append(_gan_block(cls_params["gan_blocks"][i], cfg, tokens,
                               registers[:, i : i + 1]))
        lo = tap + 1
    if lo < cfg.num_layers:
        tokens = run_segment(tokens, lo, cfg.num_layers)

    final = jnp.concatenate(taps, axis=1)  # [B, 3, dim]
    cp = cls_params["cls_pred"]
    if concat_time_embeddings:
        final = jnp.concatenate([final, 10.0 * e[:, None, :]], axis=1)
    flat = final.reshape(b, -1)
    hh = nn.layer_norm(flat, 1e-5, cp["norm"]["scale"], cp["norm"]["bias"])
    logits = nn.linear(nn.silu(nn.linear(hh, cp["fc1"])), cp["fc2"])

    hp_ = params["head"]
    em = hp_["modulation"][None].astype(e.dtype) + e[:, None]
    y = nn.layer_norm(tokens, cfg.eps) * (1 + em[:, 1][:, None]) + em[:, 0][:, None]
    out = nn.linear(y, hp_["head"])
    return unpatchify(out.astype(jnp.float32), cfg, f, h, w), logits
