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

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import DiTConfig
from ..ops.attention import attend, dense_attention
from ..ops.embeddings import sinusoidal_embedding_1d
from ..ops.rope import RopeTables, apply_rotary, rope_multipliers
from . import nn
from .dit import CrossKV, patchify, unpatchify, prepare_cross_kv  # noqa: F401


def bidirectional_forward(
    params: dict,
    cfg: DiTConfig,
    tables: RopeTables,
    x: jax.Array,  # [B, F, C, H, W]
    t: jax.Array,  # [B] one timestep per sample (model.py:694-698)
    cross_kv: CrossKV,
    attn_impl: str = "auto",
) -> jax.Array:
    """WanModel._forward (model.py:637-771) minus the unused classify/GAN
    branches.  Returns flow prediction [B, F, C, H, W]."""
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

    def block(xcur, layer_p, ck, cv):
        em = layer_p["modulation"][None].astype(e0.dtype) + e0  # [B, 6, dim]
        e_ = [em[:, i][:, None] for i in range(6)]  # [B, 1, dim]

        hh = nn.layer_norm(xcur, cfg.eps) * (1 + e_[1]) + e_[0]
        q = nn.linear(hh, layer_p["self_attn"]["q"])
        k = nn.linear(hh, layer_p["self_attn"]["k"])
        if cfg.qk_norm:
            q = nn.rms_norm(q, layer_p["self_attn"]["norm_q"]["scale"], cfg.eps)
            k = nn.rms_norm(k, layer_p["self_attn"]["norm_k"]["scale"], cfg.eps)
        v = nn.linear(hh, layer_p["self_attn"]["v"]).reshape(b, s, n, hd)
        q = apply_rotary(q.reshape(b, s, n, hd), rope_cos, rope_sin)
        k = apply_rotary(k.reshape(b, s, n, hd), rope_cos, rope_sin)
        y = attend(q, k, v, None, impl=attn_impl)
        y = nn.linear(y.reshape(b, s, n * hd), layer_p["self_attn"]["o"])
        xcur = xcur + y * e_[2]

        norm3 = layer_p.get("norm3")
        hh = nn.layer_norm(xcur, cfg.eps,
                           scale=None if norm3 is None else norm3["scale"],
                           bias=None if norm3 is None else norm3["bias"])
        cq = nn.linear(hh, layer_p["cross_attn"]["q"])
        if cfg.qk_norm:
            cq = nn.rms_norm(cq, layer_p["cross_attn"]["norm_q"]["scale"], cfg.eps)
        co = dense_attention(cq.reshape(b, s, n, hd), ck.astype(cq.dtype),
                             cv.astype(cq.dtype))
        xcur = xcur + nn.linear(co.reshape(b, s, n * hd), layer_p["cross_attn"]["o"])

        hh = nn.layer_norm(xcur, cfg.eps) * (1 + e_[4]) + e_[3]
        y = nn.linear(nn.gelu_tanh(nn.linear(hh, layer_p["ffn"]["fc1"])),
                      layer_p["ffn"]["fc2"])
        xcur = xcur + y * e_[5]
        return xcur, None

    def scan_body(carry, xs):
        layer_p, ck, cv = xs
        return block(carry, layer_p, ck, cv)

    tokens, _ = jax.lax.scan(
        scan_body, tokens, (params["blocks"], cross_kv.k, cross_kv.v)
    )

    # Head (model.py:439-466): e [B, dim], modulation [2, dim]
    hp_ = params["head"]
    em = hp_["modulation"][None].astype(e.dtype) + e[:, None]  # [B, 2, dim]
    y = nn.layer_norm(tokens, cfg.eps) * (1 + em[:, 1][:, None]) + em[:, 0][:, None]
    out = nn.linear(y, hp_["head"])
    return unpatchify(out.astype(jnp.float32), cfg, f, h, w)
