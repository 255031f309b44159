"""Ulysses-style sequence parallelism over the ``sp`` mesh axis.

TPU-native equivalent of the reference's vendored xDiT context-parallel path
(wan/distributed/xdit_context_parallel.py): tokens are sharded over SP ranks
(usp_dit_forward chunks dim 1, :131-133), attention runs via all-to-all
head-scatter / seq-gather (xFuserLongContextAttention, :179-184), RoPE is
applied per-rank slice (:52-57), and outputs are re-gathered.

Like the reference (wired only into the vanilla-Wan path, text2video.py:87-97),
SP targets the *bidirectional* teacher/critic model whose 32760-token global
attention is the only sequence long enough to warrant it — LongLive's decode
path attends at most ``local_attn_size`` frames, which fits one chip.

Implemented with ``shard_map`` + ``jax.lax.all_to_all`` over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import DiTConfig
from ..models import nn
from ..models.dit import CrossKV, patchify, unpatchify
from ..ops.attention import attend
from ..ops.embeddings import sinusoidal_embedding_1d
from ..ops.rope import RopeTables, apply_rotary, rope_multipliers


def ulysses_attention(q, k, v, axis_name: str = "sp", impl: str = "xla"):
    """All-to-all attention: inputs [B, S/P, N, D] sequence-sharded; returns
    the same layout.  Head count must be divisible by the axis size."""
    p = jax.lax.psum(1, axis_name)
    if p == 1:
        return attend(q, k, v, None, impl=impl)
    # [B, S/P, N, D] -> [B, S, N/P, D]: scatter heads, gather sequence
    a2a = functools.partial(
        jax.lax.all_to_all, axis_name=axis_name, split_axis=2, concat_axis=1,
        tiled=True,
    )
    qg, kg, vg = a2a(q), a2a(k), a2a(v)
    out = attend(qg, kg, vg, None, impl=impl)
    # back: scatter sequence, gather heads
    return jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def sp_bidirectional_forward(
    params: dict,
    cfg: DiTConfig,
    tables: RopeTables,
    mesh: Mesh,
    x: jax.Array,  # [B, F, C, H, W] (replicated input)
    t: jax.Array,  # [B]
    cross_kv: CrossKV,
    attn_impl: str = "xla",
) -> jax.Array:
    """Sequence-parallel WanModel forward: tokens sharded over ``sp``, self
    attention via Ulysses all-to-all, cross-attention local (context is
    replicated).  Numerically equals models.dit_bidirectional on one chip."""
    b, f, c, h, w = x.shape
    dtype = params["patch_embedding"]["kernel"].dtype
    hp, wp = h // cfg.patch_size[1], w // cfg.patch_size[2]
    s_full = f * hp * wp
    n, hd = cfg.num_heads, cfg.head_dim
    sp = mesh.shape["sp"]
    assert s_full % sp == 0 and n % sp == 0, (s_full, n, sp)

    tokens_full = nn.linear(patchify(x.astype(dtype), cfg), params["patch_embedding"])
    emb = sinusoidal_embedding_1d(cfg.freq_dim, t).astype(dtype)
    e = nn.linear(nn.silu(nn.linear(emb, params["time_embedding"]["fc1"])),
                  params["time_embedding"]["fc2"])
    e0 = nn.linear(nn.silu(e), params["time_projection"]["fc"]).reshape(b, 6, cfg.dim)
    rope_cos, rope_sin = rope_multipliers(tables, f, hp, wp, 0)

    def shard_fn(tokens, e0_, rope_c, rope_s, blocks, ck, cv):
        # tokens: [B, S/P, dim]; rope_c/s: [S/P, D/2] (sharded per rank)
        def body(xcur, xs):
            layer_p, ck_l, cv_l = xs
            em = layer_p["modulation"][None].astype(e0_.dtype) + e0_
            e_ = [em[:, i][:, None] for i in range(6)]
            s_loc = xcur.shape[1]

            hh = nn.layer_norm(xcur, cfg.eps) * (1 + e_[1]) + e_[0]
            q = nn.linear(hh, layer_p["self_attn"]["q"])
            k = nn.linear(hh, layer_p["self_attn"]["k"])
            if cfg.qk_norm:
                q = nn.rms_norm(q, layer_p["self_attn"]["norm_q"]["scale"], cfg.eps)
                k = nn.rms_norm(k, layer_p["self_attn"]["norm_k"]["scale"], cfg.eps)
            v = nn.linear(hh, layer_p["self_attn"]["v"]).reshape(b, s_loc, n, hd)
            q = apply_rotary(q.reshape(b, s_loc, n, hd), rope_c, rope_s,
                             layout=cfg.rope_layout)
            k = apply_rotary(k.reshape(b, s_loc, n, hd), rope_c, rope_s,
                             layout=cfg.rope_layout)
            y = ulysses_attention(q, k, v, "sp", impl=attn_impl)
            y = nn.linear(y.reshape(b, s_loc, n * hd), layer_p["self_attn"]["o"])
            xcur = xcur + y * e_[2]

            norm3 = layer_p.get("norm3")
            hh = nn.layer_norm(xcur, cfg.eps,
                               scale=None if norm3 is None else norm3["scale"],
                               bias=None if norm3 is None else norm3["bias"])
            cq = nn.linear(hh, layer_p["cross_attn"]["q"])
            if cfg.qk_norm:
                cq = nn.rms_norm(cq, layer_p["cross_attn"]["norm_q"]["scale"], cfg.eps)
            co = attend(cq.reshape(b, s_loc, n, hd), ck_l.astype(cq.dtype),
                        cv_l.astype(cq.dtype), None, impl=attn_impl)
            xcur = xcur + nn.linear(co.reshape(b, s_loc, n * hd),
                                    layer_p["cross_attn"]["o"])

            hh = nn.layer_norm(xcur, cfg.eps) * (1 + e_[4]) + e_[3]
            y = nn.linear(nn.gelu_tanh(nn.linear(hh, layer_p["ffn"]["fc1"])),
                          layer_p["ffn"]["fc2"])
            xcur = xcur + y * e_[5]
            return xcur, None

        out, _ = jax.lax.scan(body, tokens, (blocks, ck, cv))
        return out

    spec_tok = P(None, "sp", None)
    spec_rope = P("sp", None)
    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec_tok, P(), spec_rope, spec_rope, P(), P(), P()),
        out_specs=spec_tok,
        check_vma=False,
    )
    tokens = sharded(tokens_full, e0, rope_cos, rope_sin,
                     params["blocks"], cross_kv.k, cross_kv.v)

    hp_ = params["head"]
    em = hp_["modulation"][None].astype(e.dtype) + e[:, None]
    y = nn.layer_norm(tokens, cfg.eps) * (1 + em[:, 1][:, None]) + em[:, 0][:, None]
    out = nn.linear(y, hp_["head"])
    return unpatchify(out.astype(jnp.float32), cfg, f, h, w)
