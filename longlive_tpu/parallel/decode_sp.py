"""Ulysses-style sequence parallelism for the CACHED causal decode path.

The reference has no distributed inference beyond per-rank prompt sharding
(its vendored Ulysses SP, wan/distributed/xdit_context_parallel.py, is wired
only into the bidirectional vanilla-Wan sampler).  On TPU the natural way to
make one video render faster than one chip allows is to shard the AR block
step itself over the ``sp`` mesh axis:

- tokens are sharded on the WITHIN-FRAME axis (each device owns a contiguous
  slice of every frame's ``frame_seq`` tokens), so the per-frame adaLN
  modulation (causal_model.py:413-477) and the frame-offset KV-cache writes
  keep their exact single-chip structure;
- all linears / norms / FFN run on the token shard with full feature width —
  no parameter sharding, no all-reduces;
- self-attention head-scatters + seq-gathers via two pairs of
  ``jax.lax.all_to_all`` over ICI (the xFuserLongContextAttention pattern,
  xdit_context_parallel.py:179-184): each device attends ``num_heads / P``
  heads over the FULL [sink ++ window] KV, so the KV ring cache lives
  head-sharded and its ring index math is untouched;
- cross-attention needs no communication at all: its K/V depend only on the
  prompt, so they stay replicated and every device attends its token shard
  with all heads;
- the head output is all-gathered ([B, S, 64] — trivially small) so the
  denoise loop's scheduler math stays replicated.

Per-device per-layer comm is 4 all-to-alls of [B, S/P, N, D]-sized shards
(~11 MB at the 4680-token block), which rides ICI at a few hundred µs — vs
~86 MB/layer for a megatron TP layout of the same model.  Numerically equal
to ``models.dit.dit_forward_cached`` (token order is restored exactly by the
device-order concatenation of contiguous within-frame slices).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CacheConfig, DiTConfig
from ..models import nn
from ..models.dit import (
    CrossKV,
    _cross_attention_layer,
    _flat,
    _head,
    _per_frame,
    patchify,
    time_modulation,
    unpatchify,
)
from ..ops import kv_cache as kvc
from ..ops.attention import attend
from ..ops.rope import RopeTables, apply_rotary, rope_multipliers


def _a2a_heads(x5: jax.Array, axis_name: str) -> jax.Array:
    """[B, F, fs/P, N, D] -> [B, F, fs, N/P, D]: scatter heads, gather the
    within-frame token axis (device order == slice order, so the full frame
    comes back in exact token order)."""
    return jax.lax.all_to_all(x5, axis_name, split_axis=3, concat_axis=2,
                              tiled=True)


def _a2a_tokens(x5: jax.Array, axis_name: str) -> jax.Array:
    """[B, F, fs, N/P, D] -> [B, F, fs/P, N, D]: inverse of :func:`_a2a_heads`."""
    return jax.lax.all_to_all(x5, axis_name, split_axis=2, concat_axis=3,
                              tiled=True)


def sp_dit_forward_cached(
    params: dict,
    cfg: DiTConfig,
    cache_cfg: CacheConfig,
    tables: RopeTables,
    mesh: Mesh,
    x: jax.Array,  # [B, F, C, H, W] noisy latents (replicated)
    t: jax.Array,  # [B, F]
    cross_kv: CrossKV,
    cache: kvc.KVCache,  # k/v sharded on the head axis over ``sp``
    start_frame: jax.Array,
    *,
    kv_valid: Optional[jax.Array] = None,
    offsets: Optional[jax.Array] = None,
    write_frames: Optional[Tuple[int, ...]] = None,
    attn_impl: str = "auto",
    advance_counters: bool = True,
    window_frames: Optional[int] = None,
    axis_name: str = "sp",
) -> Tuple[jax.Array, kvc.KVCache]:
    """Sequence-parallel equivalent of ``models.dit.dit_forward_cached``.

    Same contract: one cached forward over a block of ``F`` frames; returns
    (flow_pred [B, F, C, H, W] f32 replicated, cache' with this block's K/V
    written).  ``cache.k/v`` must be sharded ``P(None, None, None, 'sp',
    None)`` on ``mesh`` (see :func:`shard_cache`).
    """
    b, f, c, h, w = x.shape
    dtype = params["patch_embedding"]["kernel"].dtype
    n, hd = cfg.num_heads, cfg.head_dim
    hp, wp = h // cfg.patch_size[1], w // cfg.patch_size[2]
    fs = hp * wp
    sp = mesh.shape[axis_name]
    assert fs % sp == 0 and n % sp == 0, (fs, n, sp)

    tokens_pt = patchify(x.astype(dtype), cfg).reshape(b, f, fs, -1)
    e, e0 = time_modulation(params, cfg, t, dtype)
    rope_cos, rope_sin = rope_multipliers(tables, f, hp, wp, start_frame)
    rope_cos = rope_cos.reshape(f, fs, -1)
    rope_sin = rope_sin.reshape(f, fs, -1)

    if offsets is None:
        offsets = kvc.block_write_offsets(cache_cfg, cache, start_frame, f)
    if kv_valid is None:
        kv_valid = kvc.validity_mask(cache_cfg, cache, start_frame, f,
                                     window_frames=window_frames)
    if write_frames is None:
        write_frames = tuple(range(f))
    cfs = cache_cfg.frame_seq

    def body(tokens_pt, e0, e, rope_cos, rope_sin, params, cross_k, cross_v,
             cache_k, cache_v, kv_valid, offsets):
        # tokens_pt: [B, F, fs/P, pt]; cache_k/v: [L, B, S_cache, N/P, D]
        fsl = tokens_pt.shape[2]
        nloc = cache_k.shape[3]
        rc = rope_cos.reshape(f * fsl, -1)
        rs = rope_sin.reshape(f * fsl, -1)
        xcur = nn.linear(tokens_pt.reshape(b, f * fsl, -1),
                         params["patch_embedding"])

        def scan_body(carry, xs):
            xc = carry
            layer_p, ck, cv, lk, lv = xs
            mod = layer_p["modulation"][None, None]
            em = mod.astype(e0.dtype) + e0
            e_ = [em[:, :, i][:, :, None] for i in range(6)]

            # self-attention with per-frame adaLN on the token shard
            hh = _per_frame(nn.layer_norm(xc, cfg.eps), f)
            hh = _flat(hh * (1 + e_[1]) + e_[0])
            s_loc = hh.shape[1]
            q = nn.linear(hh, layer_p["self_attn"]["q"])
            k = nn.linear(hh, layer_p["self_attn"]["k"])
            v = nn.linear(hh, layer_p["self_attn"]["v"]).reshape(b, s_loc, n, hd)
            q_pre = k_pre = None
            if cfg.qk_norm:
                q_pre = nn.rms_scale(q, layer_p["self_attn"]["norm_q"]["scale"], cfg.eps)
                k_pre = nn.rms_scale(k, layer_p["self_attn"]["norm_k"]["scale"], cfg.eps)
            q = apply_rotary(q.reshape(b, s_loc, n, hd), rc, rs,
                             premul=q_pre, layout=cfg.rope_layout)
            k = apply_rotary(k.reshape(b, s_loc, n, hd), rc, rs,
                             premul=k_pre, layout=cfg.rope_layout)

            # head-scatter / within-frame-gather
            qg = _a2a_heads(q.reshape(b, f, fsl, n, hd), axis_name)
            kg = _a2a_heads(k.reshape(b, f, fsl, n, hd), axis_name)
            vg = _a2a_heads(v.reshape(b, f, fsl, n, hd), axis_name)
            s_full = f * fs
            qg = qg.reshape(b, s_full, nloc, hd)
            kg = kg.reshape(b, s_full, nloc, hd)
            vg = vg.reshape(b, s_full, nloc, hd)

            new_k, new_v = lk, lv
            for i in write_frames:
                kf = jax.lax.dynamic_slice_in_dim(kg, i * cfs, cfs, axis=1)
                vf = jax.lax.dynamic_slice_in_dim(vg, i * cfs, cfs, axis=1)
                new_k = jax.lax.dynamic_update_slice_in_dim(
                    new_k, kf.astype(new_k.dtype), offsets[i], axis=1)
                new_v = jax.lax.dynamic_update_slice_in_dim(
                    new_v, vf.astype(new_v.dtype), offsets[i], axis=1)

            y = attend(qg, new_k.astype(qg.dtype), new_v.astype(qg.dtype),
                       kv_valid, impl=attn_impl, frame_seq=fs)
            y = _a2a_tokens(y.reshape(b, f, fs, nloc, hd), axis_name)
            y = nn.linear(y.reshape(b, s_loc, n * hd), layer_p["self_attn"]["o"])
            xc = xc + _flat(_per_frame(y, f) * e_[2])

            # cross-attention: K/V replicated, all heads local — no comm
            norm3 = layer_p.get("norm3")
            hh = nn.layer_norm(xc, cfg.eps,
                               scale=None if norm3 is None else norm3["scale"],
                               bias=None if norm3 is None else norm3["bias"])
            xc = xc + _cross_attention_layer(layer_p["cross_attn"], cfg, hh, ck, cv)

            # ffn with per-frame adaLN
            hh = _per_frame(nn.layer_norm(xc, cfg.eps), f)
            hh = _flat(hh * (1 + e_[4]) + e_[3])
            y = nn.linear(nn.gelu_tanh(nn.linear(hh, layer_p["ffn"]["fc1"])),
                          layer_p["ffn"]["fc2"])
            xc = xc + _flat(_per_frame(y, f) * e_[5])
            return xc, (new_k, new_v)

        xcur, (new_k, new_v) = jax.lax.scan(
            scan_body, xcur,
            (params["blocks"], cross_k, cross_v, cache_k, cache_v))

        out_tok = _head(params, cfg, xcur, e, f)  # [B, F*fs/P, out*pt]
        out5 = out_tok.reshape(b, f, fsl, -1)
        out_full = jax.lax.all_gather(out5, axis_name, axis=2, tiled=True)
        return out_full.reshape(b, f * fs, -1), new_k, new_v

    shard = P(None, None, axis_name, None)
    head_shard = P(None, None, None, axis_name, None)
    out_tokens, new_k, new_v = shard_map(
        body, mesh=mesh,
        in_specs=(shard, P(), P(), P(None, axis_name, None),
                  P(None, axis_name, None), P(), P(), P(),
                  head_shard, head_shard, P(), P()),
        out_specs=(P(), head_shard, head_shard),
        check_vma=False,
    )(tokens_pt, e0, e, rope_cos, rope_sin, params, cross_kv.k, cross_kv.v,
      cache.k, cache.v, kv_valid, offsets)

    flow = unpatchify(out_tokens.astype(jnp.float32), cfg, f, h, w)
    base = kvc.advance(cache_cfg, cache, start_frame, f) if advance_counters else cache
    new_cache = dataclasses.replace(base, k=new_k, v=new_v)
    return flow, new_cache


def shard_cache(cache: kvc.KVCache, mesh: Mesh, axis_name: str = "sp") -> kvc.KVCache:
    """Places a KVCache with k/v head-sharded over ``axis_name`` (scalars
    replicated)."""
    kv_sh = NamedSharding(mesh, P(None, None, None, axis_name, None))
    rep = NamedSharding(mesh, P())
    return kvc.KVCache(
        k=jax.device_put(cache.k, kv_sh),
        v=jax.device_put(cache.v, kv_sh),
        ring_base=jax.device_put(cache.ring_base, rep),
        sink_filled=jax.device_put(cache.sink_filled, rep),
        ring_filled=jax.device_put(cache.ring_filled, rep),
        k_scale=None if cache.k_scale is None else jax.device_put(
            cache.k_scale, NamedSharding(mesh, P(None, None, None, axis_name))),
    )
