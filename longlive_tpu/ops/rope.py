"""3D factorized rotary position embeddings for the Wan DiT.

Functional port of the reference RoPE semantics:
- table construction (reference wan/modules/model.py:29-36, 608-613):
  head_dim d=128 is split into 3 groups of complex pairs sized
  [c - 2*(c//3), c//3, c//3] with c = d//2  ->  (22, 21, 21) for (frame, h, w).
- application (wan/modules/model.py:40-67 `rope_apply` and
  wan/modules/causal_model.py:32-60 `causal_rope_apply`): each token at grid
  position (f, h, w) is rotated by exp(i * pos * theta^(-2j/dim_g)) per group;
  the *frame* position is offset by an absolute ``start_frame`` so that RoPE
  positions keep growing even while the KV cache rolls
  (causal_model.py:206-211 — this is what makes frame-sink attention work).

The reference computes the rotation in float64; we build the angle tables in
float64 on host (numpy) and apply the rotation in float32 on device.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _rope_cos_sin(max_seq_len: int, dim: int, theta: float = 10000.0):
    """cos/sin tables of shape [max_seq_len, dim//2] (ref model.py:29-36)."""
    inv = 1.0 / np.power(theta, np.arange(0, dim, 2, dtype=np.float64) / dim)
    ang = np.outer(np.arange(max_seq_len, dtype=np.float64), inv)
    return np.cos(ang), np.sin(ang)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RopeTables:
    """Precomputed per-axis rotation tables. Frame table covers absolute frame
    positions [0, max_pos); h/w tables cover the spatial grid."""

    cos_f: jax.Array  # [max_pos, c_f]
    sin_f: jax.Array
    cos_h: jax.Array  # [max_pos, c_h]
    sin_h: jax.Array
    cos_w: jax.Array  # [max_pos, c_w]
    sin_w: jax.Array


def make_rope_tables(
    head_dim: int = 128, max_pos: int = 1024, theta: float = 10000.0
) -> RopeTables:
    c = head_dim // 2
    c_h = c // 3
    c_f = c - 2 * c_h
    cf, sf = _rope_cos_sin(max_pos, 2 * c_f, theta)
    ch, sh = _rope_cos_sin(max_pos, 2 * c_h, theta)
    cw, sw = _rope_cos_sin(max_pos, 2 * c_h, theta)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return RopeTables(f32(cf), f32(sf), f32(ch), f32(sh), f32(cw), f32(sw))


def rope_multipliers(
    tables: RopeTables, f: int, h: int, w: int, start_frame: jax.Array | int = 0
):
    """Builds per-token (cos, sin) of shape [f*h*w, head_dim//2] for a grid of
    ``f`` frames (starting at absolute frame ``start_frame``) by ``h`` x ``w``
    spatial positions.  ``f, h, w`` are static; ``start_frame`` may be traced.
    """
    start = jnp.asarray(start_frame, jnp.int32)
    cf = jax.lax.dynamic_slice_in_dim(tables.cos_f, start, f, axis=0)
    sf = jax.lax.dynamic_slice_in_dim(tables.sin_f, start, f, axis=0)
    ch, sh = tables.cos_h[:h], tables.sin_h[:h]
    cw, sw = tables.cos_w[:w], tables.sin_w[:w]

    def grid_cat(af, ah, aw):
        # [f,1,1,cf] ++ [1,h,1,ch] ++ [1,1,w,cw] broadcast -> [f,h,w,c]
        parts = [
            jnp.broadcast_to(af[:, None, None, :], (f, h, w, af.shape[-1])),
            jnp.broadcast_to(ah[None, :, None, :], (f, h, w, ah.shape[-1])),
            jnp.broadcast_to(aw[None, None, :, :], (f, h, w, aw.shape[-1])),
        ]
        return jnp.concatenate(parts, axis=-1).reshape(f * h * w, -1)

    return grid_cat(cf, ch, cw), grid_cat(sf, sh, sw)


def halfsplit_qk_perm(head_dim: int, num_heads: int = 1) -> np.ndarray:
    """Gather indices turning interleaved complex pairs (re0, im0, re1, ...)
    into the half-split order (re0..re_{c-1}, im0..im_{c-1}) within each
    head: ``x_new[j] = x[perm[j]]``.  Applied to the OUTPUT features of the
    q/k projections (kernel columns, bias, qk-norm gamma) at param-build
    time, it moves the rotation into the half-split layout with ZERO runtime
    permutation — attention is invariant to any channel permutation applied
    consistently to q and k, so model outputs are bit-unchanged (up to f32
    summation order)."""
    g = np.concatenate([np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)])
    return np.concatenate([h * head_dim + g for h in range(num_heads)])


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array,
                 premul: jax.Array | None = None,
                 layout: str = "interleaved") -> jax.Array:
    """Rotates ``x`` of shape [B, S, N, D] by per-token multipliers
    (cos, sin) of shape [S, D//2].

    ``layout="interleaved"``: complex pairs interleaved along D as (re, im)
    — matching torch.view_as_complex of a [..., D//2, 2] reshape (the
    reference layout, wan/modules/model.py:40-67).

    ``layout="halfsplit"``: pairs stored as (re half ++ im half) — requires
    params canonicalized with :func:`halfsplit_qk_perm`
    (DiTConfig.rope_layout).  The rotation is then two 64-lane slices and
    f32 mul-adds; no stride-2 gather exists anywhere.

    ``premul`` (broadcastable to [B, S, N*D] pre-reshape) is an optional
    elementwise factor applied inside the f32 domain — used to fuse the q/k
    RMS-norm scale into the rotation and avoid an extra bf16 round trip.

    Perf note (measured, scripts/dit_breakdown.py at the 9/3 decode
    shape): the interleaved pair-gather form costs ~16.6 ms of a ~180 ms
    DiT forward (the 2-element pair dim forces Mosaic relayouts).  A
    roll-based reformulation on the interleaved layout (even/odd-masked
    1-lane rolls, tables repeat-interleaved to full D) measured WORSE
    (21.5 ms): 1-lane-offset lane rotates relayout just as hard as the
    stride-2 gather.  The halfsplit layout removes the gather by
    construction instead."""
    orig_dtype = x.dtype
    b, s, n, d = x.shape
    xf = x.astype(jnp.float32)
    if premul is not None:
        xf = xf * premul.astype(jnp.float32).reshape(b, s, n, d)
    c = cos[None, :, None, :]
    si = sin[None, :, None, :]
    if layout == "halfsplit":
        xr, xi = xf[..., : d // 2], xf[..., d // 2 :]
        out = jnp.concatenate([xr * c - xi * si, xr * si + xi * c], axis=-1)
        return out.astype(orig_dtype)
    if layout != "interleaved":
        raise ValueError(f"unknown rope layout {layout!r}")
    xf = xf.reshape(b, s, n, d // 2, 2)
    xr, xi = xf[..., 0], xf[..., 1]
    out_r = xr * c - xi * si
    out_i = xr * si + xi * c
    out = jnp.stack([out_r, out_i], axis=-1).reshape(b, s, n, d)
    return out.astype(orig_dtype)


def causal_rope_apply(
    x: jax.Array,
    tables: RopeTables,
    f: int,
    h: int,
    w: int,
    start_frame: jax.Array | int = 0,
) -> jax.Array:
    """RoPE over a [B, f*h*w, N, D] token block whose first frame sits at
    absolute frame index ``start_frame`` (ref causal_model.py:32-60)."""
    cos, sin = rope_multipliers(tables, f, h, w, start_frame)
    return apply_rotary(x, cos, sin)
