"""Causal DiT semantics tests.

The key invariant (replacing per-frame parity vs the CUDA reference, which
has no importable weights here): block-by-block *cached* generation must
reproduce the *uncached* full-sequence forward under the corresponding
blockwise-causal mask — for both the global-attention case and the
frame-sink + ring-window case.  This pins down RoPE offsets, cache slot
math, eviction order, validity masking, and commit semantics all at once.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longlive_tpu.config import CacheConfig, DiTConfig, tiny_dit_config, tiny_geometry
from longlive_tpu.models import dit as D
from longlive_tpu.ops import kv_cache as kvc
from longlive_tpu.ops import masks as M
from longlive_tpu.ops.rope import make_rope_tables


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    rng = jax.random.PRNGKey(0)
    params = D.init_dit_params(rng, cfg, jnp.float32, zero_head=False)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    prompt = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    cross = D.prepare_cross_kv(params, cfg, prompt, jnp.float32)
    return cfg, geom, params, tables, cross


def _run_cached(cfg, geom, params, tables, cross, x_full, t_val, cache_cfg, block,
                k_int8=False):
    f_total = x_full.shape[1]
    cache = kvc.init_cache(
        cache_cfg, cfg.num_layers, 1, cfg.num_heads, cfg.head_dim, jnp.float32,
        k_int8=k_int8,
    )
    outs = []
    for s in range(0, f_total, block):
        xb = x_full[:, s : s + block]
        t = jnp.full((1, block), t_val, jnp.float32)
        flow, cache = D.dit_forward_cached(
            params, cfg, cache_cfg, tables, xb, t, cross, cache,
            jnp.asarray(s, jnp.int32), attn_impl="xla",
        )
        outs.append(flow)
    return jnp.concatenate(outs, axis=1)


def test_cached_equals_uncached_global(setup):
    """Global attention (cache holds everything) == blockwise-causal full
    forward."""
    cfg, geom, params, tables, cross = setup
    block, f_total = 2, 6
    x = jax.random.normal(
        jax.random.PRNGKey(2), (1, f_total, geom.channels, geom.height, geom.width)
    )
    cache_cfg = CacheConfig(
        sink_frames=cfg.sink_size, ring_frames=f_total - cfg.sink_size,
        frame_seq=geom.frame_seq_length,
    )
    cached = _run_cached(cfg, geom, params, tables, cross, x, 500.0, cache_cfg, block)

    mask = M.blockwise_causal_frame_mask(f_total, block, -1)
    t_full = jnp.full((1, f_total), 500.0, jnp.float32)
    full = D.dit_forward_full(params, cfg, tables, x, t_full, cross, mask)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full), rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_int8_kv_cache_close_to_f32(setup):
    """int8-KV serving mode: cached generation with int8-stored keys
    (per-token scales, quantized once at write time) tracks the f32-cache
    result to quantization noise — through ring eviction and wrap."""
    cfg, geom, params, tables, cross = setup
    block, f_total = 1, 6
    x = jax.random.normal(
        jax.random.PRNGKey(9), (1, f_total, geom.channels, geom.height, geom.width)
    )
    cache_cfg = CacheConfig(sink_frames=1, ring_frames=3,
                            frame_seq=geom.frame_seq_length)
    ref = _run_cached(cfg, geom, params, tables, cross, x, 250.0, cache_cfg, block)
    out = _run_cached(cfg, geom, params, tables, cross, x, 250.0, cache_cfg, block,
                      k_int8=True)
    err = np.asarray(out) - np.asarray(ref)
    rel = np.sqrt((err**2).mean()) / np.sqrt((np.asarray(ref)**2).mean())
    assert rel < 0.02, rel


@pytest.mark.slow
def test_cached_equals_uncached_sink_window(setup):
    """Frame-sink + ring window: cached generation == full forward under the
    sink/window mask (exercises eviction + validity during and after warmup).
    """
    cfg, geom, params, tables, cross = setup
    block, f_total = 1, 8
    sink, ring = 1, 3  # window wraps twice over 8 frames
    x = jax.random.normal(
        jax.random.PRNGKey(3), (1, f_total, geom.channels, geom.height, geom.width)
    )
    cache_cfg = CacheConfig(sink_frames=sink, ring_frames=ring, frame_seq=geom.frame_seq_length)
    cached = _run_cached(cfg, geom, params, tables, cross, x, 250.0, cache_cfg, block)

    # Build the expected result block-recursively: frame q's flow depends on
    # cached K/V of visible frames, each computed from *their* visible set —
    # run the full forward with the sink+window mask, which realizes exactly
    # that recursion.
    mask = M.sink_window_frame_mask(f_total, block, sink, ring)
    t_full = jnp.full((1, f_total), 250.0, jnp.float32)
    full = D.dit_forward_full(params, cfg, tables, x, t_full, cross, mask)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full), rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_cached_window_smaller_than_cache(setup):
    """Training-style setup: the cache retains more history than the
    attention window (kv_frames=local+slice clipped, max_attention_size =
    local — self_forcing_training.py:59-74).  Cached generation with
    window_frames must equal the full forward under the sink+budget mask."""
    cfg, geom, params, tables, cross = setup
    block, f_total = 1, 8
    sink, ring, window = 1, 6, 4  # budget = window - sink = 3 recent frames
    x = jax.random.normal(
        jax.random.PRNGKey(9), (1, f_total, geom.channels, geom.height, geom.width)
    )
    cache_cfg = CacheConfig(sink_frames=sink, ring_frames=ring,
                            frame_seq=geom.frame_seq_length)
    cache = kvc.init_cache(cache_cfg, cfg.num_layers, 1, cfg.num_heads,
                           cfg.head_dim, jnp.float32)
    outs = []
    for s in range(f_total):
        t = jnp.full((1, 1), 250.0, jnp.float32)
        flow, cache = D.dit_forward_cached(
            params, cfg, cache_cfg, tables, x[:, s : s + 1], t, cross, cache,
            jnp.asarray(s, jnp.int32), attn_impl="xla", window_frames=window,
        )
        outs.append(flow)
    cached = jnp.concatenate(outs, axis=1)

    mask = M.sink_window_frame_mask(f_total, block, sink, window - sink)
    t_full = jnp.full((1, f_total), 250.0, jnp.float32)
    full = D.dit_forward_full(params, cfg, tables, x, t_full, cross, mask)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full), rtol=2e-3, atol=2e-4)


def test_forward_shapes_and_jit(setup):
    cfg, geom, params, tables, cross = setup
    cache_cfg = CacheConfig(sink_frames=1, ring_frames=3, frame_seq=geom.frame_seq_length)
    cache = kvc.init_cache(cache_cfg, cfg.num_layers, 1, cfg.num_heads, cfg.head_dim, jnp.float32)
    x = jnp.zeros((1, 2, geom.channels, geom.height, geom.width))
    t = jnp.zeros((1, 2))

    fwd = jax.jit(
        lambda p, xx, tt, cc, s: D.dit_forward_cached(
            p, cfg, cache_cfg, tables, xx, tt, cross, cc, s, attn_impl="xla"
        )
    )
    flow, cache2 = fwd(params, x, t, cache, jnp.asarray(0, jnp.int32))
    assert flow.shape == (1, 2, cfg.out_dim, geom.height, geom.width)
    assert cache2.k.shape == cache.k.shape
    assert int(cache2.sink_filled) == 1 and int(cache2.ring_filled) == 1
    # second block, same compiled fn (start_frame traced)
    flow, cache3 = fwd(params, x, t, cache2, jnp.asarray(2, jnp.int32))
    assert int(cache3.ring_filled) == 3


def test_validity_mask_warmup():
    cc = CacheConfig(sink_frames=2, ring_frames=4, frame_seq=3)
    cache = kvc.init_cache(cc, 1, 1, 1, 8)
    m = kvc.validity_mask(cc, cache, 0, 2, token_level=False)
    np.testing.assert_array_equal(np.asarray(m), [True, True, False, False, False, False])
    cache = kvc.advance(cc, cache, 0, 2)
    m = kvc.validity_mask(cc, cache, 2, 2, token_level=False)
    np.testing.assert_array_equal(np.asarray(m), [True, True, True, True, False, False])


def test_ring_slots_wrap_and_recache():
    cc = CacheConfig(sink_frames=3, ring_frames=9, frame_seq=1)
    cache = kvc.init_cache(cc, 1, 1, 1, 8)
    # steady state: frame 12 -> slot 3 + (12-3)%9 = 3 (wraps onto oldest)
    off = kvc.block_write_offsets(cc, cache, 12, 3)
    np.testing.assert_array_equal(np.asarray(off), [3, 4, 5])
    # post-recache at end frame 40 with 12 replayed frames:
    cache = kvc.recache_state(cc, cache, 40, 12)
    assert int(cache.ring_base) == 40 - 12 + 3
    assert int(cache.sink_filled) == 3 and int(cache.ring_filled) == 9
    # next block (frame 40) must evict the oldest replayed ring frames,
    # i.e. land on ring slots 0..2 = cache slots 3..5 (reference roll order)
    off = kvc.block_write_offsets(cc, cache, 40, 3)
    np.testing.assert_array_equal(np.asarray(off), [3, 4, 5])


@pytest.mark.slow
def test_cached_equals_uncached_block_straddles_sink(setup):
    """Blocks that straddle the sink/ring boundary (sink=2, block=3) must
    still match the full forward — exercises per-frame slot writes."""
    cfg, geom, params, tables, cross = setup
    block, f_total, sink, ring = 3, 9, 2, 4
    x = jax.random.normal(
        jax.random.PRNGKey(11), (1, f_total, geom.channels, geom.height, geom.width)
    )
    cache_cfg = CacheConfig(sink_frames=sink, ring_frames=ring,
                            frame_seq=geom.frame_seq_length)
    cached = _run_cached(cfg, geom, params, tables, cross, x, 500.0, cache_cfg, block)
    mask = M.sink_window_frame_mask(f_total, block, sink, ring)
    t_full = jnp.full((1, f_total), 500.0, jnp.float32)
    full = D.dit_forward_full(params, cfg, tables, x, t_full, cross, mask)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full), rtol=2e-3, atol=2e-4)


def test_forward_full_spec_kernel_equals_dense(setup):
    """FrameMaskSpec + masked flash kernel == materialized mask + dense."""
    from longlive_tpu.ops.masks import FrameMaskSpec

    cfg, geom, params, tables, cross = setup
    f_total = 6
    x = jax.random.normal(
        jax.random.PRNGKey(21), (1, f_total, geom.channels, geom.height, geom.width))
    t = jnp.full((1, f_total), 500.0)
    spec = FrameMaskSpec("block_causal", num_frame_per_block=2, local_attn_size=4)
    dense = D.dit_forward_full(params, cfg, tables, x, t, cross,
                               spec.materialize(f_total), attn_impl="xla")
    kern = D.dit_forward_full(params, cfg, tables, x, t, cross, spec,
                              attn_impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(kern), np.asarray(dense),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_two_segment_equals_single_segment(setup):
    """The two-segment decode path (cache ++ fresh block as separate
    attention operands, in-place post-scan commit) must match the
    write-then-attend single-segment form exactly — across enough blocks
    to exercise sink fill, ring fill, and ring wrap."""
    cfg, geom, params, tables, cross = setup
    cache_cfg = CacheConfig(cfg.sink_size, cfg.local_attn_size - cfg.sink_size,
                            geom.frame_seq_length)
    f_total = cfg.local_attn_size + 3  # wraps the ring
    x_full = jax.random.normal(
        jax.random.PRNGKey(9), (1, f_total, cfg.in_dim, geom.height, geom.width))

    import os

    def run(force_single, attn_impl="xla"):
        os.environ["LONGLIVE_TWO_SEGMENT"] = "0" if force_single else "1"
        cache = kvc.init_cache(cache_cfg, cfg.num_layers, 1, cfg.num_heads,
                               cfg.head_dim, jnp.float32)
        outs = []
        for s in range(0, f_total):
            xb = x_full[:, s : s + 1]
            t = jnp.full((1, 1), 500.0, jnp.float32)
            kw = {}
            if force_single:
                kw = dict(
                    offsets=kvc.block_write_offsets(cache_cfg, cache,
                                                    jnp.asarray(s, jnp.int32), 1),
                    kv_valid=kvc.validity_mask(cache_cfg, cache,
                                               jnp.asarray(s, jnp.int32), 1),
                    write_frames=(0,),
                )
            flow, cache = D.dit_forward_cached(
                params, cfg, cache_cfg, tables, xb, t, cross, cache,
                jnp.asarray(s, jnp.int32), attn_impl=attn_impl, **kw)
            outs.append(flow)
        return jnp.concatenate(outs, axis=1), cache

    try:
        two, cache2 = run(False)
        one, cache1 = run(True)
        # serving kernel path: two-segment + dead-tile skip (interpreted)
        twok, cache2k = run(False, attn_impl="pallas_interpret")
    finally:
        os.environ.pop("LONGLIVE_TWO_SEGMENT", None)
    np.testing.assert_allclose(np.asarray(two), np.asarray(one),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache2.k), np.asarray(cache1.k),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(twok), np.asarray(one),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache2k.k), np.asarray(cache1.k),
                               rtol=1e-5, atol=1e-5)

    # commit_writes=False: flow identical, cache buffers untouched
    os.environ["LONGLIVE_TWO_SEGMENT"] = "1"
    cache = kvc.init_cache(cache_cfg, cfg.num_layers, 1, cfg.num_heads,
                           cfg.head_dim, jnp.float32)
    t = jnp.full((1, 1), 500.0, jnp.float32)
    flow_c, cache_c = D.dit_forward_cached(
        params, cfg, cache_cfg, tables, x_full[:, :1], t, cross, cache,
        jnp.asarray(0, jnp.int32), attn_impl="xla", commit_writes=False)
    flow_w, _ = D.dit_forward_cached(
        params, cfg, cache_cfg, tables, x_full[:, :1], t, cross, cache,
        jnp.asarray(0, jnp.int32), attn_impl="xla")
    os.environ.pop("LONGLIVE_TWO_SEGMENT", None)
    np.testing.assert_allclose(np.asarray(flow_c), np.asarray(flow_w),
                               rtol=1e-6, atol=1e-6)
    assert float(jnp.abs(cache_c.k).max()) == 0.0


@pytest.mark.parametrize("two_segment", [False, True])
@pytest.mark.parametrize("k_int8", [False, True])
def test_kv_only_commit_cache_identical(setup, two_segment, k_int8):
    """kv_only=True (commit/recache forwards: scan L-1 layers + a
    K/V-projection-only tail layer) must produce a cache IDENTICAL to the
    full forward's — the flow output is the only thing sacrificed."""
    cfg, geom, params, tables, cross = setup
    cache_cfg = CacheConfig(sink_frames=1, ring_frames=4,
                            frame_seq=geom.frame_seq_length)
    cache = kvc.init_cache(cache_cfg, cfg.num_layers, 1, cfg.num_heads,
                           cfg.head_dim, jnp.float32, k_int8=k_int8)
    x = jax.random.normal(jax.random.PRNGKey(9),
                          (1, 2, geom.channels, geom.height, geom.width))
    t = jnp.zeros((1, 2), jnp.float32)
    start = jnp.asarray(0, jnp.int32)
    kw = dict(attn_impl="xla", two_segment=True if two_segment else None)
    _, c_full = D.dit_forward_cached(params, cfg, cache_cfg, tables, x, t,
                                     cross, cache, start, **kw)
    flow, c_kv = D.dit_forward_cached(params, cfg, cache_cfg, tables, x, t,
                                      cross, cache, start, kv_only=True, **kw)
    assert float(jnp.abs(flow).max()) == 0.0  # placeholder output
    # the tail layer's K/V compile as a standalone fusion (vs inside the
    # scan body), so bit-equality is not guaranteed — only f32 roundoff
    for a, b in zip(jax.tree.leaves(c_full), jax.tree.leaves(c_kv)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k_int8", [False, True])
def test_contiguous_block_writes_identical(setup, k_int8):
    """contig_writes=True (one dynamic_update_slice per block) must produce
    bit-identical flows AND cache contents vs the per-frame write chain,
    across ring wrap-around and a KV-recache (the two places slot math could
    break contiguity).  sink % block == ring % block == 0 as the pipeline
    invariant requires."""
    from longlive_tpu.pipeline.causal_inference import build_recache_fn

    cfg, geom, params, tables, cross = setup
    block, sink, ring = 2, 2, 4
    cache_cfg = CacheConfig(sink_frames=sink, ring_frames=ring,
                            frame_seq=geom.frame_seq_length)

    def run(contig):
        cache = kvc.init_cache(cache_cfg, cfg.num_layers, 1, cfg.num_heads,
                               cfg.head_dim, jnp.float32, k_int8=k_int8)
        flows = []
        rng = jax.random.PRNGKey(7)
        s = 0
        for step in range(6):
            if step == 4:
                # prompt-switch style recache of the last 4 frames
                def fwd(params_, x, t_val, cross_, state, start, **kw):
                    b, f = x.shape[:2]
                    t = jnp.full((b, f), t_val, jnp.float32)
                    kw.setdefault("contig_writes", contig)
                    return D.dit_forward_cached(
                        params_, cfg, cache_cfg, tables, x, t, cross_, state,
                        start, attn_impl="xla", **kw)

                rec = build_recache_fn(
                    cfg, cache_cfg, tables, 0.0, 4, False, True,
                    cache_cfg.total_frames, forward=fwd)
                rng, sub = jax.random.split(rng)
                replay = jax.random.normal(
                    sub, (1, 4, geom.channels, geom.height, geom.width))
                cache = rec(params, cache, cross, replay, s - 4)
            rng, sub = jax.random.split(rng)
            xb = jax.random.normal(
                sub, (1, block, geom.channels, geom.height, geom.width))
            t = jnp.full((1, block), 250.0, jnp.float32)
            flow, cache = D.dit_forward_cached(
                params, cfg, cache_cfg, tables, xb, t, cross, cache,
                jnp.asarray(s, jnp.int32), attn_impl="xla",
                contig_writes=contig)
            flows.append(flow)
            s += block
        return jnp.concatenate(flows, axis=1), cache

    f_a, c_a = run(True)
    f_b, c_b = run(False)
    np.testing.assert_array_equal(np.asarray(f_a), np.asarray(f_b))
    np.testing.assert_array_equal(np.asarray(c_a.k), np.asarray(c_b.k))
    np.testing.assert_array_equal(np.asarray(c_a.v), np.asarray(c_b.v))
    if k_int8:
        np.testing.assert_array_equal(np.asarray(c_a.k_scale),
                                      np.asarray(c_b.k_scale))
