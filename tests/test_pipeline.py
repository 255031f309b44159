"""End-to-end pipeline tests on the tiny geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longlive_tpu.config import PipelineConfig, tiny_dit_config, tiny_geometry
from longlive_tpu.models import dit as D
from longlive_tpu.pipeline import (
    CausalInferencePipeline,
    InteractiveCausalInferencePipeline,
)


@pytest.fixture(scope="module")
def pipe_setup():
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32, zero_head=False)
    pconfig = PipelineConfig(
        denoising_step_list=(1000, 750, 500, 250),
        warp_denoising_step=True,
        num_frame_per_block=cfg.num_frame_per_block,
        timestep_shift=5.0,
        local_attn_size=cfg.local_attn_size,
        sink_size=cfg.sink_size,
        num_output_frames=8,
        context_noise=0,
        global_sink=False,
    )
    return cfg, geom, params, pconfig


def _make_pipe(cls, cfg, geom, params, pconfig):
    return cls(pconfig, params, geometry=geom, dit_config=cfg, attn_impl="xla")


def _prompt_kv(pipe, cfg, seed):
    pe = jax.random.normal(jax.random.PRNGKey(seed), (1, cfg.text_len, cfg.text_dim))
    return pipe.prepare_condition(pe)


def test_generate_latents(pipe_setup):
    cfg, geom, params, pconfig = pipe_setup
    pipe = _make_pipe(CausalInferencePipeline, cfg, geom, params, pconfig)
    cross = _prompt_kv(pipe, cfg, 1)
    noise = jax.random.normal(
        jax.random.PRNGKey(2), (1, 8, geom.channels, geom.height, geom.width)
    )
    lat = pipe.generate_latents(noise, cross)
    assert lat.shape == noise.shape
    assert np.isfinite(np.asarray(lat)).all()
    # deterministic given the same rng
    lat2 = pipe.generate_latents(noise, cross)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat2), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_reuse_last_denoise_kv_mode(pipe_setup):
    """Fast serving mode (skip the clean-context commit; keep the last
    denoise pass's K/V): first block's latents are IDENTICAL to the default
    path (the commit only affects the *next* block's context), later blocks
    drift but stay finite, and cache counters advance the same way."""
    import dataclasses

    cfg, geom, params, pconfig = pipe_setup
    pipe_ref = _make_pipe(CausalInferencePipeline, cfg, geom, params, pconfig)
    pipe_fast = _make_pipe(
        CausalInferencePipeline, cfg, geom, params,
        dataclasses.replace(pconfig, reuse_last_denoise_kv=True))
    cross = _prompt_kv(pipe_ref, cfg, 1)
    cross_f = _prompt_kv(pipe_fast, cfg, 1)
    noise = jax.random.normal(
        jax.random.PRNGKey(2), (1, 8, geom.channels, geom.height, geom.width)
    )
    lat_r, cache_r, _ = pipe_ref.generate_latents_scanned(noise, cross)
    lat_f, cache_f, _ = pipe_fast.generate_latents_scanned(noise, cross_f)
    fpb = pconfig.num_frame_per_block
    np.testing.assert_allclose(np.asarray(lat_r[:, :fpb]),
                               np.asarray(lat_f[:, :fpb]), rtol=1e-5, atol=1e-6)
    assert np.isfinite(np.asarray(lat_f)).all()
    # context differs from the second block on (by design)
    assert np.abs(np.asarray(lat_r[:, fpb:]) - np.asarray(lat_f[:, fpb:])).max() > 0
    for s in ("ring_base", "sink_filled", "ring_filled"):
        assert int(getattr(cache_r, s)) == int(getattr(cache_f, s))


def test_interactive_switch_changes_output(pipe_setup):
    cfg, geom, params, pconfig = pipe_setup
    pipe = _make_pipe(InteractiveCausalInferencePipeline, cfg, geom, params, pconfig)
    cross_a = _prompt_kv(pipe, cfg, 1)
    cross_b = _prompt_kv(pipe, cfg, 7)
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (1, 8, geom.channels, geom.height, geom.width)
    )
    lat_switch = pipe.generate_latents_interactive(noise, [cross_a, cross_b], [4])
    assert lat_switch.shape == noise.shape
    assert np.isfinite(np.asarray(lat_switch)).all()

    lat_plain = pipe.generate_latents_interactive(noise, [cross_a], [])
    # prefix before the switch identical, suffix differs
    np.testing.assert_allclose(
        np.asarray(lat_switch[:, :4]), np.asarray(lat_plain[:, :4]), rtol=1e-4, atol=1e-5
    )
    assert np.abs(np.asarray(lat_switch[:, 4:]) - np.asarray(lat_plain[:, 4:])).max() > 1e-3


def test_interactive_same_prompt_recache_is_consistent(pipe_setup):
    """Recaching with the *same* prompt must not derail generation: outputs
    stay finite and close in distribution (mean/std sanity)."""
    cfg, geom, params, pconfig = pipe_setup
    pipe = _make_pipe(InteractiveCausalInferencePipeline, cfg, geom, params, pconfig)
    cross = _prompt_kv(pipe, cfg, 1)
    noise = jax.random.normal(
        jax.random.PRNGKey(4), (1, 8, geom.channels, geom.height, geom.width)
    )
    lat = pipe.generate_latents_interactive(noise, [cross, cross], [4])
    assert np.isfinite(np.asarray(lat)).all()


def test_batched_generation_sample_isolation(pipe_setup):
    """B=2 generation: sample 0's latents must be bit-identical whether
    sample 1 carries the same or a different prompt (per-sample cache/
    attention isolation; deterministic renoise removes RNG coupling).
    The reference serves B=1 only — batched serving is TPU-side value."""
    cfg, geom, params, pcfg = pipe_setup
    import numpy as np

    pipe = CausalInferencePipeline(pcfg, params, geometry=geom,
                                   dit_config=cfg, attn_impl="xla",
                                   deterministic_renoise=True)
    emb_a = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim))
    emb_b = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.text_len, cfg.text_dim))
    noise1 = jax.random.normal(
        jax.random.PRNGKey(4), (1, 2 * cfg.num_frame_per_block, geom.channels, geom.height,
         geom.width))
    noise = jnp.concatenate([noise1, noise1 * 0.5], axis=0)

    def run(second_emb):
        ckv = pipe.prepare_condition(jnp.concatenate([emb_a, second_emb]))
        lat, _, _ = pipe.generate_latents_scanned(noise, ckv)
        return np.asarray(lat)

    la = run(emb_a * 0.7)
    lb = run(emb_b)
    assert np.isfinite(la).all()
    np.testing.assert_array_equal(la[0], lb[0])
    assert np.abs(la[1] - lb[1]).max() > 1e-6  # prompt actually mattered


def test_recache_attn_impl_override(pipe_setup):
    """recache_attn_impl routes ONLY the prompt-switch recache forward
    through the requested attention impl (here the int8-QK kernel in
    interpret mode): results stay close to the default recache
    (quantization-bounded) and generation before the switch is untouched."""
    import dataclasses

    cfg, geom, params, pconfig = pipe_setup
    pipe_ref = _make_pipe(InteractiveCausalInferencePipeline, cfg, geom,
                          params, pconfig)
    pipe_q = _make_pipe(
        InteractiveCausalInferencePipeline, cfg, geom, params,
        dataclasses.replace(pconfig,
                            recache_attn_impl="pallas_qk8_interpret"))
    cross_a = _prompt_kv(pipe_ref, cfg, 1)
    cross_b = _prompt_kv(pipe_ref, cfg, 7)
    cross_a2 = _prompt_kv(pipe_q, cfg, 1)
    cross_b2 = _prompt_kv(pipe_q, cfg, 7)
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (1, 8, geom.channels, geom.height, geom.width))
    lat_r = pipe_ref.generate_latents_interactive(noise, [cross_a, cross_b], [4])
    lat_q = pipe_q.generate_latents_interactive(noise, [cross_a2, cross_b2], [4])
    # pre-switch latents identical (override touches the recache only)
    np.testing.assert_allclose(np.asarray(lat_r[:, :4]),
                               np.asarray(lat_q[:, :4]), rtol=1e-5, atol=1e-6)
    assert np.isfinite(np.asarray(lat_q)).all()
    # post-switch: int8-QK recache is quantization-bounded, not exact
    a, b = np.asarray(lat_r[:, 4:]), np.asarray(lat_q[:, 4:])
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
    assert rel < 0.05, rel


def test_kernel_cache_generation_parity(pipe_setup):
    """kernel_cache=True (carry-resident kernel-layout KV cache, in-place
    block writes, zero-copy kernel reads) is a pure data-movement
    reformulation: latents must match the default write-then-attend
    pipeline to f32 roundoff, through ring wrap and a prompt-switch
    recache."""
    cfg, geom, params, pcfg = pipe_setup
    import dataclasses as dc

    # pin the reference leg to write-then-attend: kernel_cache=None now
    # AUTO-resolves to on whenever supported, so both legs would otherwise
    # silently run the kernel layout
    ref_pipe = CausalInferencePipeline(
        dc.replace(pcfg, kernel_cache=False), params, geometry=geom,
        dit_config=cfg, attn_impl="xla")
    kl_pipe = CausalInferencePipeline(
        dc.replace(pcfg, kernel_cache=True), params, geometry=geom,
        dit_config=cfg, attn_impl="xla")
    cross_r = _prompt_kv(ref_pipe, cfg, 1)
    cross_k = _prompt_kv(kl_pipe, cfg, 1)
    noise = jax.random.normal(
        jax.random.PRNGKey(2), (1, 12, geom.channels, geom.height, geom.width)
    )
    lat_r, cache_r, _ = ref_pipe.generate_latents_scanned(noise, cross_r)
    lat_k, cache_k, _ = kl_pipe.generate_latents_scanned(noise, cross_k)
    np.testing.assert_allclose(np.asarray(lat_k), np.asarray(lat_r),
                               rtol=1e-4, atol=1e-5)
    # committed caches identical after converting layouts back
    from longlive_tpu.ops import kv_cache as kvc

    cache_k_std = kvc.from_kernel_layout(
        kl_pipe.cache_cfg, cache_k, cfg.num_layers, 1, cfg.num_heads)
    np.testing.assert_allclose(np.asarray(cache_k_std.k),
                               np.asarray(cache_r.k), rtol=1e-4, atol=1e-5)
    assert int(cache_k.ring_base) == int(cache_r.ring_base)
    assert int(cache_k.ring_filled) == int(cache_r.ring_filled)


def test_kernel_cache_interactive_switch_parity(pipe_setup):
    """Prompt-switch recache with kernel_cache: converts the kernel-layout
    cache to standard layout around the replay and back — post-switch
    latents must match the default pipeline."""
    cfg, geom, params, pcfg = pipe_setup
    import dataclasses as dc

    ref_pipe = InteractiveCausalInferencePipeline(
        dc.replace(pcfg, kernel_cache=False), params, geometry=geom,
        dit_config=cfg, attn_impl="xla")
    kl_pipe = InteractiveCausalInferencePipeline(
        dc.replace(pcfg, kernel_cache=True), params, geometry=geom,
        dit_config=cfg, attn_impl="xla")
    cross_a = _prompt_kv(ref_pipe, cfg, 1)
    cross_b = _prompt_kv(ref_pipe, cfg, 5)
    cross_a2 = _prompt_kv(kl_pipe, cfg, 1)
    cross_b2 = _prompt_kv(kl_pipe, cfg, 5)
    noise = jax.random.normal(
        jax.random.PRNGKey(4), (1, 8, geom.channels, geom.height, geom.width)
    )
    lat_r = ref_pipe.generate_latents_interactive(noise, [cross_a, cross_b], [4])
    lat_k = kl_pipe.generate_latents_interactive(noise, [cross_a2, cross_b2], [4])
    np.testing.assert_allclose(np.asarray(lat_k), np.asarray(lat_r),
                               rtol=1e-4, atol=1e-5)


def test_fused_rope_generation_parity(pipe_setup):
    """fused_rope=True (q rotated in the flash-kernel prologue) matches the
    default pipeline exactly at f32 tiny config — the fallback applies the
    identical halfsplit algebra on the same (un-rounded at f32) q — both
    on the standard cache and the kernel-layout cache."""
    cfg, geom, params, pcfg = pipe_setup
    import dataclasses as dc

    ref_pipe = CausalInferencePipeline(
        dc.replace(pcfg, kernel_cache=False), params, geometry=geom,
        dit_config=cfg, attn_impl="xla")
    fr_pipe = CausalInferencePipeline(
        dc.replace(pcfg, fused_rope=True, kernel_cache=False), params,
        geometry=geom, dit_config=cfg, attn_impl="xla")
    frkl_pipe = CausalInferencePipeline(
        dc.replace(pcfg, fused_rope=True, kernel_cache=True), params,
        geometry=geom, dit_config=cfg, attn_impl="xla")
    noise = jax.random.normal(
        jax.random.PRNGKey(2), (1, 8, geom.channels, geom.height, geom.width)
    )
    lat_r, _, _ = ref_pipe.generate_latents_scanned(
        noise, _prompt_kv(ref_pipe, cfg, 1))
    for pipe in (fr_pipe, frkl_pipe):
        lat_f, _, _ = pipe.generate_latents_scanned(
            noise, _prompt_kv(pipe, cfg, 1))
        np.testing.assert_allclose(np.asarray(lat_f), np.asarray(lat_r),
                                   rtol=1e-5, atol=1e-6)


def test_eager_recache_single_chunk_matches_oneshot(pipe_setup):
    """A one-chunk EagerRecache is the SAME program as the one-shot
    recache (same kv_valid rule, offsets, write set, RoPE start), so the
    resulting caches must agree to jit-boundary roundoff."""
    cfg, geom, params, pcfg = pipe_setup
    pipe = _make_pipe(CausalInferencePipeline, cfg, geom, params, pcfg)
    cross_a = _prompt_kv(pipe, cfg, 1)
    cross_b = _prompt_kv(pipe, cfg, 2)
    fpb = pipe.frame_block
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (1, fpb, geom.channels, geom.height, geom.width))
    lat, cache, _ = pipe.generate_latents_scanned(noise, cross_a)

    n = min(cfg.local_attn_size, fpb)  # == fpb -> single chunk
    one_shot = pipe._recache_fn(n, False)(
        pipe.params, cache, cross_b, lat[:, fpb - n:],
        jnp.asarray(fpb - n, jnp.int32))

    er = pipe.begin_eager_recache(1, switch_frame=fpb, dtype=jnp.float32)
    assert er.feed(cross_b, lat, 0) == n
    eager = er.finish()

    for a, b in zip(jax.tree.leaves(one_shot), jax.tree.leaves(eager)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_eager_recache_chunked_continuation(pipe_setup):
    """Multi-chunk eager recache across split feed() spans: pointer scalars
    match the one-shot recache, chunk order/overlap bookkeeping consumes
    exactly the replay window, and generation continues finite from the
    eager cache."""
    cfg, geom, params, pcfg = pipe_setup
    pipe = _make_pipe(CausalInferencePipeline, cfg, geom, params, pcfg)
    cross_a = _prompt_kv(pipe, cfg, 1)
    cross_b = _prompt_kv(pipe, cfg, 2)
    switch = 5
    n = min(cfg.local_attn_size, switch)  # 4 chunks at fpb=1
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (1, 8, geom.channels, geom.height, geom.width))
    lat, cache, rng = pipe.generate_latents_scanned(noise[:, :switch], cross_a)

    er = pipe.begin_eager_recache(1, switch_frame=switch, dtype=jnp.float32)
    # feed in two disjoint spans (simulating blockwise arrival); the second
    # span starts mid-window
    c1 = er.feed(cross_b, lat[:, :3], 0)
    c2 = er.feed(cross_b, lat[:, 3:], 3)
    assert c1 + c2 == n
    eager = er.finish()

    one_shot = pipe._recache_fn(n, False)(
        pipe.params, cache, cross_b, lat[:, switch - n:],
        jnp.asarray(switch - n, jnp.int32))
    # same post-recache pointer state (layout parity); buffer contents
    # differ only by the mask semantics (blockwise-causal vs full replay —
    # the reference's own interactive mode uses blockwise-causal,
    # interactive_causal_inference.py:73-96)
    for f in ("ring_base", "sink_filled", "ring_filled"):
        assert int(getattr(eager, f)) == int(getattr(one_shot, f)), f

    lat2, _, _ = pipe.generate_latents_scanned(
        noise[:, switch:], cross_b, rng=rng, cache=eager, start_frame=switch)
    assert np.isfinite(np.asarray(lat2)).all()


def test_interactive_eager_recache_mode(pipe_setup):
    """eager_recache=True: pre-switch latents are identical to the default
    interactive path (the segment is merely split into scan + per-block
    tail of the same block program); the post-switch cache carries the
    blockwise-causal replay (golden-tested vs the torch reference in
    test_reference_parity) and generation continues finite."""
    cfg, geom, params, pcfg = pipe_setup
    import dataclasses as dc

    base = InteractiveCausalInferencePipeline(
        pcfg, params, geometry=geom, dit_config=cfg, attn_impl="xla")
    eager = InteractiveCausalInferencePipeline(
        dc.replace(pcfg, eager_recache=True), params, geometry=geom,
        dit_config=cfg, attn_impl="xla")
    cross = [_prompt_kv(base, cfg, 1), _prompt_kv(base, cfg, 2)]
    cross_e = [_prompt_kv(eager, cfg, 1), _prompt_kv(eager, cfg, 2)]
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (1, 10, geom.channels, geom.height, geom.width))
    switch = [6]
    lat_b = base.generate_latents_interactive_scanned(noise, cross, switch)
    lat_e = eager.generate_latents_interactive_scanned(noise, cross_e, switch)
    assert lat_e.shape == lat_b.shape
    # pre-switch: bit-for-bit the same program order (scan + block tail)
    np.testing.assert_allclose(np.asarray(lat_e[:, :6]),
                               np.asarray(lat_b[:, :6]), rtol=1e-5, atol=1e-6)
    assert np.isfinite(np.asarray(lat_e)).all()
    # post-switch differs only via the (reference-faithful) causal replay
    # mask — values stay in the same numeric range
    post_b, post_e = np.asarray(lat_b[:, 6:]), np.asarray(lat_e[:, 6:])
    assert post_e.std() < 10 * post_b.std() + 1e-3


def test_kernel_cache_batched_matches_default(pipe_setup):
    """kernel_cache at B=2: the stacked [L*B*N, S_pad, D] rows are b-major
    exactly like the flattened q rows, so batched serving must match the
    write-then-attend pipeline per stream (the round-2 B=2 rows ran with
    kernel_cache off, leaving this unproven)."""
    cfg, geom, params, pcfg = pipe_setup
    import dataclasses as dc

    ref_pipe = CausalInferencePipeline(
        dc.replace(pcfg, kernel_cache=False), params, geometry=geom,
        dit_config=cfg, attn_impl="xla")
    kl_pipe = CausalInferencePipeline(
        dc.replace(pcfg, kernel_cache=True), params, geometry=geom,
        dit_config=cfg, attn_impl="xla")
    pe = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.text_len, cfg.text_dim))
    noise = jax.random.normal(
        jax.random.PRNGKey(2), (2, 8, geom.channels, geom.height, geom.width))
    lat_r, _, _ = ref_pipe.generate_latents_scanned(noise, ref_pipe.prepare_condition(pe))
    lat_k, _, _ = kl_pipe.generate_latents_scanned(noise, kl_pipe.prepare_condition(pe))
    np.testing.assert_allclose(np.asarray(lat_k), np.asarray(lat_r),
                               rtol=1e-4, atol=1e-5)


def test_block_step_skip_commit_x0_exact(pipe_setup):
    """skip_commit drops only the commit pass: the block's x0 (and the rng
    chain) are bit-identical to the normal block step — the basis for the
    zero-cost final pre-switch block."""
    cfg, geom, params, pcfg = pipe_setup
    pipe = _make_pipe(CausalInferencePipeline, cfg, geom, params, pcfg)
    cross = _prompt_kv(pipe, cfg, 1)
    nb = jax.random.normal(
        jax.random.PRNGKey(2),
        (1, pipe.frame_block, geom.channels, geom.height, geom.width))
    rng = jax.random.PRNGKey(3)
    c1 = pipe.init_cache(1, jnp.float32)
    c2 = pipe.init_cache(1, jnp.float32)
    x0_a, _, rng_a = pipe._block_fn(pipe.params, c1, cross, nb,
                                    jnp.asarray(0, jnp.int32), rng)
    x0_b, _, rng_b = pipe._block_fn_nocommit(pipe.params, c2, cross, nb,
                                             jnp.asarray(0, jnp.int32), rng)
    np.testing.assert_array_equal(np.asarray(x0_a), np.asarray(x0_b))
    np.testing.assert_array_equal(np.asarray(rng_a), np.asarray(rng_b))


@pytest.mark.slow
def test_reactive_switch_full_window_matches_oneshot(pipe_setup):
    """reactive_switch with no reduction is EXACTLY the one-shot recache
    (reference interactive_causal_inference.py:34-106 semantics)."""
    cfg, geom, params, pconfig = pipe_setup
    pipe = _make_pipe(CausalInferencePipeline, cfg, geom, params, pconfig)
    cross_a = _prompt_kv(pipe, cfg, 1)
    cross_b = _prompt_kv(pipe, cfg, 5)
    noise = jax.random.normal(
        jax.random.PRNGKey(2), (1, 6, geom.channels, geom.height, geom.width))
    lat, cache, rng = pipe.generate_latents_scanned(noise, cross_a)
    s = 6
    n = min(cfg.local_attn_size, s)  # 4

    import copy

    ref_cache = pipe._recache_fn(n, False)(
        pipe.params, jax.tree.map(jnp.copy, cache), cross_b, lat[:, s - n :],
        jnp.asarray(s - n, jnp.int32))
    got = pipe.reactive_switch(jax.tree.map(jnp.copy, cache), lat, cross_b, s)
    for a, b in zip(jax.tree.leaves(ref_cache), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_reactive_switch_reduced_window(pipe_setup):
    """Reduced replay (frames=2 at window 4): generation continues finite
    from the recached state, the output differs from the full-window
    switch (shorter history), and after `local_attn` more frames the two
    variants' caches hold the same VALID window span (self-refill)."""
    import dataclasses as dc

    cfg, geom, params, pconfig = pipe_setup
    pconf_r = dc.replace(pconfig, reactive_recache_frames=2)
    pipe = _make_pipe(CausalInferencePipeline, cfg, geom, params, pconf_r)
    cross_a = _prompt_kv(pipe, cfg, 1)
    cross_b = _prompt_kv(pipe, cfg, 5)
    noise = jax.random.normal(
        jax.random.PRNGKey(2), (1, 6, geom.channels, geom.height, geom.width))
    noise2 = jax.random.normal(
        jax.random.PRNGKey(3), (1, 4, geom.channels, geom.height, geom.width))
    lat, cache, rng = pipe.generate_latents_scanned(noise, cross_a)

    cache_r = pipe.reactive_switch(jax.tree.map(jnp.copy, cache), lat,
                                   cross_b, 6)  # uses config default (2)
    cache_f = pipe.reactive_switch(jax.tree.map(jnp.copy, cache), lat,
                                   cross_b, 6, frames=4)
    lat_r, _, _ = pipe.generate_latents_scanned(noise2, cross_b, rng=rng,
                                                cache=cache_r, start_frame=6)
    lat_f, _, _ = pipe.generate_latents_scanned(noise2, cross_b, rng=rng,
                                                cache=cache_f, start_frame=6)
    assert np.isfinite(np.asarray(lat_r)).all()
    assert np.abs(np.asarray(lat_r) - np.asarray(lat_f)).max() > 1e-6


@pytest.mark.slow
def test_reactive_switch_block_alignment_and_bounds(pipe_setup):
    """frames is clamped to the available window and rounded down to a
    block multiple; tiny history still works."""
    cfg, geom, params, pconfig = pipe_setup
    pipe = _make_pipe(CausalInferencePipeline, cfg, geom, params, pconfig)
    cross_a = _prompt_kv(pipe, cfg, 1)
    cross_b = _prompt_kv(pipe, cfg, 5)
    noise = jax.random.normal(
        jax.random.PRNGKey(2), (1, 2, geom.channels, geom.height, geom.width))
    lat, cache, rng = pipe.generate_latents_scanned(noise, cross_a)
    # current_frame=2, window=min(4,2)=2; frames=99 clamps to 2
    got = pipe.reactive_switch(cache, lat, cross_b, 2, frames=99)
    assert jnp.isfinite(jax.tree.leaves(got)[0]).all()


@pytest.mark.slow
def test_generate_latents_reactive_matches_interactive(pipe_setup):
    """The reactive (polled) serving loop with a full-window replay at the
    same block boundary produces EXACTLY the scheduled interactive result."""
    cfg, geom, params, pconfig = pipe_setup
    pipe = _make_pipe(InteractiveCausalInferencePipeline, cfg, geom, params,
                      pconfig)
    cross_a = _prompt_kv(pipe, cfg, 1)
    cross_b = _prompt_kv(pipe, cfg, 5)
    noise = jax.random.normal(
        jax.random.PRNGKey(2), (1, 8, geom.channels, geom.height, geom.width))
    ref = pipe.generate_latents_interactive(noise, [cross_a, cross_b], [4])

    polled = pipe.generate_latents_reactive(
        noise, cross_a, lambda s: cross_b if s == 4 else None)
    np.testing.assert_allclose(np.asarray(polled), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # reduced-window variant runs finite and differs (shorter history)
    import dataclasses as dc

    pipe_r = _make_pipe(InteractiveCausalInferencePipeline, cfg, geom, params,
                        dc.replace(pconfig, reactive_recache_frames=2))
    red = pipe_r.generate_latents_reactive(
        noise, cross_a, lambda s: cross_b if s == 4 else None)
    assert np.isfinite(np.asarray(red)).all()
    assert np.abs(np.asarray(red) - np.asarray(ref)).max() > 1e-6
