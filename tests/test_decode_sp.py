"""Sequence-parallel cached decode (parallel.decode_sp) == single-device.

The SP path must be bit-compatible in structure with the single-chip ring
cache: within-frame token sharding + head-scattered attention restores the
exact token order, so latents and the (gathered) KV cache agree to float
tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longlive_tpu.config import PipelineConfig, tiny_dit_config, tiny_geometry
from longlive_tpu.models import dit as D
from longlive_tpu.parallel import mesh as M
from longlive_tpu.parallel.decode_sp import shard_cache, sp_dit_forward_cached
from longlive_tpu.pipeline import CausalInferencePipeline


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_dit_config()  # 4 heads, fs = 16 tokens/frame
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
    mesh = M.make_mesh(dp=1, fsdp=1, sp=2, devices=jax.devices()[:2])
    return cfg, geom, params, pconfig, mesh


def _pipes(cfg, geom, params, pconfig, mesh):
    import dataclasses as dc

    # pin the single-device leg to the standard cache layout: kernel_cache
    # AUTO-resolves on at sp=1, but this test shards and compares the
    # standard [L,B,S,N,D] cache against the sp path
    single = CausalInferencePipeline(
        dc.replace(pconfig, kernel_cache=False), params, geometry=geom,
        dit_config=cfg, attn_impl="xla")
    sp = CausalInferencePipeline(pconfig, params, geometry=geom,
                                 dit_config=cfg, attn_impl="xla", mesh=mesh)
    return single, sp


def test_single_forward_parity(setup):
    cfg, geom, params, pconfig, mesh = setup
    single, sp = _pipes(cfg, geom, params, pconfig, mesh)
    x = jax.random.normal(
        jax.random.PRNGKey(3), (1, 1, geom.channels, geom.height, geom.width))
    t = jnp.full((1, 1), 750.0, jnp.float32)
    cross = single.prepare_condition(
        jax.random.normal(jax.random.PRNGKey(4), (1, cfg.text_len, cfg.text_dim)))

    c0 = single.init_cache(1, jnp.float32)
    flow_ref, cache_ref = D.dit_forward_cached(
        params, cfg, single.cache_cfg, single.tables, x, t, cross, c0,
        jnp.asarray(0, jnp.int32), attn_impl="xla")

    c0_sp = shard_cache(single.init_cache(1, jnp.float32), mesh)
    flow_sp, cache_sp = sp_dit_forward_cached(
        params, cfg, single.cache_cfg, single.tables, mesh, x, t, cross, c0_sp,
        jnp.asarray(0, jnp.int32), attn_impl="xla")

    np.testing.assert_allclose(np.asarray(flow_ref), np.asarray(flow_sp),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache_ref.k), np.asarray(cache_sp.k),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache_ref.v), np.asarray(cache_sp.v),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_generate_latents_parity(setup):
    """Multi-block generation (covers ring wrap: 8 frames > window 4)."""
    cfg, geom, params, pconfig, mesh = setup
    single, sp = _pipes(cfg, geom, params, pconfig, mesh)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    cross_s = single.prepare_condition(pe)
    cross_p = sp.prepare_condition(pe)
    noise = jax.random.normal(
        jax.random.PRNGKey(2), (1, 8, geom.channels, geom.height, geom.width))
    lat_s = single.generate_latents(noise, cross_s)
    lat_p = sp.generate_latents(noise, cross_p)
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_p),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_scanned_segment_parity(setup):
    cfg, geom, params, pconfig, mesh = setup
    single, sp = _pipes(cfg, geom, params, pconfig, mesh)
    pe = jax.random.normal(jax.random.PRNGKey(5), (1, cfg.text_len, cfg.text_dim))
    cross_s = single.prepare_condition(pe)
    cross_p = sp.prepare_condition(pe)
    noise = jax.random.normal(
        jax.random.PRNGKey(6), (1, 6, geom.channels, geom.height, geom.width))
    lat_s, _, _ = single.generate_latents_scanned(noise, cross_s)
    lat_p, _, _ = sp.generate_latents_scanned(noise, cross_p)
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_p),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_recache_parity(setup):
    """Prompt-switch KV-recache through the SP forward == single device."""
    cfg, geom, params, pconfig, mesh = setup
    single, sp = _pipes(cfg, geom, params, pconfig, mesh)
    pe_a = jax.random.normal(jax.random.PRNGKey(7), (1, cfg.text_len, cfg.text_dim))
    pe_b = jax.random.normal(jax.random.PRNGKey(8), (1, cfg.text_len, cfg.text_dim))
    noise = jax.random.normal(
        jax.random.PRNGKey(9), (1, 6, geom.channels, geom.height, geom.width))

    lat_s, cache_s, _ = single.generate_latents_scanned(
        noise, single.prepare_condition(pe_a))
    lat_p, cache_p, _ = sp.generate_latents_scanned(
        noise, sp.prepare_condition(pe_a))

    n = min(cfg.local_attn_size, 6)
    replay_s = lat_s[:, 6 - n : 6]
    replay_p = lat_p[:, 6 - n : 6]
    new_s = single._recache_fn(n, False)(
        params, cache_s, single.prepare_condition(pe_b), replay_s,
        jnp.asarray(6 - n, jnp.int32))
    new_p = sp._recache_fn(n, False)(
        params, cache_p, sp.prepare_condition(pe_b), replay_p,
        jnp.asarray(6 - n, jnp.int32))
    np.testing.assert_allclose(np.asarray(new_s.k), np.asarray(new_p.k),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(new_s.ring_base),
                               np.asarray(new_p.ring_base))


@pytest.mark.slow
def test_t2v_sampler_sp_parity(setup):
    """Text2VideoPipeline(mesh=) runs the 50-step sampler through
    sp_bidirectional_forward — must match the single-device sampler."""
    from longlive_tpu.pipeline import Text2VideoPipeline

    cfg, geom, params, pconfig, mesh = setup
    t2v = Text2VideoPipeline(params, cfg, attn_impl="xla")
    t2v_sp = Text2VideoPipeline(params, cfg, attn_impl="xla", mesh=mesh)
    pe = jax.random.normal(jax.random.PRNGKey(10), (1, cfg.text_len, cfg.text_dim))
    nz = jax.random.normal(
        jax.random.PRNGKey(11), (1, 3, geom.channels, geom.height, geom.width))
    kw = dict(noise=nz, sampling_steps=4, solver="unipc", dtype=jnp.float32)
    lat = t2v.generate_latents(pe, pe * 0, **kw)
    lat_sp = t2v_sp.generate_latents(pe, pe * 0, **kw)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat_sp),
                               rtol=5e-4, atol=5e-4)
