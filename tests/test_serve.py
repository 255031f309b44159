"""PipelinedRenderer (two-device generate/decode overlap) == sequential."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longlive_tpu.config import PipelineConfig, tiny_dit_config, tiny_geometry
from longlive_tpu.models import dit as D
from longlive_tpu.models import vae as V
from longlive_tpu.pipeline import CausalInferencePipeline, PipelinedRenderer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32, zero_head=False)
    pconfig = PipelineConfig(
        denoising_step_list=(1000, 500), warp_denoising_step=True,
        num_frame_per_block=cfg.num_frame_per_block, timestep_shift=5.0,
        local_attn_size=cfg.local_attn_size, sink_size=cfg.sink_size,
        num_output_frames=6, context_noise=0, global_sink=False)
    vcfg = V.tiny_vae_config()
    vae_params = V.init_vae_params(jax.random.PRNGKey(1), vcfg, jnp.float32)
    return cfg, geom, params, pconfig, vcfg, vae_params


@pytest.mark.slow
def test_pipelined_render_matches_sequential(setup):
    cfg, geom, params, pconfig, vcfg, vae_params = setup
    pipe = CausalInferencePipeline(pconfig, params, geometry=geom,
                                   dit_config=cfg, attn_impl="xla")
    pe = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim))
    cross = pipe.prepare_condition(pe)
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (1, 6, geom.channels, geom.height, geom.width))

    # sequential reference: full generation, then one streaming decode
    lat, _, _ = pipe.generate_latents_scanned(noise, cross)
    lat_z = lat[:, :, : vcfg.z_dim].astype(jnp.float32)
    px_ref, _ = V.vae_decode_scan(vae_params, vcfg, lat_z, None, True)

    # pipelined: segments of 2 frames, decode on a second device
    renderer = PipelinedRenderer(
        pipe, vae_params, vcfg, segment_frames=2,
        decode_device=jax.devices()[1])
    # tiny DiT emits out_dim = z_dim channels already
    px_pipe = renderer.render(noise, cross, dtype=jnp.float32)

    assert px_pipe.shape == px_ref.shape
    np.testing.assert_allclose(np.asarray(px_ref), np.asarray(px_pipe),
                               rtol=2e-4, atol=2e-4)
    # output landed on the decode device
    assert jax.devices()[1] in {d for d in px_pipe.devices()}


@pytest.mark.slow
def test_per_stream_decode_matches_batched(setup):
    """per_stream_decode=True splits a B=2 render's VAE work into two B=1
    decode calls with independent conv-cache chains (the decode device's
    peak HBM halves — the B=2 full-VAE OOM fix for pipelined serving).
    The VAE has no cross-sample ops, so the pixels must match the batched
    decode."""
    cfg, geom, params, pconfig, vcfg, vae_params = setup
    pipe = CausalInferencePipeline(pconfig, params, geometry=geom,
                                   dit_config=cfg, attn_impl="xla")
    pe = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.text_len, cfg.text_dim))
    cross = pipe.prepare_condition(pe)
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (2, 6, geom.channels, geom.height, geom.width))

    batched = PipelinedRenderer(
        pipe, vae_params, vcfg, segment_frames=2,
        decode_device=jax.devices()[1])
    px_ref = batched.render(noise, cross, dtype=jnp.float32)

    streamed = PipelinedRenderer(
        pipe, vae_params, vcfg, segment_frames=2,
        decode_device=jax.devices()[1], per_stream_decode=True)
    px_str = streamed.render(noise, cross, dtype=jnp.float32)

    assert px_str.shape == px_ref.shape
    np.testing.assert_allclose(np.asarray(px_ref), np.asarray(px_str),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_pipelined_render_composes_with_sp_generation(setup):
    """The full multi-chip serving claim in one test: generation sharded
    over an sp=2 mesh (devices 0-1) while the VAE decodes pipelined on a
    THIRD device — output must match single-device sequential rendering."""
    from longlive_tpu.parallel import mesh as M

    cfg, geom, params, pconfig, vcfg, vae_params = setup
    pipe = CausalInferencePipeline(pconfig, params, geometry=geom,
                                   dit_config=cfg, attn_impl="xla")
    mesh = M.make_mesh(dp=1, fsdp=1, sp=2, devices=jax.devices()[:2])
    pipe_sp = CausalInferencePipeline(pconfig, params, geometry=geom,
                                      dit_config=cfg, attn_impl="xla",
                                      mesh=mesh)
    pe = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim))
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (1, 6, geom.channels, geom.height, geom.width))

    lat, _, _ = pipe.generate_latents_scanned(noise, pipe.prepare_condition(pe))
    lat_z = lat[:, :, : vcfg.z_dim].astype(jnp.float32)
    px_ref, _ = V.vae_decode_scan(vae_params, vcfg, lat_z, None, True)

    renderer = PipelinedRenderer(
        pipe_sp, vae_params, vcfg, segment_frames=2,
        decode_device=jax.devices()[2])
    px_pipe = renderer.render(noise, pipe_sp.prepare_condition(pe),
                              dtype=jnp.float32)

    assert px_pipe.shape == px_ref.shape
    np.testing.assert_allclose(np.asarray(px_ref), np.asarray(px_pipe),
                               rtol=5e-4, atol=5e-4)
    assert jax.devices()[2] in {d for d in px_pipe.devices()}


@pytest.mark.slow
def test_pipelined_render_reactive_switch(setup):
    """poll_switch on the pipelined renderer == manual generate +
    reactive_switch + generate, decoded sequentially (full-window replay
    is reference-exact, so the paths must agree bitwise in latents and to
    conv-cache round-off in pixels)."""
    cfg, geom, params, pconfig, vcfg, vae_params = setup
    pipe = CausalInferencePipeline(pconfig, params, geometry=geom,
                                   dit_config=cfg, attn_impl="xla")
    pe_a = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim))
    pe_b = jax.random.normal(jax.random.PRNGKey(7), (1, cfg.text_len, cfg.text_dim))
    ca, cb = pipe.prepare_condition(pe_a), pipe.prepare_condition(pe_b)
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (1, 6, geom.channels, geom.height, geom.width))

    # manual reference: 4 frames under A, reactive switch, 2 under B
    rng0 = jax.random.PRNGKey(pipe.config.seed)
    lat_a, cache, rng = pipe.generate_latents_scanned(noise[:, :4], ca,
                                                      rng=rng0)
    cache = pipe.reactive_switch(cache, lat_a, cb, 4)
    lat_b, _, _ = pipe.generate_latents_scanned(noise[:, 4:], cb, rng=rng,
                                                cache=cache, start_frame=4)
    lat_ref = jnp.concatenate([lat_a, lat_b], axis=1)
    lat_z = lat_ref[:, :, : vcfg.z_dim].astype(jnp.float32)
    px_ref, _ = V.vae_decode_scan(vae_params, vcfg, lat_z, None, True)

    renderer = PipelinedRenderer(pipe, vae_params, vcfg, segment_frames=2,
                                 decode_device=jax.devices()[1])
    px = renderer.render(noise, ca, dtype=jnp.float32,
                         poll_switch=lambda s: cb if s == 4 else None)
    np.testing.assert_allclose(np.asarray(px_ref), np.asarray(px),
                               rtol=2e-4, atol=2e-4)
