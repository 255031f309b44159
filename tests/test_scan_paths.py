"""Scanned (single-dispatch) execution paths == per-step loops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longlive_tpu.config import PipelineConfig, tiny_dit_config, tiny_geometry
from longlive_tpu.models import dit as D
from longlive_tpu.models import vae as V
from longlive_tpu.pipeline import CausalInferencePipeline


@pytest.mark.slow
def test_segment_scan_equals_block_loop():
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32, zero_head=False)
    pc = PipelineConfig(num_frame_per_block=1, local_attn_size=4, sink_size=1,
                        num_output_frames=6)
    pipe = CausalInferencePipeline(pc, params, geometry=geom, dit_config=cfg,
                                   attn_impl="xla")
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    cross = pipe.prepare_condition(pe)
    noise = jax.random.normal(jax.random.PRNGKey(2),
                              (1, 6, geom.channels, geom.height, geom.width))
    loop_lat = pipe.generate_latents(noise, cross, rng=jax.random.PRNGKey(3))
    scan_lat, cache, _ = pipe.generate_latents_scanned(
        noise, cross, rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(scan_lat), np.asarray(loop_lat),
                               rtol=1e-4, atol=1e-5)
    assert int(cache.ring_filled) == 3


@pytest.mark.slow
def test_vae_decode_scan_equals_loop():
    vcfg = V.tiny_vae_config()
    params = V.init_vae_params(jax.random.PRNGKey(0), vcfg)
    params["mean"] = jnp.zeros(vcfg.z_dim)
    params["std"] = jnp.ones(vcfg.z_dim)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 5, vcfg.z_dim, 6, 6))
    ref = V.vae_decode(params, vcfg, lat, chunk=1)
    out, _ = V.vae_decode_scan(params, vcfg, lat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_interactive_scanned_equals_per_block():
    from longlive_tpu.pipeline import InteractiveCausalInferencePipeline

    cfg = tiny_dit_config()
    geom = tiny_geometry()
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32, zero_head=False)
    pc = PipelineConfig(num_frame_per_block=1, local_attn_size=4, sink_size=1,
                        num_output_frames=8, global_sink=False)
    pipe = InteractiveCausalInferencePipeline(pc, params, geometry=geom,
                                              dit_config=cfg, attn_impl="xla")
    pa = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    pb = jax.random.normal(jax.random.PRNGKey(7), (1, cfg.text_len, cfg.text_dim))
    ca, cb = pipe.prepare_condition(pa), pipe.prepare_condition(pb)
    noise = jax.random.normal(jax.random.PRNGKey(2),
                              (1, 8, geom.channels, geom.height, geom.width))
    loop = pipe.generate_latents_interactive(noise, [ca, cb], [5],
                                             rng=jax.random.PRNGKey(3))
    scanned = pipe.generate_latents_interactive_scanned(noise, [ca, cb], [5],
                                                        rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(loop),
                               rtol=1e-4, atol=1e-5)
