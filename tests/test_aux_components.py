"""Auxiliary components: teacher forcing, classify branch, initial latent,
switch pipeline, utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longlive_tpu.config import CacheConfig, PipelineConfig, tiny_dit_config, tiny_geometry
from longlive_tpu.models import dit as D
from longlive_tpu.models.dit_bidirectional import (
    bidirectional_forward_classify, init_cls_branch)
from longlive_tpu.ops import scheduler as S
from longlive_tpu.ops.rope import make_rope_tables
from longlive_tpu.pipeline import SwitchCausalInferencePipeline
from longlive_tpu.training import rollout as ro
from longlive_tpu.utils.memory import hbm_bytes, offload_to_host
from longlive_tpu.utils.profiling import PhaseTimer


@pytest.fixture(scope="module")
def base():
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32, zero_head=False)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    cross = D.prepare_cross_kv(params, cfg, pe, jnp.float32)
    return cfg, geom, params, tables, cross


@pytest.mark.slow
def test_teacher_forcing_forward(base):
    cfg, geom, params, tables, cross = base
    noisy = jax.random.normal(jax.random.PRNGKey(2), (1, 4, geom.channels, geom.height, geom.width))
    clean = jax.random.normal(jax.random.PRNGKey(3), noisy.shape)
    t = jnp.full((1, 4), 500.0)
    out = D.dit_forward_teacher_forcing(params, cfg, tables, noisy, clean, t, cross)
    assert out.shape == noisy.shape
    assert np.isfinite(np.asarray(out)).all()
    # noisy block 0 must be independent of later clean frames (mask check)
    clean2 = clean.at[:, 2:].set(clean[:, 2:] + 10.0)
    out2 = D.dit_forward_teacher_forcing(params, cfg, tables, noisy, clean2, t, cross)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out2[:, 0]),
                               rtol=1e-4, atol=1e-5)
    assert np.abs(np.asarray(out[:, 3]) - np.asarray(out2[:, 3])).max() > 1e-3


@pytest.mark.slow
def test_classify_branch(base):
    cfg, geom, params, tables, cross = base
    # tap layers are for 30-layer models; shrink for the tiny 2-layer config
    import longlive_tpu.models.dit_bidirectional as BD
    old = BD.GAN_TAP_LAYERS
    BD.GAN_TAP_LAYERS = (0, 1)
    try:
        cls = init_cls_branch(jax.random.PRNGKey(4), cfg, num_class=4)
        cls["register_tokens"] = cls["register_tokens"][:2]
        cls["gan_blocks"] = cls["gan_blocks"][:2]
        d = cfg.dim
        cls["cls_pred"]["norm"] = {"scale": jnp.ones((2 * d,)), "bias": jnp.zeros((2 * d,))}
        import longlive_tpu.models.nn as nnm
        cls["cls_pred"]["fc1"] = nnm.init_linear(jax.random.PRNGKey(5), 2 * d, d)
        x = jax.random.normal(jax.random.PRNGKey(6), (1, 2, geom.channels, geom.height, geom.width))
        flow, logits = bidirectional_forward_classify(
            params, cls, cfg, tables, x, jnp.asarray([500.0]), cross, attn_impl="xla")
        assert flow.shape == x.shape and logits.shape == (1, 4)
        assert np.isfinite(np.asarray(logits)).all()
    finally:
        BD.GAN_TAP_LAYERS = old


@pytest.mark.slow
def test_rollout_initial_latent(base):
    cfg, geom, params, tables, cross = base
    sched = S.make_schedule(1000, shift=5.0, sigma_min=0.0, extra_one_step=True)
    rcfg = ro.RolloutConfig(denoise_timesteps=(1000.0, 937.5), frame_block=1,
                            attn_impl="xla", remat=False)
    cache_cfg = CacheConfig(1, 5, geom.frame_seq_length)
    init = jax.random.normal(jax.random.PRNGKey(7), (1, 1, geom.channels, geom.height, geom.width))
    noise = jax.random.normal(jax.random.PRNGKey(8), (1, 2, geom.channels, geom.height, geom.width))
    lat, cache, _ = ro.rollout_trajectory(
        params, cfg, cache_cfg, tables, sched, rcfg, noise, cross,
        jax.random.PRNGKey(9), exit_idx=1, initial_latent=init)
    assert lat.shape == noise.shape
    assert int(cache.ring_filled) == 2  # init frame in sink + 2 generated


@pytest.mark.slow
def test_switch_pipeline(base):
    cfg, geom, params, tables, cross = base
    pc = PipelineConfig(num_frame_per_block=1, local_attn_size=4, sink_size=1,
                        num_output_frames=6, global_sink=False)
    pipe = SwitchCausalInferencePipeline(pc, params, geometry=geom, dit_config=cfg,
                                         attn_impl="xla")
    pe2 = jax.random.normal(jax.random.PRNGKey(10), (1, cfg.text_len, cfg.text_dim))
    cross2 = pipe.prepare_condition(pe2)
    noise = jax.random.normal(jax.random.PRNGKey(11),
                              (1, 6, geom.channels, geom.height, geom.width))
    lat = pipe.generate_latents_switch(noise, cross, cross2, 3)
    assert lat.shape == noise.shape and np.isfinite(np.asarray(lat)).all()


def test_memory_utils(base):
    cfg, geom, params, *_ = base
    n = hbm_bytes(params)
    assert n > 0
    host = offload_to_host({"w": jnp.ones((4, 4))})
    back = jax.device_put(host["w"])
    np.testing.assert_array_equal(np.asarray(back), np.ones((4, 4)))


def test_phase_timer():
    pt = PhaseTimer()
    with pt.phase("a"):
        pass
    assert "a" in pt.report()


@pytest.mark.slow
def test_teacher_forcing_flash_path_matches_dense(base):
    """VERDICT r3 item 5: the TF forward routed through the arithmetic-mask
    flash kernel (mask_kind='teacher_forcing') matches the dense-bias path —
    the kernel is the only TF path usable at the 21-frame training geometry
    (dense needs a ~17 GB [2S,2S] bias)."""
    cfg, geom, params, tables, cross = base
    noisy = jax.random.normal(jax.random.PRNGKey(2),
                              (1, 4, geom.channels, geom.height, geom.width))
    clean = jax.random.normal(jax.random.PRNGKey(3), noisy.shape)
    t = jnp.full((1, 4), 500.0)
    aug = jnp.full((1, 4), 100.0)
    dense = D.dit_forward_teacher_forcing(params, cfg, tables, noisy, clean,
                                          t, cross, aug_t=aug, attn_impl="xla")
    flash = D.dit_forward_teacher_forcing(params, cfg, tables, noisy, clean,
                                          t, cross, aug_t=aug,
                                          attn_impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)


def test_teacher_forcing_auto_resolves_off_tpu(base):
    """ADVICE r4: attn_impl='auto' (the dmd.py default) must resolve to the
    xla path on a CPU backend instead of hitting a non-interpret pallas_call
    at lowering — same backend/head_dim rule as ops.attention.attend()."""
    cfg, geom, params, tables, cross = base
    noisy = jax.random.normal(jax.random.PRNGKey(2),
                              (1, 2, geom.channels, geom.height, geom.width))
    clean = jax.random.normal(jax.random.PRNGKey(3), noisy.shape)
    t = jnp.full((1, 2), 500.0)
    auto = D.dit_forward_teacher_forcing(params, cfg, tables, noisy, clean,
                                         t, cross, attn_impl="auto")
    ref = D.dit_forward_teacher_forcing(params, cfg, tables, noisy, clean,
                                        t, cross, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(auto), np.asarray(ref), rtol=0, atol=0)
