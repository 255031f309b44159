"""Streaming long-tuning state machine tests (tiny geometry)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longlive_tpu.config import tiny_dit_config, tiny_geometry
from longlive_tpu.models import dit as D
from longlive_tpu.models import vae as V
from longlive_tpu.training.streaming import StreamingConfig, StreamingTrainer
from longlive_tpu.training.trainer import TrainerConfig


@pytest.fixture(scope="module")
def streaming_setup():
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    mk = lambda s: D.init_dit_params(jax.random.PRNGKey(s), cfg, jnp.float32,
                                     zero_head=False)
    tcfg = TrainerConfig(num_frame_per_block=1, num_training_frames=3,
                         slice_last_frames=3, attn_impl="xla",
                         dfake_gen_update_ratio=2, ema_start_step=0)
    scfg = StreamingConfig(chunk_size=3, max_length=8, min_new_frame=2,
                           switch_choices=(4,), global_sink=False)
    vcfg = V.tiny_vae_config()
    vae_params = V.init_vae_params(jax.random.PRNGKey(9), vcfg)
    vae_params["mean"] = jnp.zeros(vcfg.z_dim)
    vae_params["std"] = jnp.ones(vcfg.z_dim)
    tr = StreamingTrainer(
        tcfg, cfg, geom, mk(0), mk(1), mk(2),
        streaming_cfg=scfg, vae_params=vae_params, vae_cfg=vcfg)
    pe_c = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.text_len, cfg.text_dim))
    pe_u = pe_c * 0.1
    pe_s = jax.random.normal(jax.random.PRNGKey(4), pe_c.shape)
    return tr, pe_c, pe_u, pe_s


@pytest.mark.slow
def test_streaming_sequence_with_switch(streaming_setup):
    tr, cross_c, cross_u, cross_s = streaming_setup
    tr.start_new_sequence(cross_c, cross_u, jax.random.PRNGKey(0),
                          prompt_switch=cross_s)
    assert tr.seq_state["switch_frame_index"] == 4
    lengths, switched_at = [], None
    i = 0
    while tr.can_generate_more() and i < 10:
        m = tr.streaming_train_step(jax.random.PRNGKey(42))
        assert np.isfinite(m.get("generator_loss", m.get("critic_loss")))
        lengths.append(m["current_length"])
        if m["switched"]:
            switched_at = m["current_length"] - m["new_frames"]
        i += 1
    # step 0 trains generator AND critic (reference cadence): first chunk of
    # 3 frames + a 2-frame critic chunk; later steps are critic-only
    assert lengths[0] == 5
    assert lengths[-1] >= 7
    assert tr.seq_state["has_switched"]
    assert switched_at is not None and switched_at <= 4
    # supervised chunks stay chunk_size frames with overlap
    assert tr.seq_state["previous_frames"].shape[1] == 3


@pytest.mark.slow
def test_streaming_no_switch_runs(streaming_setup):
    tr, cross_c, cross_u, _ = streaming_setup
    tr.start_new_sequence(cross_c, cross_u, jax.random.PRNGKey(1))
    m = tr.streaming_train_step(jax.random.PRNGKey(7))
    assert np.isfinite(m.get("generator_loss", m.get("critic_loss")))
    assert not m["switched"]


@pytest.mark.slow
def test_streaming_skip_first_chunk(streaming_setup):
    tr, pe_c, pe_u, _ = streaming_setup
    old = tr.scfg.train_first_chunk
    tr.scfg.train_first_chunk = False
    try:
        tr.start_new_sequence(pe_c, pe_u, jax.random.PRNGKey(5))
        m = tr.streaming_train_step(jax.random.PRNGKey(6))
        # the first trained chunk starts AFTER the untrained seed chunk
        assert m["current_length"] > tr.scfg.chunk_size
        assert np.isfinite(m.get("generator_loss", m.get("critic_loss")))
    finally:
        tr.scfg.train_first_chunk = old


@pytest.mark.slow
@pytest.mark.parametrize("block_vjp", [False, True])
def test_streaming_staged_matches_monolithic(block_vjp):
    """staged_phases on the streaming chunk step (3-jit split, host-paged
    teacher) must reproduce the monolithic step: same losses and updated
    params after two streaming steps (gen+critic then critic-only).
    ``block_vjp`` additionally runs the generator backward per block,
    continuing the persistent cache from cur_start with the chunk
    cotangent's overlap frames dropped (stop-grad context) — still exact."""
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    mk = lambda s: D.init_dit_params(jax.random.PRNGKey(s), cfg, jnp.float32,
                                     zero_head=False)
    scfg = StreamingConfig(chunk_size=3, max_length=8, min_new_frame=2)
    kw = dict(num_frame_per_block=1, num_training_frames=3,
              slice_last_frames=3, attn_impl="xla", dfake_gen_update_ratio=2)

    def run(staged):
        tcfg = TrainerConfig(**kw, staged_phases=staged,
                             block_vjp=staged and block_vjp)
        tr = StreamingTrainer(tcfg, cfg, geom, mk(0), mk(1), mk(2),
                              streaming_cfg=scfg)
        pe_c = jax.random.normal(jax.random.PRNGKey(3),
                                 (1, cfg.text_len, cfg.text_dim))
        tr.start_new_sequence(pe_c, pe_c * 0.1, jax.random.PRNGKey(1))
        m0 = tr.streaming_train_step(jax.random.PRNGKey(7))
        m1 = tr.streaming_train_step(jax.random.PRNGKey(8))
        return m0, m1, tr.state

    a0, a1, sa = run(False)
    b0, b1, sb = run(True)
    np.testing.assert_allclose(b0["generator_loss"], a0["generator_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(b0["critic_loss"], a0["critic_loss"], rtol=1e-5)
    np.testing.assert_allclose(b1["critic_loss"], a1["critic_loss"], rtol=1e-4)
    for key in ("gen_params", "critic_params"):
        for x, y in zip(jax.tree.leaves(sa[key]), jax.tree.leaves(sb[key])):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       rtol=2e-4, atol=2e-5)
