"""LoRA adapter training: merge math, grad flow, trainer integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longlive_tpu.config import tiny_dit_config, tiny_geometry
from longlive_tpu.models import dit as D
from longlive_tpu.training import lora as L
from longlive_tpu.training.streaming import StreamingConfig, StreamingTrainer
from longlive_tpu.training.trainer import ScoreDistillationTrainer, TrainerConfig


def test_merge_lora_zero_delta_and_grad():
    cfg = tiny_dit_config()
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32, zero_head=False)
    lora = L.init_lora(jax.random.PRNGKey(1), params, rank=4)
    merged = L.merge_lora(params, lora, 1.0)
    # B = 0 -> delta 0 at init
    np.testing.assert_allclose(
        np.asarray(merged["blocks"]["ffn"]["fc1"]["kernel"]),
        np.asarray(params["blocks"]["ffn"]["fc1"]["kernel"]), rtol=1e-6)

    def f(lo):
        m = L.merge_lora(params, lo, 2.0)
        return jnp.sum(m["blocks"]["self_attn"]["q"]["kernel"] ** 2)

    g = jax.grad(f)(lora)
    # grads flow into B (A-grad is 0 only because B=0 AND the downstream is
    # linear in the kernel... B grads must be nonzero)
    assert float(jnp.abs(g["self_attn"]["q"]["b"]).max()) > 0


@pytest.mark.slow
def test_lora_trainer_step():
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    mk = lambda s: D.init_dit_params(jax.random.PRNGKey(s), cfg, jnp.float32,
                                     zero_head=False)
    tcfg = TrainerConfig(num_frame_per_block=1, num_training_frames=3,
                         min_num_training_frames=3, slice_last_frames=3,
                         attn_impl="xla", dfake_gen_update_ratio=2,
                         lora_rank=4, lora_alpha=4.0)
    tr = ScoreDistillationTrainer(tcfg, cfg, geom, mk(0), mk(1), mk(2))
    assert tr.use_lora and tr.state["gen_lora"] is not None
    base_before = np.asarray(tr.state["gen_params"]["blocks"]["ffn"]["fc1"]["kernel"])
    lora_b_before = np.asarray(tr.state["gen_lora"]["ffn"]["fc1"]["b"])

    noise = jax.random.normal(jax.random.PRNGKey(3),
                              (1, 3, geom.channels, geom.height, geom.width))
    pe = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.text_len, cfg.text_dim))
    m0 = tr.train_step(noise, pe, pe * 0.1, jax.random.PRNGKey(5))
    assert np.isfinite(m0["generator_loss"])
    # base frozen, adapters moved
    np.testing.assert_array_equal(
        np.asarray(tr.state["gen_params"]["blocks"]["ffn"]["fc1"]["kernel"]),
        base_before)
    assert np.abs(np.asarray(tr.state["gen_lora"]["ffn"]["fc1"]["b"]) -
                  lora_b_before).max() > 0
    m1 = tr.train_step(noise, pe, pe * 0.1, jax.random.PRNGKey(5))
    assert np.isfinite(m1["critic_loss"])


@pytest.mark.slow
def test_lora_staged_phases_step():
    """The 1.3B single-chip combo — staged_phases + LoRA adapters +
    host-offloaded AdamW.  Teacher and the frozen critic base live on host
    between phases; one gen+critic step must run and leave the bases
    untouched (trainer._gen_step_staged / _critic_step_staged)."""
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    mk = lambda s: D.init_dit_params(jax.random.PRNGKey(s), cfg, jnp.float32,
                                     zero_head=False)
    tcfg = TrainerConfig(num_frame_per_block=1, num_training_frames=3,
                         min_num_training_frames=3, slice_last_frames=3,
                         attn_impl="xla", dfake_gen_update_ratio=1,
                         lora_rank=4, lora_alpha=4.0, lora_dtype="float32",
                         staged_phases=True, opt_on_host=True)
    tr = ScoreDistillationTrainer(tcfg, cfg, geom, mk(0), mk(1), mk(2))
    assert tr.critic_lora_on
    base_before = np.asarray(tr.state["gen_params"]["blocks"]["ffn"]["fc1"]["kernel"])
    lora_b_before = np.asarray(tr.state["gen_lora"]["ffn"]["fc1"]["b"])
    crit_b_before = np.asarray(tr.state["critic_lora"]["ffn"]["fc1"]["b"])

    noise = jax.random.normal(jax.random.PRNGKey(3),
                              (1, 3, geom.channels, geom.height, geom.width))
    pe = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.text_len, cfg.text_dim))
    m0 = tr.train_step(noise, pe, pe * 0.1, jax.random.PRNGKey(5))
    assert np.isfinite(m0["generator_loss"]) and np.isfinite(m0["critic_loss"])
    np.testing.assert_array_equal(
        np.asarray(tr.state["gen_params"]["blocks"]["ffn"]["fc1"]["kernel"]),
        base_before)
    assert np.abs(np.asarray(tr.state["gen_lora"]["ffn"]["fc1"]["b"]) -
                  lora_b_before).max() > 0
    assert np.abs(np.asarray(tr.state["critic_lora"]["ffn"]["fc1"]["b"]) -
                  crit_b_before).max() > 0


@pytest.mark.slow
def test_opt_on_host_matches_device():
    """Host-offloaded AdamW (numpy f32 master + moments) must reproduce the
    on-device optax.adamw chain exactly (same clip, bias correction, decay)."""
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    mk = lambda s: D.init_dit_params(jax.random.PRNGKey(s), cfg, jnp.float32,
                                     zero_head=False)
    noise = jax.random.normal(jax.random.PRNGKey(3),
                              (1, 3, geom.channels, geom.height, geom.width))
    pe = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.text_len, cfg.text_dim))

    def run(on_host):
        tcfg = TrainerConfig(num_frame_per_block=1, num_training_frames=3,
                             min_num_training_frames=3, slice_last_frames=3,
                             attn_impl="xla", dfake_gen_update_ratio=1,
                             lora_rank=4, lora_alpha=4.0,
                             lora_dtype="float32", opt_on_host=on_host)
        tr = ScoreDistillationTrainer(tcfg, cfg, geom, mk(0), mk(1), mk(2))
        tr.train_step(noise, pe, pe * 0.1, jax.random.PRNGKey(5))
        tr.train_step(noise, pe, pe * 0.1, jax.random.PRNGKey(5))
        return tr.state["gen_lora"], tr.state["critic_lora"]

    g_dev, c_dev = run(False)
    g_host, c_host = run(True)
    for dev, host in ((g_dev, g_host), (c_dev, c_host)):
        for a, b in zip(jax.tree.leaves(dev), jax.tree.leaves(host)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("staged", [False, pytest.param(True, marks=pytest.mark.slow)])
def test_opt_async_matches_sync(staged):
    """opt_async defers the critic's host AdamW (grad D2H + numpy math +
    param H2D) to a worker thread; the update lands right before the next
    read of the critic params.  Same numpy ops on the same grads, just
    deferred → final params, optimizer state, and per-step losses must be
    IDENTICAL to the synchronous opt_on_host path; the reported
    ``critic_grad_norm`` lags one step."""
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    mk = lambda s: D.init_dit_params(jax.random.PRNGKey(s), cfg, jnp.float32,
                                     zero_head=False)
    noise = jax.random.normal(jax.random.PRNGKey(3),
                              (1, 3, geom.channels, geom.height, geom.width))
    pe = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.text_len, cfg.text_dim))

    def run(async_on):
        tcfg = TrainerConfig(num_frame_per_block=1, num_training_frames=3,
                             min_num_training_frames=3, slice_last_frames=3,
                             attn_impl="xla", dfake_gen_update_ratio=2,
                             lora_rank=4, lora_alpha=4.0, lora_dtype="float32",
                             opt_on_host=True, opt_async=async_on,
                             staged_phases=staged)
        tr = ScoreDistillationTrainer(tcfg, cfg, geom, mk(0), mk(1), mk(2))
        ms = [tr.train_step(noise, pe, pe * 0.1, jax.random.PRNGKey(5))
              for _ in range(3)]
        tr.finish_pending()
        assert tr._pending is None
        return tr, ms

    tr_s, ms_s = run(False)
    tr_a, ms_a = run(True)
    for key in ("gen_lora", "critic_lora"):
        for a, b in zip(jax.tree.leaves(tr_s.state[key]),
                        jax.tree.leaves(tr_a.state[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for key in ("gen_opt", "critic_opt"):
        assert tr_s.state[key]["t"] == tr_a.state[key]["t"]
        for sub in ("m", "v", "master"):
            for a, b in zip(jax.tree.leaves(tr_s.state[key][sub]),
                            jax.tree.leaves(tr_a.state[key][sub])):
                np.testing.assert_array_equal(a, b)
    for m_s, m_a in zip(ms_s, ms_a):
        np.testing.assert_array_equal(m_s["critic_loss"], m_a["critic_loss"])
    # the async norm is the PREVIOUS step's (produced inside the deferred
    # update): absent on step 0, step 1 reports step 0's value
    assert "critic_grad_norm" not in ms_a[0]
    np.testing.assert_allclose(ms_a[1]["critic_grad_norm"],
                               ms_s[0]["critic_grad_norm"], rtol=1e-12)


@pytest.mark.slow
def test_opt_async_streaming_matches_sync():
    """Streaming-trainer variant: the async critic update must land before
    the next chunk's critic grad (and before the generator's DMD loss on
    generator steps) — final adapter state identical to synchronous."""
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    mk = lambda s: D.init_dit_params(jax.random.PRNGKey(s), cfg, jnp.float32,
                                     zero_head=False)
    pe = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.text_len, cfg.text_dim))

    def run(async_on):
        tcfg = TrainerConfig(num_frame_per_block=1, num_training_frames=3,
                             slice_last_frames=3, attn_impl="xla",
                             dfake_gen_update_ratio=2, lora_rank=4,
                             lora_alpha=4.0, lora_dtype="float32",
                             opt_on_host=True, opt_async=async_on)
        scfg = StreamingConfig(chunk_size=3, max_length=9, min_new_frame=2,
                               switch_choices=(3,))
        tr = StreamingTrainer(tcfg, cfg, geom, mk(0), mk(1), mk(2),
                              streaming_cfg=scfg)

        def new_seq():
            tr.start_new_sequence(pe, pe * 0.1, jax.random.PRNGKey(7))

        new_seq()
        ms = []
        for _ in range(3):
            if not tr.can_generate_more():
                new_seq()
            ms.append(tr.streaming_train_step(jax.random.PRNGKey(8),
                                              new_sequence_cb=new_seq))
        tr.finish_pending()
        return tr, ms

    tr_s, ms_s = run(False)
    tr_a, ms_a = run(True)
    for key in ("gen_lora", "critic_lora"):
        for a, b in zip(jax.tree.leaves(tr_s.state[key]),
                        jax.tree.leaves(tr_a.state[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for m_s, m_a in zip(ms_s, ms_a):
        np.testing.assert_array_equal(m_s["critic_loss"], m_a["critic_loss"])


@pytest.mark.slow
def test_lora_streaming_step():
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    mk = lambda s: D.init_dit_params(jax.random.PRNGKey(s), cfg, jnp.float32,
                                     zero_head=False)
    tcfg = TrainerConfig(num_frame_per_block=1, num_training_frames=3,
                         slice_last_frames=3, attn_impl="xla",
                         dfake_gen_update_ratio=2, lora_rank=4, lora_alpha=4.0)
    scfg = StreamingConfig(chunk_size=3, max_length=6, min_new_frame=2,
                           switch_choices=(3,))
    tr = StreamingTrainer(tcfg, cfg, geom, mk(0), mk(1), mk(2),
                          streaming_cfg=scfg)
    pe = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.text_len, cfg.text_dim))
    pe_s = jax.random.normal(jax.random.PRNGKey(6), pe.shape)
    tr.start_new_sequence(pe, pe * 0.1, jax.random.PRNGKey(7), prompt_switch=pe_s)
    m0 = tr.streaming_train_step(jax.random.PRNGKey(8))
    assert np.isfinite(m0.get("generator_loss", m0.get("critic_loss")))
    m1 = tr.streaming_train_step(jax.random.PRNGKey(8))
    assert np.isfinite(m1.get("generator_loss", m1.get("critic_loss")))


def test_peft_export_roundtrip_and_reference_fold():
    """lora_to_peft_sd / peft_sd_to_lora: (a) roundtrip is exact; (b) the
    exported PEFT sd folded into the ACTUAL reference state dict
    (fold_lora_into_dit_sd, the inference stacking path) and converted
    equals merge_lora applied on our side — proving the halfsplit basis
    mapping is correct end to end."""
    import torch

    from longlive_tpu.config import tiny_dit_config, tiny_geometry
    from longlive_tpu.training.lora import init_lora, merge_lora
    from longlive_tpu.utils.checkpoint import (dit_params_from_torch,
                                               fold_lora_into_dit_sd,
                                               lora_to_peft_sd,
                                               peft_sd_to_lora)
    from ref_loader import load_causal_model

    cfg = tiny_dit_config()
    assert cfg.rope_layout == "halfsplit"
    cm = load_causal_model()
    torch.manual_seed(0)
    ref = cm.CausalWanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=cfg.text_len,
        in_dim=cfg.in_dim, dim=cfg.dim, ffn_dim=cfg.ffn_dim,
        freq_dim=cfg.freq_dim, text_dim=cfg.text_dim, out_dim=cfg.out_dim,
        num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        local_attn_size=cfg.local_attn_size, sink_size=cfg.sink_size,
        qk_norm=True, cross_attn_norm=True, eps=1e-6,
    ).eval()
    params = dit_params_from_torch(ref.state_dict(), cfg, jnp.float32)

    lora = init_lora(jax.random.PRNGKey(3), params, rank=4)
    # non-trivial B so deltas are non-zero
    lora = jax.tree.map(
        lambda x: x + 0.1 * jax.random.normal(jax.random.PRNGKey(4), x.shape),
        lora)

    peft = lora_to_peft_sd(lora, cfg)
    back = peft_sd_to_lora(peft, cfg)
    for g in lora:
        for n in lora[g]:
            for ab in ("a", "b"):
                np.testing.assert_allclose(np.asarray(lora[g][n][ab]),
                                           np.asarray(back[g][n][ab]),
                                           rtol=1e-6, atol=1e-6)

    folded_sd = fold_lora_into_dit_sd(ref.state_dict(), peft,
                                      alpha_over_rank=0.5)
    folded_ref = dit_params_from_torch(folded_sd, cfg, jnp.float32)
    folded_ours = merge_lora(params, lora, alpha_over_rank=0.5)
    flat_a = jax.tree_util.tree_leaves_with_path(folded_ref)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(folded_ours))
    checked = 0
    for path, leaf in flat_a:
        other = flat_b.get(path)
        assert other is not None, path
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(other),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=str(path))
        checked += 1
    assert checked > 20
