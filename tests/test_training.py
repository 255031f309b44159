"""Training-stack tests: rollout gradients, DMD losses, trainer step, FSDP
sharding over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longlive_tpu.config import (CacheConfig, LatentGeometry, tiny_dit_config,
                                 tiny_geometry)
from longlive_tpu.models import dit as D
from longlive_tpu.models.dit_bidirectional import bidirectional_forward
from longlive_tpu.ops import scheduler as S
from longlive_tpu.ops.rope import make_rope_tables
from longlive_tpu.parallel import mesh as M
from longlive_tpu.training import dmd as dmd_mod
from longlive_tpu.training import rollout as ro
from longlive_tpu.training.trainer import ScoreDistillationTrainer, TrainerConfig


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    gen = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32, zero_head=False)
    critic = D.init_dit_params(jax.random.PRNGKey(1), cfg, jnp.float32, zero_head=False)
    teacher = D.init_dit_params(jax.random.PRNGKey(2), cfg, jnp.float32, zero_head=False)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    sched = S.make_schedule(1000, shift=5.0, sigma_min=0.0, extra_one_step=True,
                            training=True)
    prompts = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.text_len, cfg.text_dim))
    cross_c = D.prepare_cross_kv(gen, cfg, prompts, jnp.float32)
    cross_u = D.prepare_cross_kv(gen, cfg, prompts * 0.1, jnp.float32)
    return cfg, geom, gen, critic, teacher, tables, sched, cross_c, cross_u


def test_bidirectional_forward_shape(setup):
    cfg, geom, gen, *_ = setup
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    prompts = jax.random.normal(jax.random.PRNGKey(4), (2, cfg.text_len, cfg.text_dim))
    cross = D.prepare_cross_kv(gen, cfg, prompts, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 4, geom.channels, geom.height, geom.width))
    t = jnp.asarray([500.0, 250.0])
    out = bidirectional_forward(gen, cfg, tables, x, t, cross, attn_impl="xla")
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_rollout_gradient_structure(setup):
    """Gradient must flow only through exit-step forwards of blocks at/after
    start_gradient_frame."""
    cfg, geom, gen, critic, teacher, tables, sched, cross_c, cross_u = setup
    cache_cfg = CacheConfig(1, 5, geom.frame_seq_length)
    rcfg = ro.RolloutConfig(denoise_timesteps=(1000.0, 937.5, 833.33, 625.0),
                            frame_block=1, attn_impl="xla", remat=False)
    noise = jax.random.normal(jax.random.PRNGKey(6),
                              (1, 3, geom.channels, geom.height, geom.width))

    def latents_sum(gp, grad_start):
        lat, _, _ = ro.rollout_trajectory(
            gp, cfg, cache_cfg, tables, sched, rcfg, noise, cross_c,
            jax.random.PRNGKey(7), exit_idx=1, start_gradient_frame=grad_start)
        return jnp.sum(lat ** 2)

    g_all = jax.grad(lambda p: latents_sum(p, 0))(gen)
    g_none = jax.grad(lambda p: latents_sum(p, 99))(gen)
    n_all = float(jax.tree.reduce(lambda a, x: a + jnp.sum(jnp.abs(x)), g_all, 0.0))
    n_none = float(jax.tree.reduce(lambda a, x: a + jnp.sum(jnp.abs(x)), g_none, 0.0))
    assert n_all > 0.0
    assert n_none == 0.0


@pytest.mark.slow
def test_dmd_losses_finite(setup):
    cfg, geom, gen, critic, teacher, tables, sched, cross_c, cross_u = setup
    dcfg = dmd_mod.DMDConfig(timestep_shift=5.0)
    lat = jax.random.normal(jax.random.PRNGKey(8),
                            (1, 3, geom.channels, geom.height, geom.width))
    pe_c = jax.random.normal(jax.random.PRNGKey(30), (1, cfg.text_len, cfg.text_dim))
    pe_u = pe_c * 0.1
    loss, aux = dmd_mod.distribution_matching_loss(
        lat, critic, teacher, cfg, tables, sched, dcfg, pe_c, pe_u,
        jax.random.PRNGKey(9), attn_impl="xla")
    assert np.isfinite(float(loss))
    closs, _ = dmd_mod.critic_denoising_loss(
        critic, lat, cfg, tables, sched, dcfg, pe_c,
        jax.random.PRNGKey(10), attn_impl="xla")
    assert np.isfinite(float(closs))

    # generator gradient through the DMD loss is nonzero
    def gl(l):
        loss, _ = dmd_mod.distribution_matching_loss(
            l, critic, teacher, cfg, tables, sched, dcfg, pe_c, pe_u,
            jax.random.PRNGKey(9), attn_impl="xla")
        return loss

    g = jax.grad(gl)(lat)
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_trainer_steps(setup):
    cfg, geom, gen, critic, teacher, tables, sched, cross_c, cross_u = setup
    tcfg = TrainerConfig(num_frame_per_block=1, num_training_frames=3,
                         slice_last_frames=3, attn_impl="xla",
                         dfake_gen_update_ratio=2)
    # the trainer donates its param buffers; keep the fixture's intact
    copy = lambda t: jax.tree.map(jnp.copy, t)
    tr = ScoreDistillationTrainer(tcfg, cfg, geom, copy(gen), copy(critic), teacher)
    noise = jax.random.normal(jax.random.PRNGKey(11),
                              (1, 3, geom.channels, geom.height, geom.width))
    pe_c = jax.random.normal(jax.random.PRNGKey(31), (1, cfg.text_len, cfg.text_dim))
    pe_u = pe_c * 0.1
    m0 = tr.train_step(noise, pe_c, pe_u, jax.random.PRNGKey(12))
    # reference cadence: critic every step, generator every ratio-th step
    assert "generator_loss" in m0 and np.isfinite(m0["generator_loss"])
    assert "critic_loss" in m0 and np.isfinite(m0["critic_loss"])
    m1 = tr.train_step(noise, pe_c, pe_u, jax.random.PRNGKey(12))
    assert "critic_loss" in m1 and "generator_loss" not in m1
    m2 = tr.train_step(noise, pe_c, pe_u, jax.random.PRNGKey(12))
    assert "generator_loss" in m2


def test_phase_ledger_reports_device_time_split(setup):
    """TrainerConfig.phase_ledger (VERDICT r4 item 4): the staged trainer
    brackets each phase with a device sync and reports a ``phase_ms`` dict
    in the step metrics — the measured compute-vs-transfer split the PERF
    training table quotes.  Results must be unchanged (the brackets only
    time)."""
    cfg, geom, gen, critic, teacher, tables, sched, cross_c, cross_u = setup
    kw = dict(num_frame_per_block=1, num_training_frames=3,
              slice_last_frames=3, attn_impl="xla", dfake_gen_update_ratio=1)
    copy = lambda t: jax.tree.map(jnp.copy, t)
    noise = jax.random.normal(jax.random.PRNGKey(11),
                              (1, 3, geom.channels, geom.height, geom.width))
    pe_c = jax.random.normal(jax.random.PRNGKey(31),
                             (1, cfg.text_len, cfg.text_dim))
    pe_u = pe_c * 0.1

    tr_a = ScoreDistillationTrainer(
        TrainerConfig(**kw, staged_phases=True), cfg, geom,
        copy(gen), copy(critic), copy(teacher))
    m_a = tr_a.train_step(noise, pe_c, pe_u, jax.random.PRNGKey(12))
    tr_b = ScoreDistillationTrainer(
        TrainerConfig(**kw, staged_phases=True, phase_ledger=True),
        cfg, geom, copy(gen), copy(critic), copy(teacher))
    m_b = tr_b.train_step(noise, pe_c, pe_u, jax.random.PRNGKey(12))

    assert "phase_ms" in m_b and "phase_ms" not in m_a
    for phase in ("gen_rollout_fwd", "dmd_loss_grad", "gen_rollout_vjp",
                  "critic_rollout_fwd", "critic_loss_grad"):
        assert phase in m_b["phase_ms"], sorted(m_b["phase_ms"])
        assert m_b["phase_ms"][phase] > 0.0
    np.testing.assert_allclose(m_b["generator_loss"], m_a["generator_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(m_b["critic_loss"], m_a["critic_loss"],
                               rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("page_gen", [False, True])
def test_staged_phases_matches_monolithic(setup, page_gen):
    """tcfg.staged_phases splits each update into rollout-fwd / DMD-loss-grad
    / rollout-VJP jits with the frozen teacher paged to host between phases.
    Exact by the chain rule (dL/dθ = (∂L/∂latents)ᵀ·∂latents/∂θ), so one
    train_step must match the monolithic step up to compilation-scheduling
    noise.  ``page_gen`` additionally pages the generator tree to host
    during the loss-grad phase (TrainerConfig.page_generator) — pure data
    movement, so results must be identical."""
    cfg, geom, gen, critic, teacher, tables, sched, cross_c, cross_u = setup
    kw = dict(num_frame_per_block=1, num_training_frames=3,
              slice_last_frames=3, attn_impl="xla", dfake_gen_update_ratio=1)
    copy = lambda t: jax.tree.map(jnp.copy, t)
    noise = jax.random.normal(jax.random.PRNGKey(11),
                              (1, 3, geom.channels, geom.height, geom.width))
    pe_c = jax.random.normal(jax.random.PRNGKey(31),
                             (1, cfg.text_len, cfg.text_dim))
    pe_u = pe_c * 0.1

    tr_a = ScoreDistillationTrainer(TrainerConfig(**kw), cfg, geom,
                                    copy(gen), copy(critic), copy(teacher))
    m_a = tr_a.train_step(noise, pe_c, pe_u, jax.random.PRNGKey(12))
    tr_b = ScoreDistillationTrainer(
        TrainerConfig(**kw, staged_phases=True, page_generator=page_gen),
        cfg, geom, copy(gen), copy(critic), copy(teacher))
    m_b = tr_b.train_step(noise, pe_c, pe_u, jax.random.PRNGKey(12))

    np.testing.assert_allclose(m_b["generator_loss"], m_a["generator_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(m_b["critic_loss"], m_a["critic_loss"],
                               rtol=1e-5)
    for key in ("gen_params", "critic_params"):
        for a, b in zip(jax.tree.leaves(tr_a.state[key]),
                        jax.tree.leaves(tr_b.state[key])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_block_vjp_matches_monolithic(setup):
    """tcfg.block_vjp runs the generator rollout VJP as an eager per-block
    loop (rollout.rollout_block) with f32 grad accumulation.  Exact: the
    cache chain and the re-noising RNG are stop-gradded, so per-block VJP
    contributions are additive — one train_step must match the monolithic
    step up to compilation-scheduling noise.  (This is the 21-frame
    full-geometry OOM fix: the monolithic VJP's backward saves every
    differentiated block's KV cache input — 21.6 GiB of temps at 1.3B,
    scripts/train_probe_1p3b.py --mode mem_analysis.)"""
    cfg, geom, gen, critic, teacher, tables, sched, cross_c, cross_u = setup
    kw = dict(num_frame_per_block=1, num_training_frames=3,
              slice_last_frames=3, attn_impl="xla", dfake_gen_update_ratio=1)
    copy = lambda t: jax.tree.map(jnp.copy, t)
    noise = jax.random.normal(jax.random.PRNGKey(11),
                              (1, 3, geom.channels, geom.height, geom.width))
    pe_c = jax.random.normal(jax.random.PRNGKey(31),
                             (1, cfg.text_len, cfg.text_dim))
    pe_u = pe_c * 0.1

    tr_a = ScoreDistillationTrainer(TrainerConfig(**kw), cfg, geom,
                                    copy(gen), copy(critic), copy(teacher))
    m_a = tr_a.train_step(noise, pe_c, pe_u, jax.random.PRNGKey(12))
    tr_b = ScoreDistillationTrainer(
        TrainerConfig(**kw, staged_phases=True, block_vjp=True),
        cfg, geom, copy(gen), copy(critic), copy(teacher))
    m_b = tr_b.train_step(noise, pe_c, pe_u, jax.random.PRNGKey(12))

    np.testing.assert_allclose(m_b["generator_loss"], m_a["generator_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(m_b["critic_loss"], m_a["critic_loss"],
                               rtol=1e-5)
    for key in ("gen_params", "critic_params"):
        for a, b in zip(jax.tree.leaves(tr_a.state[key]),
                        jax.tree.leaves(tr_b.state[key])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_gradient_accumulation(setup):
    """With gradient_accumulation_steps=2 (optax.MultiSteps), params change
    only on every 2nd micro-step — the reference's scaled-loss accumulation
    (distillation.py:853-875)."""
    cfg, geom, gen, critic, teacher, tables, sched, cross_c, cross_u = setup
    tcfg = TrainerConfig(num_frame_per_block=1, num_training_frames=3,
                         slice_last_frames=3, attn_impl="xla",
                         dfake_gen_update_ratio=3,
                         gradient_accumulation_steps=2)
    copy = lambda t: jax.tree.map(jnp.copy, t)
    tr = ScoreDistillationTrainer(tcfg, cfg, geom, copy(gen), copy(critic), teacher)
    noise = jax.random.normal(jax.random.PRNGKey(11),
                              (1, 3, geom.channels, geom.height, geom.width))
    pe_c = jax.random.normal(jax.random.PRNGKey(31), (1, cfg.text_len, cfg.text_dim))
    before = jax.tree.leaves(tr.state["critic_params"])[0].copy()
    tr.train_step(noise, pe_c, pe_c * 0.1, jax.random.PRNGKey(12))
    mid = jax.tree.leaves(tr.state["critic_params"])[0]
    np.testing.assert_array_equal(np.asarray(mid), np.asarray(before))
    tr.train_step(noise, pe_c, pe_c * 0.1, jax.random.PRNGKey(13))
    after = jax.tree.leaves(tr.state["critic_params"])[0]
    assert not np.array_equal(np.asarray(after), np.asarray(before))


def test_fsdp_sharding_8dev(setup):
    """Params shard over the fsdp axis; a sharded forward runs and matches
    the unsharded result."""
    cfg, geom, gen, *_ = setup
    mesh = M.make_mesh(dp=1, fsdp=8, sp=1)
    sharded = M.shard_params(gen, mesh)
    # ffn fc1 kernel [L, d, ffn=128]: 128 % 8 == 0 -> sharded on last dim
    sh = sharded["blocks"]["ffn"]["fc1"]["kernel"].sharding
    assert "fsdp" in str(sh.spec)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    prompts = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.text_len, cfg.text_dim))
    cross = D.prepare_cross_kv(gen, cfg, prompts, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 2, geom.channels, geom.height, geom.width))
    t = jnp.asarray([500.0])
    ref = bidirectional_forward(gen, cfg, tables, x, t, cross, attn_impl="xla")
    out = jax.jit(lambda p: bidirectional_forward(p, cfg, tables, x, t, cross,
                                                  attn_impl="xla"))(sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_denoising_loss_variants(setup):
    cfg, geom, gen, critic, teacher, tables, sched, *_ = setup
    from longlive_tpu.training.dmd import denoising_loss
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 2, 4, 8, 8), jnp.float32)
    xp = jnp.asarray(rng.randn(1, 2, 4, 8, 8), jnp.float32)
    nz = jnp.asarray(rng.randn(1, 2, 4, 8, 8), jnp.float32)
    t = jnp.full((1, 2, 1, 1, 1), 500.0)
    xt = x * 0.5 + nz * 0.5
    for lt in ("x0", "v", "noise", "flow"):
        fp = (nz - xp) if lt == "flow" else None
        val = denoising_loss(lt, sched, x, xp, nz, xt, t, flow_pred=fp)
        assert np.isfinite(float(val)), lt
    # x0 variant == plain mse
    np.testing.assert_allclose(
        float(denoising_loss("x0", sched, x, xp, nz, xt, t)),
        float(jnp.mean(jnp.square(x - xp))), rtol=1e-6)
    # v variant (reference VPredLoss, utils/loss.py:43-56) == x0 error
    # weighted by 1/(1-alpha_bar) with the VP mapping alpha_bar=a^2/(a^2+s^2)
    from longlive_tpu.ops import scheduler as S
    sig = sched.sigmas[S.timestep_id(sched, t)]
    w = (jnp.square(1 - sig) + jnp.square(sig)) / jnp.square(sig)
    np.testing.assert_allclose(
        float(denoising_loss("v", sched, x, xp, nz, xt, t)),
        float(jnp.mean(w * jnp.square(x - xp))), rtol=1e-5)
    # v upweights vs x0 (weight > 1 for every sigma < 1)
    assert float(denoising_loss("v", sched, x, xp, nz, xt, t)) > float(
        denoising_loss("x0", sched, x, xp, nz, xt, t))


@pytest.mark.slow
def test_streaming_trainer_dp2_mesh(setup):
    """Streaming long tuning with data-parallel batch 2 over a (dp=2, fsdp=4)
    mesh: sharded params + batch-sharded sequence state run a full step."""
    from longlive_tpu.training.streaming import StreamingConfig, StreamingTrainer

    cfg, geom, gen, critic, teacher, *_ = setup
    mesh = M.make_mesh(dp=2, fsdp=4, sp=1)
    copy = lambda t: jax.tree.map(jnp.copy, t)
    gen_s = M.shard_params(copy(gen), mesh)
    critic_s = M.shard_params(copy(critic), mesh)
    teacher_s = M.shard_params(copy(teacher), mesh)
    tcfg = TrainerConfig(num_frame_per_block=1, num_training_frames=3,
                         slice_last_frames=-1, attn_impl="xla",
                         dfake_gen_update_ratio=5)
    scfg = StreamingConfig(chunk_size=3, min_new_frame=2, max_length=8)
    tr = StreamingTrainer(tcfg, cfg, geom, gen_s, critic_s, teacher_s,
                          streaming_cfg=scfg, mesh=mesh)
    pe_c = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.text_len, cfg.text_dim))
    pe_c = jax.device_put(pe_c, M.batch_sharding(mesh))
    tr.start_new_sequence(pe_c, pe_c * 0.1, jax.random.PRNGKey(0))
    m = tr.streaming_train_step(jax.random.PRNGKey(1))
    assert np.isfinite(m["generator_loss"]) and np.isfinite(m["critic_loss"])
    assert m["current_length"] >= scfg.chunk_size


@pytest.mark.slow
def test_sharded_train_step_matches_single_device(setup):
    """One full DMD train step (generator + critic update) on the (dp=2,
    fsdp=4) mesh produces the same losses and updated parameters as the
    unsharded step — the sharding rules are a pure layout choice.
    Tolerance covers collective reduction reordering in f32."""
    cfg, geom, gen, critic, teacher, *_ = setup
    copy = lambda t: jax.tree.map(jnp.copy, t)
    tcfg = TrainerConfig(num_frame_per_block=1, num_training_frames=3,
                         slice_last_frames=3, attn_impl="xla",
                         dfake_gen_update_ratio=1)
    noise = jax.random.normal(
        jax.random.PRNGKey(21), (2, 3, geom.channels, geom.height, geom.width))
    pe_c = jax.random.normal(jax.random.PRNGKey(22),
                             (2, cfg.text_len, cfg.text_dim))
    pe_u = pe_c * 0.1

    tr0 = ScoreDistillationTrainer(tcfg, cfg, geom, copy(gen), copy(critic),
                                   teacher)
    m0 = tr0.train_step(noise, pe_c, pe_u, jax.random.PRNGKey(23))

    mesh = M.make_mesh(dp=2, fsdp=4, sp=1)
    tr1 = ScoreDistillationTrainer(
        tcfg, cfg, geom, M.shard_params(copy(gen), mesh),
        M.shard_params(copy(critic), mesh),
        M.shard_params(copy(teacher), mesh), mesh=mesh)
    bs = M.batch_sharding(mesh)
    m1 = tr1.train_step(jax.device_put(noise, bs), jax.device_put(pe_c, bs),
                        jax.device_put(pe_u, bs), jax.random.PRNGKey(23))

    np.testing.assert_allclose(m0["generator_loss"], m1["generator_loss"],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(m0["critic_loss"], m1["critic_loss"],
                               rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(tr0.state["gen_params"]),
                    jax.tree.leaves(tr1.state["gen_params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
    for a, b in zip(jax.tree.leaves(tr0.state["critic_params"]),
                    jax.tree.leaves(tr1.state["critic_params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_int8_rollout_cache_close_to_bf16(setup):
    """cache_int8 stores the rollout KV cache int8 (k AND v, per-token
    scales; training/rollout.py RolloutConfig.cache_int8).  The cache is
    stop-gradded context, so this must (a) produce latents within
    quantization tolerance of the f32-cache rollout, (b) actually store
    int8 buffers, and (c) keep gradients flowing and finite."""
    cfg, geom, gen, critic, teacher, tables, sched, cross_c, cross_u = setup
    cache_cfg = CacheConfig(1, 4, geom.frame_seq_length)
    noise = jax.random.normal(jax.random.PRNGKey(16),
                              (1, 4, geom.channels, geom.height, geom.width))

    def run(cache_int8, two_segment):
        rcfg = ro.RolloutConfig(
            denoise_timesteps=(1000.0, 750.0, 500.0), frame_block=2,
            attn_impl="xla", remat=False, remat_layers=False,
            two_segment=two_segment, cache_int8=cache_int8)
        lat, cache, _ = ro.rollout_trajectory(
            gen, cfg, cache_cfg, tables, sched, rcfg, noise, cross_c,
            jax.random.PRNGKey(17), exit_idx=2, start_gradient_frame=0)
        return lat, cache

    lat_ref, cache_ref = run(False, True)
    for two_segment in (True, False):  # commit-quantize and per-layer-write
        lat_q, cache_q = run(True, two_segment)
        assert cache_q.k.dtype == jnp.int8 and cache_q.v.dtype == jnp.int8
        assert cache_q.k_scale is not None and cache_q.v_scale is not None
        rel = float(jnp.max(jnp.abs(lat_q - lat_ref))
                    / (jnp.max(jnp.abs(lat_ref)) + 1e-9))
        assert np.isfinite(np.asarray(lat_q)).all()
        # int8 context K/V perturbs later blocks only mildly
        assert rel < 0.15, (two_segment, rel)
        # committed int8 contents must dequantize back to the f32 cache
        deq_k = (cache_q.k.astype(jnp.float32)
                 * cache_q.k_scale[..., None])
        err_k = float(jnp.max(jnp.abs(deq_k - cache_ref.k.astype(jnp.float32))))
        assert err_k < 0.15 * float(jnp.max(jnp.abs(cache_ref.k))), (
            two_segment, err_k)

    rcfg = ro.RolloutConfig(
        denoise_timesteps=(1000.0, 750.0, 500.0), frame_block=2,
        attn_impl="xla", remat=False, remat_layers=False, cache_int8=True)

    def loss(p):
        lat, _, _ = ro.rollout_trajectory(
            p, cfg, cache_cfg, tables, sched, rcfg, noise, cross_c,
            jax.random.PRNGKey(17), exit_idx=1, start_gradient_frame=0)
        return jnp.sum(lat ** 2)

    g = jax.grad(loss)(gen)
    n = float(jax.tree.reduce(lambda a, x: a + jnp.sum(jnp.abs(x)), g, 0.0))
    assert np.isfinite(n) and n > 0.0


@pytest.mark.slow
def test_dmd_with_larger_teacher_cfg(setup):
    """DMD with a teacher of DIFFERENT geometry than the generator (the
    reference's real_name=14B configuration, longlive_train_init.yaml:5-7 —
    14B shares head_dim 128 so rope tables are shared): loss + gradient
    must be finite through the mixed-config score computation."""
    import dataclasses

    cfg, geom, gen, critic, _, tables, sched, cross_c, cross_u = setup
    teacher_cfg = dataclasses.replace(
        tiny_dit_config(), dim=2 * tiny_dit_config().dim,
        num_heads=2 * tiny_dit_config().num_heads,
        ffn_dim=2 * tiny_dit_config().ffn_dim)
    assert teacher_cfg.head_dim == cfg.head_dim  # shared rope tables
    teacher_big = D.init_dit_params(jax.random.PRNGKey(9), teacher_cfg,
                                    jnp.float32, zero_head=False)
    dcfg = dmd_mod.DMDConfig(timestep_shift=5.0, real_guidance_scale=3.0)
    pe = jax.random.normal(jax.random.PRNGKey(10), (1, cfg.text_len, cfg.text_dim))
    lat = jax.random.normal(
        jax.random.PRNGKey(11),
        (1, 2, geom.channels, geom.height, geom.width))

    def loss_fn(x):
        loss, aux = dmd_mod.distribution_matching_loss(
            x, critic, teacher_big, cfg, tables, sched, dcfg, pe, pe * 0.1,
            jax.random.PRNGKey(12), attn_impl="xla", teacher_cfg=teacher_cfg)
        return loss

    val, g = jax.value_and_grad(loss_fn)(lat)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0.0


@pytest.mark.slow
def test_teacher_real_x0_paths(setup):
    """dmd.teacher_real_x0 (standalone CFG-batched teacher pass) must equal
    the in-loss teacher exactly: same loss and latent-grad when its output
    is passed back via real_x0=, both with the resident and the
    host-streamed (blocks_to_host) teacher."""
    from longlive_tpu.utils.memory import blocks_to_host

    cfg, geom, gen, critic, teacher, tables, sched, *_ = setup
    dcfg = dmd_mod.DMDConfig(timestep_shift=5.0, real_guidance_scale=3.0)
    lat = jax.random.normal(jax.random.PRNGKey(21),
                            (1, 3, geom.channels, geom.height, geom.width))
    pe_c = jax.random.normal(jax.random.PRNGKey(22),
                             (1, cfg.text_len, cfg.text_dim))
    pe_u = pe_c * 0.1
    rng = jax.random.PRNGKey(23)

    def loss_with(real_x0):
        def lf(l):
            loss, _ = dmd_mod.distribution_matching_loss(
                l, critic, None if real_x0 is not None else teacher, cfg,
                tables, sched, dcfg, pe_c, pe_u, rng, attn_impl="xla",
                real_x0=real_x0)
            return loss

        return jax.value_and_grad(lf)(lat)

    l_ref, g_ref = loss_with(None)

    real = dmd_mod.teacher_real_x0(teacher, cfg, tables, sched, dcfg, lat,
                                   pe_c, pe_u, rng, attn_impl="xla")
    l_pre, g_pre = loss_with(real)
    np.testing.assert_allclose(np.asarray(l_pre), np.asarray(l_ref),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pre), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)

    real_s = dmd_mod.teacher_real_x0(blocks_to_host(teacher), cfg, tables,
                                     sched, dcfg, lat, pe_c, pe_u, rng,
                                     attn_impl="xla", streamed=True)
    np.testing.assert_allclose(np.asarray(real_s), np.asarray(real),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_teacher_stream_trainer_matches_monolithic(setup):
    """staged_phases + teacher_stream (layer-streamed 14B-style teacher)
    reproduces the monolithic train step."""
    cfg, geom, gen, critic, teacher, tables, sched, *_ = setup
    kw = dict(num_frame_per_block=1, num_training_frames=3,
              slice_last_frames=3, attn_impl="xla", dfake_gen_update_ratio=1)
    copy = lambda t: jax.tree.map(jnp.copy, t)
    noise = jax.random.normal(jax.random.PRNGKey(11),
                              (1, 3, geom.channels, geom.height, geom.width))
    pe_c = jax.random.normal(jax.random.PRNGKey(31),
                             (1, cfg.text_len, cfg.text_dim))
    pe_u = pe_c * 0.1

    tr_a = ScoreDistillationTrainer(TrainerConfig(**kw), cfg, geom,
                                    copy(gen), copy(critic), copy(teacher))
    m_a = tr_a.train_step(noise, pe_c, pe_u, jax.random.PRNGKey(12))
    tr_b = ScoreDistillationTrainer(
        TrainerConfig(**kw, staged_phases=True, teacher_stream=True), cfg,
        geom, copy(gen), copy(critic), copy(teacher))
    m_b = tr_b.train_step(noise, pe_c, pe_u, jax.random.PRNGKey(12))

    np.testing.assert_allclose(m_b["generator_loss"], m_a["generator_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(m_b["critic_loss"], m_a["critic_loss"],
                               rtol=1e-5)
    for key in ("gen_params", "critic_params"):
        for a, b in zip(jax.tree.leaves(tr_a.state[key]),
                        jax.tree.leaves(tr_b.state[key])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-5)
