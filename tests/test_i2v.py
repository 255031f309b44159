"""Image-to-video path tests: golden parity of the i2v bidirectional DiT and
the CLIP vision tower against the ACTUAL reference modules (CPU oracles),
plus mask/conditioning builders and the end-to-end pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from longlive_tpu.config import DiTConfig, tiny_geometry
from longlive_tpu.models import clip as C
from longlive_tpu.models import dit as D
from longlive_tpu.models import vae as V
from longlive_tpu.models.dit_bidirectional import (bidirectional_forward,
                                                   prepare_img_cross_kv)
from longlive_tpu.ops.rope import make_rope_tables
from longlive_tpu.pipeline.image2video import (Image2VideoPipeline,
                                               build_i2v_mask,
                                               encode_first_frame_condition)
from longlive_tpu.utils.checkpoint import dit_params_from_torch

from ref_loader import load_clip, load_wan_model

CLIP_DIM = 1280  # hardcoded by the reference (model.py:616 MLPProj(1280, dim))


def _i2v_cfg():
    return DiTConfig(dim=96, ffn_dim=128, num_heads=4, num_layers=2,
                     in_dim=12, out_dim=4, text_dim=32, text_len=16,
                     freq_dim=32, local_attn_size=-1, sink_size=0,
                     num_frame_per_block=1, rope_max_pos=64,
                     model_type="i2v", clip_dim=CLIP_DIM)


def test_i2v_bidirectional_matches_reference():
    mm = load_wan_model()
    torch.manual_seed(0)
    cfg = _i2v_cfg()
    geom = tiny_geometry()
    ref = mm.WanModel(
        model_type="i2v", patch_size=(1, 2, 2), text_len=cfg.text_len,
        in_dim=cfg.in_dim, dim=cfg.dim, ffn_dim=cfg.ffn_dim,
        freq_dim=cfg.freq_dim, text_dim=cfg.text_dim, out_dim=cfg.out_dim,
        num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        qk_norm=True, cross_attn_norm=True, eps=1e-6).eval()
    with torch.no_grad():
        ref.head.head.weight.normal_(0, 0.02)

    B, F = 1, 3
    torch.manual_seed(1)
    x = torch.randn(B, 4, F, geom.height, geom.width)  # [B, C, F, H, W]
    y = torch.randn(B, 8, F, geom.height, geom.width)  # mask(4)+latents(4)
    prompt = torch.randn(B, cfg.text_len, cfg.text_dim)
    clip_fea = torch.randn(B, 257, CLIP_DIM)
    t = torch.full((B,), 500.0)
    seq_len = F * geom.frame_seq_length

    with torch.no_grad():
        want = ref([u for u in x], t=t, context=[p for p in prompt],
                   seq_len=seq_len, clip_fea=clip_fea, y=[u for u in y])
    want = torch.stack(list(want)).permute(0, 2, 1, 3, 4).numpy()  # [B,F,C,H,W]

    params = dit_params_from_torch(ref.state_dict(), cfg, jnp.float32)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    cross = D.prepare_cross_kv(params, cfg, jnp.asarray(prompt.numpy()),
                               jnp.float32)
    img_kv = prepare_img_cross_kv(params, cfg, jnp.asarray(clip_fea.numpy()))
    xin = jnp.concatenate([jnp.asarray(x.numpy()), jnp.asarray(y.numpy())],
                          axis=1).transpose(0, 2, 1, 3, 4)  # [B,F,12,H,W]
    got = bidirectional_forward(params, cfg, tables, xin,
                                jnp.asarray(t.numpy()), cross,
                                attn_impl="xla", cross_kv_img=img_kv)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-4)


def test_clip_vision_matches_reference():
    cm = load_clip()
    torch.manual_seed(2)
    cfg = C.tiny_clip_vision_config()
    ref = cm.VisionTransformer(
        image_size=cfg.image_size, patch_size=cfg.patch_size, dim=cfg.dim,
        mlp_ratio=cfg.mlp_ratio, out_dim=cfg.out_dim, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, pool_type="token", pre_norm=True,
        post_norm=False, activation="gelu", norm_eps=cfg.eps).eval()
    sd = {f"visual.{k}": v for k, v in ref.state_dict().items()}
    params = C.clip_vision_params_from_torch(sd, cfg, jnp.float32)

    x = torch.randn(2, 3, cfg.image_size, cfg.image_size)
    with torch.no_grad():
        want = ref(x, use_31_block=True).numpy()  # first L-1 blocks, no norm
    got = C.clip_vision_forward(params, cfg, jnp.asarray(x.numpy()),
                                use_31_block=True)
    assert got.shape == want.shape == (2, cfg.num_patches + 1, cfg.dim)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_i2v_mask_semantics():
    """Transcribes the reference mask construction (image2video.py:207-214)
    and compares."""
    F_pix, lh, lw = 9, 4, 6
    msk = torch.ones(1, F_pix, lh, lw)
    msk[:, 1:] = 0
    msk = torch.concat(
        [torch.repeat_interleave(msk[:, 0:1], repeats=4, dim=1), msk[:, 1:]],
        dim=1)
    msk = msk.view(1, msk.shape[1] // 4, 4, lh, lw)
    want = msk.transpose(1, 2)[0].numpy()  # [4, F_lat, h, w]
    got = np.asarray(build_i2v_mask(F_pix, lh, lw, 4))
    np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def tiny_i2v_pipe():
    geom = tiny_geometry()
    vcfg = V.tiny_vae_config()
    stride_t = 2 ** sum(vcfg.temperal_downsample)  # 2
    cfg = DiTConfig(dim=96, ffn_dim=128, num_heads=4, num_layers=2,
                    in_dim=4 + stride_t + vcfg.z_dim, out_dim=4, text_dim=32,
                    text_len=16, freq_dim=32, local_attn_size=-1, sink_size=0,
                    num_frame_per_block=1, rope_max_pos=64,
                    model_type="i2v", clip_dim=CLIP_DIM)
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32,
                               zero_head=False)
    vae_params = V.init_vae_params(jax.random.PRNGKey(1), vcfg)
    return cfg, geom, vcfg, params, vae_params, stride_t


@pytest.mark.slow
def test_i2v_pipeline_end_to_end(tiny_i2v_pipe):
    cfg, geom, vcfg, params, vae_params, stride_t = tiny_i2v_pipe
    pipe = Image2VideoPipeline(params, cfg, attn_impl="xla")
    f_lat = 3
    spatial = 2 ** (len(vcfg.dim_mult) - 1)  # tiny VAE: 2
    img = jax.random.uniform(jax.random.PRNGKey(2),
                             (1, 3, geom.height * spatial, geom.width * spatial),
                             minval=-1.0, maxval=1.0)
    num_pixel_frames = 1 + stride_t * (f_lat - 1)
    y = encode_first_frame_condition(vae_params, vcfg, img, num_pixel_frames)
    assert y.shape == (1, stride_t + vcfg.z_dim, f_lat, geom.height, geom.width)
    # mask channels: 1 for latent frame 0, 0 after
    np.testing.assert_array_equal(np.asarray(y[0, 0, 0]), 1.0)
    np.testing.assert_array_equal(np.asarray(y[0, :stride_t, 1:]), 0.0)

    cond = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.text_len, cfg.text_dim))
    clip_fea = jax.random.normal(jax.random.PRNGKey(4), (1, 257, CLIP_DIM))
    out = pipe.generate_latents(
        cond, cond * 0.1, clip_fea, y, rng=jax.random.PRNGKey(5),
        latent_shape=(1, f_lat, 4, geom.height, geom.width),
        sampling_steps=3, guide_scale=5.0, dtype=jnp.float32)
    assert out.shape == (1, f_lat, 4, geom.height, geom.width)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_encode_image_shapes():
    cfg = C.tiny_clip_vision_config()
    params = C.init_clip_vision_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 50, 70),
                             minval=-1.0, maxval=1.0)
    fea = C.encode_image(params, cfg, img)  # resizes to 28x28
    assert fea.shape == (1, cfg.num_patches + 1, cfg.dim)
    assert np.isfinite(np.asarray(fea)).all()


def test_clip_text_branch_matches_reference():
    """XLM-Roberta text branch + head vs the actual reference modules
    (xlm_roberta.py:76-143, clip.py:303-325)."""
    cm = load_clip()
    torch.manual_seed(5)
    cfg = C.tiny_clip_text_config()
    ref = cm.XLMRobertaWithHead(
        vocab_size=cfg.vocab_size, max_seq_len=cfg.max_seq_len,
        type_size=cfg.type_size, pad_id=cfg.pad_id, dim=cfg.dim,
        out_dim=cfg.out_dim, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, post_norm=cfg.post_norm,
        dropout=0.0).eval()
    sd = {f"textual.{k}": v for k, v in ref.state_dict().items()}
    params = C.clip_text_params_from_torch(sd, cfg, jnp.float32)

    ids = torch.randint(2, cfg.vocab_size, (2, 12))
    ids[0, 8:] = cfg.pad_id  # ragged padding
    ids[1, 5:] = cfg.pad_id
    with torch.no_grad():
        want_feats = cm.XLMRoberta.forward(ref, ids).numpy()
        want = ref(ids).numpy()
    got_feats = C.xlm_roberta_forward(params, cfg, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got_feats), want_feats,
                               rtol=2e-4, atol=2e-4)
    got = C.clip_text_forward(params, cfg, jnp.asarray(ids.numpy()))
    assert got.shape == (2, cfg.out_dim)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
