"""Golden tests: our functional causal VAE vs the reference torch WanVAE_
(imported read-only from /root/reference as a numeric oracle, random weights).
"""

import importlib.util

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from longlive_tpu.models import vae as V
from longlive_tpu.utils.checkpoint import vae_params_from_torch


def _load_ref_vae_module():
    # load the reference file directly (the wan package __init__ pulls in
    # unavailable deps); vae.py itself only needs torch + einops
    spec = importlib.util.spec_from_file_location(
        "ref_wan_vae", "/root/reference/wan/modules/vae.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_and_params():
    WanVAE_ = _load_ref_vae_module().WanVAE_

    torch.manual_seed(0)
    cfg = V.VAEConfig(dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                      temperal_downsample=(True,))
    ref = WanVAE_(
        dim=cfg.dim, z_dim=cfg.z_dim, dim_mult=list(cfg.dim_mult),
        num_res_blocks=cfg.num_res_blocks, attn_scales=[],
        temperal_downsample=list(cfg.temperal_downsample), dropout=0.0,
    ).eval()
    # non-trivial attention proj (reference zero-inits it, vae.py:238)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "proj" in name and p.ndim == 4:
                p.normal_(0, 0.2)
    params = vae_params_from_torch(ref.state_dict(), cfg, jnp.float32)
    return cfg, ref, params


def test_decode_matches_reference(ref_and_params):
    cfg, ref, params = ref_and_params
    torch.manual_seed(1)
    t_lat, h, w = 4, 6, 6
    z = torch.randn(1, cfg.z_dim, t_lat, h, w)
    mean = torch.zeros(cfg.z_dim)
    std = torch.ones(cfg.z_dim)
    with torch.no_grad():
        ref_out = ref.decode(z, [mean, 1.0 / std]).clamp(-1, 1).numpy()

    # our params carry wan mean/std; override to match the test scale
    params = dict(params)
    params["mean"] = jnp.zeros(cfg.z_dim)
    params["std"] = jnp.ones(cfg.z_dim)
    lat = jnp.asarray(z.numpy()).transpose(0, 2, 1, 3, 4)  # [B,T,z,h,w]
    out = V.vae_decode(params, cfg, lat, chunk=1)  # [B,T_out,3,H,W]
    out_t = np.asarray(out).transpose(0, 2, 1, 3, 4)
    assert out_t.shape == ref_out.shape
    np.testing.assert_allclose(out_t, ref_out, rtol=1e-3, atol=1e-4)


def test_decode_chunked_equals_framewise(ref_and_params):
    cfg, ref, params = ref_and_params
    params = dict(params)
    params["mean"] = jnp.zeros(cfg.z_dim)
    params["std"] = jnp.ones(cfg.z_dim)
    lat = jnp.asarray(np.random.RandomState(3).randn(1, 5, cfg.z_dim, 6, 6), jnp.float32)
    a = V.vae_decode(params, cfg, lat, chunk=1)
    b = V.vae_decode(params, cfg, lat, chunk=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_encode_matches_reference(ref_and_params):
    cfg, ref, params = ref_and_params
    torch.manual_seed(2)
    stride_t = 2 ** sum(cfg.temperal_downsample)
    t_pix = 1 + stride_t * 2
    x = torch.randn(1, 3, t_pix, 16, 16)
    mean = torch.zeros(cfg.z_dim)
    std = torch.ones(cfg.z_dim)
    with torch.no_grad():
        ref_mu = ref.encode(x, [mean, 1.0 / std]).numpy()

    params = dict(params)
    params["mean"] = jnp.zeros(cfg.z_dim)
    params["std"] = jnp.ones(cfg.z_dim)
    pix = jnp.asarray(x.numpy()).transpose(0, 2, 1, 3, 4)
    mu = V.vae_encode(params, cfg, pix)
    mu_t = np.asarray(mu).transpose(0, 2, 1, 3, 4)
    assert mu_t.shape == ref_mu.shape
    np.testing.assert_allclose(mu_t, ref_mu, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_roundtrip_shapes_full_geometry():
    """Wan geometry: 3 latent frames -> 9 pixel frames? No: 1+4*(T-1)."""
    cfg = V.VAEConfig(dim=8, z_dim=4)  # real dim_mult (1,2,4,4), 2 temporal ups
    import jax
    params = V.init_vae_params(jax.random.PRNGKey(0), cfg)
    lat = jnp.zeros((1, 3, 4, 8, 8))
    out = V.vae_decode(params, cfg, lat, chunk=1)
    assert out.shape == (1, 1 + 4 * 2, 3, 64, 64)
    pix = jnp.zeros((1, 9, 3, 64, 64))
    mu = V.vae_encode(params, cfg, pix)
    assert mu.shape == (1, 3, 4, 8, 8)


@pytest.mark.slow
def test_int8_quantized_decode_close_to_bf16():
    """quantize_vae_params + conv3d_int8: decode output stays close to the
    bf16 path (per-tensor activation x per-channel weight int8)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    vcfg = V.tiny_vae_config()
    params = V.init_vae_params(jax.random.PRNGKey(0), vcfg, jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 3, vcfg.z_dim, 8, 8))
    ref = np.asarray(V.vae_decode(params, vcfg, z), np.float32)
    qparams = V.quantize_vae_params(params, min_channels=1)
    # pointwise convs stay bf16 by design
    assert "w" in qparams["conv2"]
    # wide 3x3x3 convs are quantized
    leaves = jax.tree.leaves(jax.tree.map(lambda x: x, qparams))
    assert any(getattr(l, "dtype", None) == jnp.int8 for l in leaves)
    got = np.asarray(V.vae_decode(qparams, vcfg, z), np.float32)
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.06, rel
    # default gate (256) leaves the tiny config untouched
    same = V.quantize_vae_params(params)
    assert not any(getattr(l, "dtype", None) == jnp.int8
                   for l in jax.tree.leaves(same))


def test_upsample_conv_subpixel_exact():
    """upsample_conv2d_subpixel must be numerically identical (f32 rounding)
    to nearest-2x upsample -> 3x3 'same' conv for arbitrary shapes."""
    from longlive_tpu.models.vae import (conv2d, upsample2d_nearest,
                                         upsample_conv2d_subpixel)

    rng = np.random.RandomState(7)
    for (h, w_) in ((5, 8), (12, 7)):
        x = jnp.asarray(rng.randn(2, h, w_, 6).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 6, 3, 3).astype(np.float32))
        b = jnp.asarray(rng.randn(3).astype(np.float32))
        ref = conv2d(upsample2d_nearest(x), w, b)
        new = upsample_conv2d_subpixel(x, w, b)
        assert ref.shape == new.shape
        err = float(jnp.max(jnp.abs(ref - new)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert err < 1e-5, err
