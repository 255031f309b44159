"""Parity tests for the fused causal-conv Pallas kernel (ops/vae_conv.py)
against the XLA concat path — the kernel replaces the reference's
CausalConv3d concat + norm + conv shape (vae.py:17-36, 186-220) on the TPU
streaming decode path.  Run here in interpret mode on CPU."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longlive_tpu.models import nn as lnn
from longlive_tpu.models import vae as V
from longlive_tpu.ops.vae_conv import fused_causal_conv


@pytest.mark.parametrize(
    "t,h,w,c,o,norm,res,khw",
    [
        (1, 8, 16, 8, 8, False, False, 3),
        (2, 8, 16, 8, 12, True, False, 3),
        (4, 16, 16, 8, 8, True, True, 3),
        (4, 8, 24, 16, 8, False, False, 3),
        (1, 8, 16, 136, 8, True, False, 3),  # lane-padding path (C>128, %128!=0)
        (2, 8, 16, 8, 16, False, False, 1),  # (3,1,1) time-conv kernel
        (1, 8, 16, 8, 8, True, False, 1),
    ],
)
def test_kernel_matches_concat_conv(t, h, w, c, o, norm, res, khw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, h, w, c)), jnp.float32)
    cache = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((o, c, 3, khw, khw)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((o,)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((c,)), jnp.float32) if norm else None
    residual = (
        jnp.asarray(rng.standard_normal((t, h, w, o)), jnp.float32) if res else None
    )

    xin = x
    if norm:
        xin = lnn.silu(V.rms_norm_channel(x[None], gamma)[0])
    full = jnp.concatenate([cache, xin], axis=0)
    ref = V.conv3d(full[None], wt, b)[0]
    if res:
        ref = ref + residual
    ref_cache = full[-2:]

    out, nc = fused_causal_conv(x, cache, wt, b, gamma, residual, interpret=True)
    # out/new_cache keep the kernel's lane padding (zeros) when C/O >= 96
    np.testing.assert_allclose(np.asarray(out)[..., :o], np.asarray(ref), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(nc)[..., :c], np.asarray(ref_cache), atol=1e-5
    )


@pytest.mark.slow
def test_streaming_decode_parity_fused_vs_xla():
    """Two streaming chunks through the tiny decoder, fused vs legacy."""
    cfg = V.tiny_vae_config()
    params = V.init_vae_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, cfg.z_dim, 8, 8), jnp.float32)

    prev = os.environ.get("LONGLIVE_VAE_FUSED")
    try:
        os.environ["LONGLIVE_VAE_FUSED"] = "0"
        caches = V.init_decoder_caches(params, cfg, 1, 8, 8, jnp.float32)
        r0, cr = V.vae_decode_chunk(params, cfg, z[:, :1], caches, True)
        r1, cr = V.vae_decode_chunk(params, cfg, z[:, 1:2], cr, False)

        os.environ["LONGLIVE_VAE_FUSED"] = "interpret"
        caches = V.init_decoder_caches(params, cfg, 1, 8, 8, jnp.float32)
        f0, cf = V.vae_decode_chunk(params, cfg, z[:, :1], caches, True)
        f1, cf = V.vae_decode_chunk(params, cfg, z[:, 1:2], cf, False)
    finally:
        if prev is None:
            os.environ.pop("LONGLIVE_VAE_FUSED", None)
        else:
            os.environ["LONGLIVE_VAE_FUSED"] = prev

    np.testing.assert_allclose(np.asarray(f0), np.asarray(r0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(r1), atol=2e-4)
    for a, b_ in zip(cf, cr):
        c_true = b_.shape[-1]
        np.testing.assert_allclose(
            np.asarray(a)[..., :c_true], np.asarray(b_), atol=1e-5
        )


@pytest.mark.parametrize(
    "t,c,o,norm,res,khw",
    [
        (2, 96, 96, True, True, 3),    # the full-res decoder stage shape
        (1, 96, 192, True, False, 3),  # partial O tiles
        (2, 96, 192, False, False, 1), # (3,1,1) time conv
    ],
)
def test_kernel_int8_close_to_concat_conv(t, c, o, norm, res, khw):
    """LONGLIVE_VAE_INT8=1: int8 MXU GEMM (per-output-channel weight
    scales, one dynamic activation scale per row-tile x frame).
    Quantization-bounded closeness vs the exact XLA concat path."""
    rng = np.random.default_rng(7)
    h, w = 8, 16
    x = jnp.asarray(rng.standard_normal((t, h, w, c)), jnp.float32)
    cache = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((o, c, 3, khw, khw)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((o,)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((c,)), jnp.float32) if norm else None
    residual = (
        jnp.asarray(rng.standard_normal((t, h, w, o)), jnp.float32) if res else None
    )

    xin = x
    if norm:
        xin = lnn.silu(V.rms_norm_channel(x[None], gamma)[0])
        # norm-prologue convs receive caches holding the PREVIOUS frames'
        # normalized values (models/vae._fused_conv feeds new_cache back
        # verbatim) — they scale with gamma like the current frames, which
        # the int8 gamma-fold relies on.  Raw N(0,1) caches here would be
        # a state the streaming path never produces.
        cache = lnn.silu(V.rms_norm_channel(cache[None], gamma)[0])
    full = jnp.concatenate([cache, xin], axis=0)
    ref = V.conv3d(full[None], wt, b)[0]
    if res:
        ref = ref + residual
    ref_cache = full[-2:]

    prev = os.environ.get("LONGLIVE_VAE_INT8")
    try:
        os.environ["LONGLIVE_VAE_INT8"] = "1"
        out, nc = fused_causal_conv(x, cache, wt, b, gamma, residual,
                                    interpret=True)
    finally:
        if prev is None:
            os.environ.pop("LONGLIVE_VAE_INT8", None)
        else:
            os.environ["LONGLIVE_VAE_INT8"] = prev

    got = np.asarray(out)[..., :o]
    refn = np.asarray(ref)
    # int8 x int8 contraction: ~1-2% relative RMS on N(0,1) data
    rel = np.linalg.norm(got - refn) / max(np.linalg.norm(refn), 1e-9)
    assert rel < 0.025, rel
    # the cache side output is NOT quantized (it feeds the next call exactly)
    np.testing.assert_allclose(
        np.asarray(nc)[..., :c], np.asarray(ref_cache), atol=1e-5
    )


@pytest.mark.parametrize("t,h,w,c", [(1, 8, 16, 8), (2, 16, 16, 8),
                                     (4, 16, 24, 12), (2, 8, 16, 96)])
def test_pair_kernel_matches_two_call_chain(t, h, w, c):
    """fused_res_block == the two fused_causal_conv calls it replaces, over
    two streaming chunks (zero caches, then the returned caches)."""
    from longlive_tpu.ops.vae_conv import fused_res_block

    rng = np.random.default_rng(3)
    w1 = jnp.asarray(rng.standard_normal((c, c, 3, 3, 3)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c, c, 3, 3, 3)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    g1 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    g2 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

    cp = c if (c < 96 or c % 128 == 0) else -(-c // 128) * 128
    c1 = jnp.zeros((2, h, w, cp), jnp.float32)
    c2 = jnp.zeros((2, h, w, cp), jnp.float32)
    pc1, pc2 = c1, c2
    for chunk in range(2):
        x = jnp.asarray(rng.standard_normal((t, h, w, c)), jnp.float32)

        y1, rc1 = fused_causal_conv(x, c1, w1, b1, g1, None, interpret=True)
        ref, rc2 = fused_causal_conv(y1, c2, w2, b2, g2,
                                     residual=jnp.pad(
                                         x, [(0, 0)] * 3 + [(0, cp - c)]),
                                     interpret=True)

        pair = fused_res_block(x, pc1, pc2, w1, b1, g1, w2, b2, g2,
                               interpret=True)
        assert pair is not None
        out, nc1, nc2 = pair
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(nc1), np.asarray(rc1),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(nc2), np.asarray(rc2),
                                   atol=1e-6)
        c1, c2, pc1, pc2 = rc1, rc2, nc1, nc2


def test_pair_res_block_dispatch_matches_chain():
    """models/vae.res_block with LONGLIVE_VAE_PAIR=1 == the 2-call chain,
    including the threaded cache structure (two entries either way)."""
    c, h, w, t = 96, 8, 16, 2
    rng = np.random.default_rng(9)
    p = {
        "norm1": jnp.asarray(rng.standard_normal((c,)), jnp.float32),
        "norm2": jnp.asarray(rng.standard_normal((c,)), jnp.float32),
        "conv1": {"w": jnp.asarray(rng.standard_normal((c, c, 3, 3, 3)) * 0.1,
                                   jnp.float32),
                  "b": jnp.asarray(rng.standard_normal((c,)), jnp.float32)},
        "conv2": {"w": jnp.asarray(rng.standard_normal((c, c, 3, 3, 3)) * 0.1,
                                   jnp.float32),
                  "b": jnp.asarray(rng.standard_normal((c,)), jnp.float32)},
    }
    x = jnp.asarray(rng.standard_normal((1, t, h, w, c)), jnp.float32)
    caches = [jnp.zeros((1, 2, h, w, 128), jnp.float32) for _ in range(2)]

    prev = {k: os.environ.get(k)
            for k in ("LONGLIVE_VAE_FUSED", "LONGLIVE_VAE_PAIR")}
    try:
        os.environ["LONGLIVE_VAE_FUSED"] = "interpret"
        os.environ["LONGLIVE_VAE_PAIR"] = "0"
        th_ref = V._CacheThread(caches)
        ref = V.res_block(x, p, th_ref)

        os.environ["LONGLIVE_VAE_PAIR"] = "1"
        th_pair = V._CacheThread(caches)
        got = V.res_block(x, p, th_pair)
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    assert len(th_pair.out) == len(th_ref.out) == 2
    for a, b_ in zip(th_pair.out, th_ref.out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)


@pytest.mark.slow
def test_streaming_decode_int8_close_to_xla():
    """LONGLIVE_VAE_INT8 through the REAL decoder channel widths at tiny
    spatial dims: two streaming chunks, int8 fused interpret vs the XLA
    path — quantization-bounded closeness, finite everywhere."""
    cfg = V.VAEConfig()
    params = V.init_vae_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, cfg.z_dim, 4, 4),
                          jnp.float32)

    prev = {k: os.environ.get(k)
            for k in ("LONGLIVE_VAE_FUSED", "LONGLIVE_VAE_INT8")}
    try:
        os.environ["LONGLIVE_VAE_FUSED"] = "0"
        caches = V.init_decoder_caches(params, cfg, 1, 4, 4, jnp.float32)
        r0, cr = V.vae_decode_chunk(params, cfg, z[:, :1], caches, True)
        r1, cr = V.vae_decode_chunk(params, cfg, z[:, 1:2], cr, False)

        os.environ["LONGLIVE_VAE_FUSED"] = "interpret"
        os.environ["LONGLIVE_VAE_INT8"] = "1"
        caches = V.init_decoder_caches(params, cfg, 1, 4, 4, jnp.float32)
        f0, cf = V.vae_decode_chunk(params, cfg, z[:, :1], caches, True)
        f1, cf = V.vae_decode_chunk(params, cfg, z[:, 1:2], cf, False)
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    for got, ref in ((f0, r0), (f1, r1)):
        g, r = np.asarray(got), np.asarray(ref)
        assert np.isfinite(g).all()
        rel = np.linalg.norm(g - r) / max(np.linalg.norm(r), 1e-9)
        # ~1.5%/conv compounding over ~30 quantized convs at RANDOM
        # weights/gammas (the adversarial case for the single-K-scale
        # quantizer); the adoption gate is the pixel-PSNR row the chip
        # run of scripts/quality_delta.py produces on this mode
        assert rel < 0.08, rel
