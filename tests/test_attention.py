"""Flash-attention kernel vs dense reference; embedding goldens."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from longlive_tpu.ops import attention as A
from longlive_tpu.ops.embeddings import sinusoidal_embedding_1d


def test_dense_attention_matches_torch_sdpa():
    rng = np.random.RandomState(0)
    b, sq, skv, n, d = 2, 16, 24, 3, 32
    q = rng.randn(b, sq, n, d).astype(np.float32)
    k = rng.randn(b, skv, n, d).astype(np.float32)
    v = rng.randn(b, skv, n, d).astype(np.float32)
    ref = (
        torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q).transpose(1, 2),
            torch.from_numpy(k).transpose(1, 2),
            torch.from_numpy(v).transpose(1, 2),
        )
        .transpose(1, 2)
        .numpy()
    )
    out = A.dense_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("sq,skv", [(16, 32), (40, 72), (256, 1024)])
def test_flash_matches_dense(sq, skv):
    rng = np.random.RandomState(1)
    b, n, d = 1, 2, 128
    q = jnp.asarray(rng.randn(b, sq, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, skv, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, skv, n, d), jnp.float32)
    valid = jnp.asarray(rng.rand(b, skv) > 0.3)
    valid = valid.at[:, :4].set(True)  # never fully masked
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)

    ref = A.dense_attention(q, k, v, bias[:, None, None, :])
    out = A.flash_attention(q, k, v, bias, block_q=128, block_kv=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_qk_int8_close_to_dense():
    """int8-QK serving mode: per-tile Q/K quantization puts ~0.4% RMS noise
    on the logits; the attention output must stay within ~1% of exact
    (the round-1 int8-P variant was 4% off and was removed, PERF.md)."""
    rng = np.random.RandomState(3)
    b, sq, skv, n, d = 1, 64, 256, 2, 128
    q = jnp.asarray(rng.randn(b, sq, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, skv, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, skv, n, d), jnp.float32)
    valid = jnp.asarray(rng.rand(b, skv) > 0.3)
    valid = valid.at[:, :4].set(True)
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)

    ref = A.dense_attention(q, k, v, bias[:, None, None, :])
    out = A.flash_attention(q, k, v, bias, block_q=32, block_kv=64,
                            qk_int8=True, interpret=True)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = np.sqrt((err**2).mean()) / np.sqrt((np.asarray(ref)**2).mean())
    assert rel < 0.01, rel
    # and the exact (bf16) kernel stays exact
    exact = A.flash_attention(q, k, v, bias, block_q=32, block_kv=64,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_prequantized_k_scales_matches_dequant():
    """int8-KV-cache mode: k arrives PRE-quantized int8 with per-token
    scales (quantized once at cache-write time).  The kernel must match
    dense attention over the dequantized keys to q-quantization noise,
    and the dispatcher's xla fallback must dequantize identically."""
    rng = np.random.RandomState(7)
    b, sq, skv, n, d = 1, 64, 256, 2, 128
    q = jnp.asarray(rng.randn(b, sq, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, skv, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, skv, n, d), jnp.float32)
    valid = jnp.asarray(rng.rand(b, skv) > 0.3)
    valid = valid.at[:, :4].set(True)
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)

    ki, sc = A.quantize_k_tokens(k)
    assert ki.dtype == jnp.int8 and sc.shape == (b, skv, n)
    k_dq = A.dequantize_k(ki, sc, jnp.float32)
    # quantize-dequantize round trip is tight per token
    np.testing.assert_allclose(np.asarray(k_dq), np.asarray(k),
                               rtol=0.02, atol=0.02)

    ref = A.dense_attention(q, k_dq, v, bias[:, None, None, :])
    out = A.flash_attention(q, ki, v, bias, block_q=32, block_kv=64,
                            qk_int8=True, k_scales=sc, interpret=True)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = np.sqrt((err**2).mean()) / np.sqrt((np.asarray(ref)**2).mean())
    assert rel < 0.01, rel

    # dispatcher fallback (CPU serving path): same dequant convention
    out_xla = A.attend(q, ki, v, valid, impl="xla", k_scales=sc)
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # pre-quantized first segment + bf16 fresh second segment (decode shape)
    k2 = jnp.asarray(rng.randn(b, 64, n, d), jnp.float32)
    v2 = jnp.asarray(rng.randn(b, 64, n, d), jnp.float32)
    ref2 = A.dense_attention(
        q, jnp.concatenate([k_dq, k2], 1), jnp.concatenate([v, v2], 1),
        jnp.concatenate([bias, jnp.zeros((b, 64), jnp.float32)], 1)[:, None, None, :])
    out2 = A.flash_attention(q, ki, v, bias, block_q=32, block_kv=64,
                             qk_int8=True, k_scales=sc, k2=k2, v2=v2,
                             interpret=True)
    err2 = np.abs(np.asarray(out2) - np.asarray(ref2))
    rel2 = np.sqrt((err2**2).mean()) / np.sqrt((np.asarray(ref2)**2).mean())
    assert rel2 < 0.01, rel2


@pytest.mark.parametrize("skv1,skv2,qk8", [(128, 64, False), (100, 48, False),
                                           (128, 64, True)])
def test_flash_two_segment_matches_concat(skv1, skv2, qk8):
    """Two-segment KV (cache ++ fresh block, no concatenated buffer) ==
    single-segment attention over the explicit concat."""
    rng = np.random.RandomState(5)
    b, sq, n, d = 1, 32, 2, 128
    q = jnp.asarray(rng.randn(b, sq, n, d), jnp.float32)
    k1 = jnp.asarray(rng.randn(b, skv1, n, d), jnp.float32)
    v1 = jnp.asarray(rng.randn(b, skv1, n, d), jnp.float32)
    k2 = jnp.asarray(rng.randn(b, skv2, n, d), jnp.float32)
    v2 = jnp.asarray(rng.randn(b, skv2, n, d), jnp.float32)
    valid = jnp.asarray(rng.rand(b, skv1) > 0.4)
    valid = valid.at[:, :2].set(True)
    bias1 = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)

    kc = jnp.concatenate([k1, k2], axis=1)
    vc = jnp.concatenate([v1, v2], axis=1)
    biasc = jnp.concatenate([bias1, jnp.zeros((b, skv2), jnp.float32)], axis=1)
    if qk8:
        ref = A.flash_attention(q, kc, vc, biasc, block_q=32, block_kv=64,
                                qk_int8=True, interpret=True)
        out = A.flash_attention(q, k1, v1, bias1, block_q=32, block_kv=64,
                                qk_int8=True, k2=k2, v2=v2, interpret=True)
        # independent per-token quantization -> small numeric drift
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)
    else:
        ref = A.dense_attention(q, kc, vc, biasc[:, None, None, :])
        out = A.flash_attention(q, k1, v1, bias1, block_q=32, block_kv=64,
                                k2=k2, v2=v2, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_flash_ragged_padding():
    # seq lengths not divisible by blocks exercise the pad/slice path
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 100, 1, 128), jnp.float32)
    k = jnp.asarray(rng.randn(1, 177, 1, 128), jnp.float32)
    v = jnp.asarray(rng.randn(1, 177, 1, 128), jnp.float32)
    ref = A.dense_attention(q, k, v)
    out = A.flash_attention(q, k, v, None, block_q=64, block_kv=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_sinusoidal_embedding_matches_reference():
    # reference wan/modules/model.py:15-25
    t = torch.tensor([0.0, 1.0, 250.0, 937.5], dtype=torch.float64)
    half = 128
    sinusoid = torch.outer(
        t, torch.pow(10000, -torch.arange(half).to(t).div(half))
    )
    ref = torch.cat([torch.cos(sinusoid), torch.sin(sinusoid)], dim=1).numpy()
    out = sinusoidal_embedding_1d(256, jnp.asarray([0.0, 1.0, 250.0, 937.5]))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kind,kw", [
    ("block_causal", dict(local=-1)),
    ("block_causal", dict(local=3)),
    ("sink_window", dict(local=4, sink=1)),
])
def test_masked_flash_matches_dense(kind, kw):
    from longlive_tpu.ops.attention import flash_attention_frame_masked
    from longlive_tpu.ops import masks as M

    rng = np.random.RandomState(0)
    fs, f, nfb, n, d = 16, 6, 2, 2, 128
    s = f * fs
    q = jnp.asarray(rng.randn(1, s, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(1, s, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(1, s, n, d), jnp.float32)

    if kind == "block_causal":
        fm = M.blockwise_causal_frame_mask(f, nfb, kw["local"])
    else:
        fm = M.sink_window_frame_mask(f, nfb, kw["sink"], kw["local"] - kw["sink"])
    tm = M.expand_frame_mask(fm, fs)
    bias = jnp.where(tm, 0.0, -1e30)[None, None]
    ref = A.dense_attention(q, k, v, bias)

    out = flash_attention_frame_masked(
        q, k, v, mask_kind=kind, frame_seq=fs, nfb=nfb,
        local=kw.get("local", -1), sink=kw.get("sink", 0),
        block_q=32, block_kv=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_masked_flash_teacher_forcing():
    from longlive_tpu.ops.attention import flash_attention_frame_masked
    from longlive_tpu.ops import masks as M

    rng = np.random.RandomState(1)
    fs, f, nfb, n, d = 8, 4, 2, 1, 128
    s = 2 * f * fs
    q = jnp.asarray(rng.randn(1, s, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(1, s, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(1, s, n, d), jnp.float32)
    tm = M.expand_frame_mask(M.teacher_forcing_frame_mask(f, nfb), fs)
    bias = jnp.where(tm, 0.0, -1e30)[None, None]
    ref = A.dense_attention(q, k, v, bias)
    out = flash_attention_frame_masked(
        q, k, v, mask_kind="teacher_forcing", frame_seq=fs, nfb=nfb,
        clean_frames=f, block_q=32, block_kv=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_env_knobs_rebind_in_process(monkeypatch):
    """LONGLIVE_BKV is resolved OUTSIDE the jit (regression: reading it
    inside the jitted body captured the first trace's value, so in-process
    A/B sweeps silently re-measured the first tiling)."""
    import longlive_tpu.ops.attention as A

    captured = []
    real = A._flash_attention_jit

    def spy(q, k, v, bias, block_q, block_kv, *a, **kw):
        captured.append(block_kv)
        return real(q, k, v, bias, block_q, block_kv, *a, **kw)

    monkeypatch.setattr(A, "_flash_attention_jit", spy)
    q = jnp.zeros((1, 8, 1, 128), jnp.float32)
    k = jnp.zeros((1, 128, 1, 128), jnp.float32)
    v = jnp.zeros((1, 128, 1, 128), jnp.float32)
    monkeypatch.setenv("LONGLIVE_BKV", "1024")
    A.flash_attention(q, k, v, interpret=True)
    monkeypatch.setenv("LONGLIVE_BKV", "256")
    A.flash_attention(q, k, v, interpret=True)
    assert captured == [1024, 256], captured


def test_kv_layer_kernel_layout_parity():
    """kv_layer mode: the kernel reads layer rows of a stacked
    [L*B*N, S_pad, D] kernel-layout cache via a scalar-prefetch offset.
    Must match dense attention on the same layer's K/V for every layer,
    including pad-token masking."""
    import longlive_tpu.ops.attention as A

    rng = np.random.RandomState(7)
    L, b, n, d = 3, 1, 2, 128
    s, s_pad, sq = 96, 128, 32
    kl_k = jnp.asarray(rng.randn(L * b * n, s_pad, d), jnp.float32)
    kl_v = jnp.asarray(rng.randn(L * b * n, s_pad, d), jnp.float32)
    q = jnp.asarray(rng.randn(b, sq, n, d), jnp.float32)
    valid = jnp.arange(s_pad) < s  # pad tokens masked
    bias = jnp.where(valid, 0.0, -1e30)[None].astype(jnp.float32)

    for layer in range(L):
        rows = kl_k[layer * b * n : (layer + 1) * b * n]
        k_std = rows.reshape(b, n, s_pad, d).transpose(0, 2, 1, 3)
        rows = kl_v[layer * b * n : (layer + 1) * b * n]
        v_std = rows.reshape(b, n, s_pad, d).transpose(0, 2, 1, 3)
        ref = A.dense_attention(q, k_std, v_std, bias[:, None, None, :])
        out = A.flash_attention(
            q, kl_k, kl_v, bias, block_q=32, block_kv=32,
            kv_layer=jnp.asarray(layer, jnp.int32), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        # the attend() xla fallback route
        out2 = A.attend(q, kl_k, kl_v, valid, impl="xla",
                        kv_layer=jnp.asarray(layer, jnp.int32))
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_q_rope_kernel_prologue_parity():
    """q_rope mode: the kernel rotates the raw (pre-normed, un-scaled) q
    tile in its prologue (halfsplit layout, softmax scale folded into the
    cs/sn multipliers).  Must match dense attention on the externally
    roped q — plain mode AND kv_layer (kernel-layout cache) mode."""
    import longlive_tpu.ops.attention as A
    from longlive_tpu.ops.rope import apply_rotary

    rng = np.random.RandomState(3)
    b, n, d, sq, s = 1, 2, 128, 64, 96
    q = jnp.asarray(rng.randn(b, sq, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, n, d), jnp.float32)
    cos = jnp.asarray(rng.rand(sq, d // 2) * 2 - 1, jnp.float32)
    sin = jnp.asarray(rng.rand(sq, d // 2) * 2 - 1, jnp.float32)
    valid = jnp.arange(s) < 80
    bias = jnp.where(valid, 0.0, -1e30)[None].astype(jnp.float32)

    q_roped = apply_rotary(q, cos, sin, layout="halfsplit")
    ref = A.dense_attention(q_roped, k, v, bias[:, None, None, :])
    out = A.flash_attention(q, k, v, bias, block_q=32, block_kv=32,
                            q_rope=(cos, sin), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # combined with the kernel-layout cache (the serving target combo)
    L, s_pad = 2, 128
    kl_k = jnp.asarray(rng.randn(L * b * n, s_pad, d), jnp.float32)
    kl_v = jnp.asarray(rng.randn(L * b * n, s_pad, d), jnp.float32)
    validp = jnp.arange(s_pad) < 96
    for layer in range(L):
        rows = kl_k[layer * b * n:(layer + 1) * b * n]
        k_std = rows.reshape(b, n, s_pad, d).transpose(0, 2, 1, 3)
        rows = kl_v[layer * b * n:(layer + 1) * b * n]
        v_std = rows.reshape(b, n, s_pad, d).transpose(0, 2, 1, 3)
        biasp = jnp.where(validp, 0.0, -1e30)[None].astype(jnp.float32)
        ref2 = A.dense_attention(q_roped, k_std, v_std,
                                 biasp[:, None, None, :])
        out2 = A.flash_attention(q, kl_k, kl_v, biasp, block_q=32,
                                 block_kv=32, q_rope=(cos, sin),
                                 kv_layer=jnp.asarray(layer, jnp.int32),
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                                   rtol=2e-4, atol=2e-4)
        out3 = A.attend(q, kl_k, kl_v, validp, impl="xla",
                        kv_layer=jnp.asarray(layer, jnp.int32),
                        q_rope=(cos, sin))
        np.testing.assert_allclose(np.asarray(out3), np.asarray(ref2),
                                   rtol=2e-4, atol=2e-4)


def test_flash_exp2_and_mxu_lsum_variants_match():
    """LONGLIVE_EXP2 (exp->exp2 with folded log2 e) and LONGLIVE_MXU_LSUM
    (row-sum l on the MXU) are numerics-preserving kernel variants."""
    rng = np.random.RandomState(3)
    b, sq, skv, n, d = 1, 64, 160, 2, 128
    q = jnp.asarray(rng.randn(b, sq, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, skv, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, skv, n, d), jnp.float32)
    bias = jnp.where(jnp.arange(skv) < 150, 0.0,
                     -1e30)[None, :].astype(jnp.float32)
    ref = A.dense_attention(q, k, v, bias[:, None, None, :])
    for exp2 in (False, True):
        for lsum in (False, True):
            out = A._flash_attention_jit(
                q, k, v, bias, 32, 64, None, False, None, None, None, None,
                None, None, True, exp2=exp2, mxu_lsum=lsum)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)


def test_masked_flash_teacher_forcing_nonmultiple_frames():
    """Regression (r4 review): padded kv tokens beyond 2*S must stay
    masked when clean_frames % nfb != 0 — they used to share the last
    noisy block's id and deflate its softmax denominator."""
    from longlive_tpu.ops.attention import flash_attention_frame_masked
    from longlive_tpu.ops import masks as M

    rng = np.random.RandomState(2)
    fs, f, nfb, n, d = 8, 4, 3, 1, 128  # f % nfb != 0
    s = 2 * f * fs  # 64; block_kv=48 pads to 96 -> 32 padded kv tokens
    q = jnp.asarray(rng.randn(1, s, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(1, s, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(1, s, n, d), jnp.float32)
    tm = M.expand_frame_mask(M.teacher_forcing_frame_mask(f, nfb), fs)
    bias = jnp.where(tm, 0.0, -1e30)[None, None]
    ref = A.dense_attention(q, k, v, bias)
    out = flash_attention_frame_masked(
        q, k, v, mask_kind="teacher_forcing", frame_seq=fs, nfb=nfb,
        clean_frames=f, block_q=32, block_kv=48, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_masked_flash_dead_tile_elision_exact():
    """VERDICT r4 item 5: statically dead (q, kv) tiles are elided (DMA
    redirected + body gated) in flash_attention_frame_masked.  Elision must
    be EXACT vs the plain grid: the skipped tiles contribute nothing to the
    online softmax by construction."""
    from longlive_tpu.ops.attention import (_frame_mask_tile_arrays,
                                            flash_attention_frame_masked)

    rng = np.random.RandomState(3)
    fs = 40
    for kind, f, nfb, local, sink, cf in [
        ("teacher_forcing", 6, 3, -1, 0, 6),
        ("block_causal", 9, 3, -1, 0, 0),
        ("sink_window", 9, 3, 4, 1, 0),
    ]:
        s = (2 * f * fs) if kind == "teacher_forcing" else f * fs
        q = jnp.asarray(rng.randn(1, s, 1, 128), jnp.float32) * 0.5
        k = jnp.asarray(rng.randn(1, s, 1, 128), jnp.float32) * 0.5
        v = jnp.asarray(rng.randn(1, s, 1, 128), jnp.float32)
        kw = dict(mask_kind=kind, frame_seq=fs, nfb=nfb, local=local,
                  sink=sink, clean_frames=cf, block_q=128, block_kv=128,
                  interpret=True)
        a = flash_attention_frame_masked(q, k, v, elide_dead_tiles=True, **kw)
        b = flash_attention_frame_masked(q, k, v, elide_dead_tiles=False, **kw)
        assert float(jnp.abs(a - b).max()) == 0.0, kind
    # the real 21-frame TF geometry elides ~70% of the tiles
    _, _, n_live, n_total = _frame_mask_tile_arrays(
        "teacher_forcing", 65536, 65536, 512, 512, 1560, 3, -1, 0, 21)
    assert n_live / n_total < 0.35


def test_masked_flash_tile_liveness_is_exact():
    """Tile liveness must match a brute-force evaluation of the in-kernel
    mask over every REAL q row (padded q rows are sliced off; a tile kept
    alive only by them may be either) — an under-approximation would drop
    real attention edges silently."""
    from longlive_tpu.ops.attention import _frame_mask_tile_arrays

    def brute(kind, sp_q, sp_k, fs, nfb, local, sink, cf, s_real):
        qi = np.arange(max(sp_q, sp_k))[:, None]
        ki = np.arange(max(sp_q, sp_k))[None, :]
        if kind == "teacher_forcing":
            cl = cf * fs
            qn, kn = qi >= cl, ki >= cl
            qf = np.where(qn, (qi - cl) // fs, qi // fs)
            kf = np.where(kn, (ki - cl) // fs, ki // fs)
            qb, kb = qf // nfb, kf // nfb
            m = ((((~qn) & (~kn) & (kb <= qb)) | (qn & kn & (kb == qb))
                  | (qn & (~kn) & (kb < qb))) & (kf < cf)) | (qi == ki)
        else:
            qf, kf = qi // fs, ki // fs
            ends = (qf // nfb + 1) * nfb
            m = kf < ends
            if kind == "block_causal" and local != -1:
                m = m & (kf >= ends - local)
            elif kind == "sink_window":
                m = m & ((kf < sink) | (kf >= ends - (local - sink)))
            m = m | (qi == ki)
        m = m[:sp_q, :sp_k].copy()
        m[s_real:, :] = False
        return m

    for kind, f, nfb, local, sink, cf, bq, bkv in [
        ("teacher_forcing", 7, 3, -1, 0, 7, 128, 64),
        ("teacher_forcing", 4, 2, -1, 0, 4, 64, 128),
        ("block_causal", 9, 3, 4, 0, 0, 128, 128),
        ("sink_window", 12, 3, 9, 3, 0, 256, 128),
    ]:
        for fs in (16, 24, 40):
            s = (2 * f * fs) if kind == "teacher_forcing" else f * fs
            sp_q, sp_k = -(-s // bq) * bq, -(-s // bkv) * bkv
            _, lv, _, _ = _frame_mask_tile_arrays(
                kind, sp_q, sp_k, bq, bkv, fs, nfb, local, sink, cf)
            lv = np.asarray(lv).reshape(sp_q // bq, sp_k // bkv)
            m = brute(kind, sp_q, sp_k, fs, nfb, local, sink, cf, s)
            for iq in range(lv.shape[0]):
                for ik in range(lv.shape[1]):
                    truth = m[iq * bq:(iq + 1) * bq,
                              ik * bkv:(ik + 1) * bkv].any()
                    # exact for real-row tiles; pads may only be
                    # over-approximated (extra live tile = wasted compute,
                    # never wrongness)
                    if truth:
                        assert lv[iq, ik] == 1, (kind, f, fs, iq, ik)
