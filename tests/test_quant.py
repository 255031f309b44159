"""Int8 quantized path: accuracy vs bf16 reference and end-to-end DiT run."""

import jax
import jax.numpy as jnp
import numpy as np

from longlive_tpu.config import CacheConfig, tiny_dit_config, tiny_geometry
from longlive_tpu.models import dit as D
from longlive_tpu.ops import kv_cache as kvc
from longlive_tpu.ops.quant import linear_int8, quantize_dit_params, quantize_weight
from longlive_tpu.ops.rope import make_rope_tables


def test_linear_int8_close_to_fp():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 96), jnp.float32)
    k = jnp.asarray(rng.randn(96, 128) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(128) * 0.01, jnp.float32)
    ref = x @ k + b
    p = quantize_weight(k)
    p["bias"] = b
    out = linear_int8(x, p)
    rel = np.abs(np.asarray(out - ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.03, rel


def test_quantized_dit_forward_close():
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32, zero_head=False)
    qparams = quantize_dit_params(params)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    prompt = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    cross = D.prepare_cross_kv(params, cfg, prompt, jnp.float32)
    cache_cfg = CacheConfig(1, 3, geom.frame_seq_length)
    cache = kvc.init_cache(cache_cfg, cfg.num_layers, 1, cfg.num_heads, cfg.head_dim,
                           jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, geom.channels, geom.height, geom.width))
    t = jnp.full((1, 1), 500.0)

    ref, _ = D.dit_forward_cached(params, cfg, cache_cfg, tables, x, t, cross,
                                  cache, jnp.asarray(0), attn_impl="xla")
    out, _ = D.dit_forward_cached(qparams, cfg, cache_cfg, tables, x, t, cross,
                                  cache, jnp.asarray(0), attn_impl="xla")
    denom = np.abs(np.asarray(ref)).max()
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / max(denom, 1e-6)
    assert rel < 0.15, rel  # int8 dynamic-quant error bound on random weights


def test_fuse_qkv_params_exact():
    """Fused qkv serving projection must be BIT-identical to separate q/k/v
    (column-concatenated matmul computes the same columns; int8 per-column
    scales are column-local) — bf16/f32 and int8, cached forward incl. the
    kv_only commit path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from longlive_tpu.config import CacheConfig, tiny_dit_config, tiny_geometry
    from longlive_tpu.models import dit as D
    from longlive_tpu.ops import kv_cache as kvc
    from longlive_tpu.ops.quant import fuse_qkv_params, quantize_dit_params
    from longlive_tpu.ops.rope import make_rope_tables

    cfg, geom = tiny_dit_config(), tiny_geometry()
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32,
                               zero_head=False)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    prompt = jax.random.normal(jax.random.PRNGKey(1),
                               (1, cfg.text_len, cfg.text_dim))
    cross = D.prepare_cross_kv(params, cfg, prompt, jnp.float32)
    cache_cfg = CacheConfig(sink_frames=1, ring_frames=2,
                            frame_seq=geom.frame_seq_length)
    x = jax.random.normal(
        jax.random.PRNGKey(2), (1, 1, geom.channels, geom.height, geom.width))
    t = jnp.full((1, 1), 250.0, jnp.float32)

    for quant in (False, True):
        p0 = quantize_dit_params(params) if quant else params
        p1 = fuse_qkv_params(p0)
        assert "qkv" in p1["blocks"]["self_attn"]

        def run(p):
            cache = kvc.init_cache(cache_cfg, cfg.num_layers, 1,
                                   cfg.num_heads, cfg.head_dim, jnp.float32)
            flow, cache = D.dit_forward_cached(
                p, cfg, cache_cfg, tables, x, t, cross, cache,
                jnp.asarray(0, jnp.int32), attn_impl="xla")
            _, cache2 = D.dit_forward_cached(
                p, cfg, cache_cfg, tables, x, t, cross, cache,
                jnp.asarray(1, jnp.int32), attn_impl="xla", kv_only=True)
            return flow, cache2

        f0, c0 = run(p0)
        f1, c1 = run(p1)
        np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
        np.testing.assert_array_equal(np.asarray(c0.k), np.asarray(c1.k))
        np.testing.assert_array_equal(np.asarray(c0.v), np.asarray(c1.v))


def test_linear_int8_fused_matches_xla_path(monkeypatch):
    """linear_int8_fused (in-kernel activation quantize) stays within
    1-LSB rounding of linear_int8 and falls back cleanly at unsupported
    shapes."""
    import numpy as np

    from longlive_tpu.ops import quant as Q

    monkeypatch.setenv("LONGLIVE_INT8_FUSED", "interpret")
    rng = np.random.RandomState(0)
    for (m, k, n, bias) in ((520, 1536, 512, True), (300, 256, 384, False)):
        x = jnp.asarray(rng.randn(2, m // 2, k), jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, n) * 0.05, jnp.float32)
        p = Q.quantize_weight(w)
        if bias:
            p["bias"] = jnp.asarray(rng.randn(n), jnp.float32)
        ref = np.asarray(Q.linear_int8(x, p), np.float32)
        got = np.asarray(Q.linear_int8_fused(x, p), np.float32)
        rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 2e-3, (m, k, n, rel)
    # K too large for one VMEM tile -> identical to the XLA path (fallback)
    x = jnp.asarray(rng.randn(1, 256, 8960), jnp.bfloat16)
    p = Q.quantize_weight(jnp.asarray(rng.randn(8960, 128) * 0.02))
    np.testing.assert_array_equal(
        np.asarray(Q.linear_int8_fused(x, p), np.float32),
        np.asarray(Q.linear_int8(x, p), np.float32))
