"""RoPE golden tests vs the reference complex-multiply implementation
(wan/modules/model.py:29-67, causal_model.py:32-60), recomputed with torch
complex ops."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from longlive_tpu.ops import rope as R


def _torch_rope_params(max_seq_len, dim, theta=10000):
    freqs = torch.outer(
        torch.arange(max_seq_len),
        1.0 / torch.pow(theta, torch.arange(0, dim, 2).to(torch.float64).div(dim)),
    )
    return torch.polar(torch.ones_like(freqs), freqs)


def _torch_causal_rope_apply(x, f, h, w, freqs, start_frame=0):
    """Direct re-derivation of causal_rope_apply (causal_model.py:32-60)."""
    n, c = x.size(2), x.size(3) // 2
    freqs = freqs.split([c - 2 * (c // 3), c // 3, c // 3], dim=1)
    seq_len = f * h * w
    out = []
    for i in range(x.shape[0]):
        x_i = torch.view_as_complex(
            x[i, :seq_len].to(torch.float64).reshape(seq_len, n, -1, 2)
        )
        freqs_i = torch.cat(
            [
                freqs[0][start_frame : start_frame + f].view(f, 1, 1, -1).expand(f, h, w, -1),
                freqs[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
                freqs[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
            ],
            dim=-1,
        ).reshape(seq_len, 1, -1)
        x_i = torch.view_as_real(x_i * freqs_i).flatten(2)
        out.append(x_i)
    return torch.stack(out).to(x.dtype)


def _make_ref_freqs(d):
    return torch.cat(
        [
            _torch_rope_params(64, d - 4 * (d // 6)),
            _torch_rope_params(64, 2 * (d // 6)),
            _torch_rope_params(64, 2 * (d // 6)),
        ],
        dim=1,
    )


def test_causal_rope_matches_reference():
    d = 24  # c=12 -> splits (4, 4, 4)
    f, h, w, n, b = 3, 4, 5, 2, 2
    rng = np.random.RandomState(0)
    x = rng.randn(b, f * h * w, n, d).astype(np.float32)

    ref = _torch_causal_rope_apply(
        torch.from_numpy(x), f, h, w, _make_ref_freqs(d), start_frame=7
    ).numpy()

    tables = R.make_rope_tables(head_dim=d, max_pos=64)
    out = R.causal_rope_apply(jnp.asarray(x), tables, f, h, w, start_frame=7)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_rope_start_frame_offsets_compose():
    """Rotating at start_frame=s must equal table lookup at absolute pos."""
    d = 128
    f, h, w = 2, 3, 4
    tables = R.make_rope_tables(head_dim=d, max_pos=64)
    x = jnp.asarray(np.random.RandomState(1).randn(1, f * h * w, 2, d), jnp.float32)
    ref = _torch_causal_rope_apply(
        torch.from_numpy(np.asarray(x)), f, h, w, _make_ref_freqs(d), start_frame=31
    ).numpy()
    out = R.causal_rope_apply(x, tables, f, h, w, start_frame=31)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-5)


def test_head_dim_128_split_sizes():
    t = R.make_rope_tables(head_dim=128, max_pos=64)
    assert t.cos_f.shape == (64, 22)
    assert t.cos_h.shape == (64, 21)
    assert t.cos_w.shape == (64, 21)
    cos, sin = R.rope_multipliers(t, 3, 30, 52, start_frame=0)
    assert cos.shape == (3 * 30 * 52, 64)


def test_halfsplit_layout_forward_equivalence():
    """rope_layout='halfsplit' (q/k channel basis permuted at param-build
    time, rotation as 64-lane halves) must reproduce the interleaved
    forward exactly — attention is invariant to a consistent q/k channel
    permutation."""
    import dataclasses

    import numpy as np

    from longlive_tpu.config import CacheConfig, tiny_dit_config, tiny_geometry
    from longlive_tpu.models import dit as D
    from longlive_tpu.ops import kv_cache as kvc

    cfg_i = dataclasses.replace(tiny_dit_config(), rope_layout="interleaved")
    cfg_h = dataclasses.replace(cfg_i, rope_layout="halfsplit")
    geom = tiny_geometry()
    params_i = D.init_dit_params(jax.random.PRNGKey(0), cfg_i, jnp.float32,
                                 zero_head=False)
    params_h = D.canonicalize_rope_layout(params_i, cfg_h)
    # the permutation moved q/k features; everything else is shared
    assert not np.allclose(
        np.asarray(params_i["blocks"]["self_attn"]["q"]["kernel"]),
        np.asarray(params_h["blocks"]["self_attn"]["q"]["kernel"]))

    tables = R.make_rope_tables(cfg_i.head_dim, cfg_i.rope_max_pos)
    prompts = jax.random.normal(jax.random.PRNGKey(1),
                                (1, cfg_i.text_len, cfg_i.text_dim))
    cross = D.prepare_cross_kv(params_i, cfg_i, prompts, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (1, 2, geom.channels, geom.height, geom.width))
    t = jnp.full((1, 2), 500.0)
    cache_cfg = CacheConfig(1, 4, geom.frame_seq_length)

    def run(cfg, params):
        cache = kvc.init_cache(cache_cfg, cfg.num_layers, 1, cfg.num_heads,
                               cfg.head_dim, jnp.float32)
        flow, _ = D.dit_forward_cached(
            params, cfg, cache_cfg, tables, x, t, cross, cache,
            jnp.asarray(0, jnp.int32), attn_impl="xla")
        return np.asarray(flow)

    f_i, f_h = run(cfg_i, params_i), run(cfg_h, params_h)
    err = np.max(np.abs(f_i - f_h)) / (np.max(np.abs(f_i)) + 1e-9)
    assert err < 1e-5, err

    # full (masked prefill) forward too
    mask = jnp.tril(jnp.ones((2, 2), bool))
    fi = D.dit_forward_full(params_i, cfg_i, tables, x, t, cross, mask,
                            attn_impl="xla")
    fh = D.dit_forward_full(params_h, cfg_h, tables, x, t, cross, mask,
                            attn_impl="xla")
    err = np.max(np.abs(np.asarray(fi) - np.asarray(fh))) / (
        np.max(np.abs(np.asarray(fi))) + 1e-9)
    assert err < 1e-5, err
