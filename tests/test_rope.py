"""RoPE golden tests vs the reference complex-multiply implementation
(wan/modules/model.py:29-67, causal_model.py:32-60), recomputed with torch
complex ops."""

import numpy as np
import torch
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
