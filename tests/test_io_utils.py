"""Video IO + prompt extension interface + checkpoint loading."""

import jax
import jax.numpy as jnp
import numpy as np

from longlive_tpu.utils.prompt_extend import get_rewriter
from longlive_tpu.utils.video_io import to_video_array, write_video


def test_write_video_mp4(tmp_path):
    v = np.random.rand(4, 32, 48, 3).astype(np.float32)
    p = str(tmp_path / "out.mp4")
    write_video(p, v, fps=16)
    import os
    assert os.path.exists(p) and os.path.getsize(p) > 0


def test_to_video_array_range():
    pixels = np.stack([np.full((2, 3, 8, 8), -1.0), np.full((2, 3, 8, 8), 1.0)])
    v = to_video_array(pixels[:1])
    assert v.shape == (2, 8, 8, 3)
    assert v.min() >= 0.0 and v.max() <= 1.0


def test_identity_rewriter():
    rw = get_rewriter("identity")
    assert rw("a cat") == "a cat"


def test_load_base_dit_safetensors(tmp_path):
    """Round-trip: save a tiny DiT state_dict as sharded safetensors in the
    HF release layout, reload through load_base_dit."""
    import json

    import torch
    from safetensors.torch import save_file

    from longlive_tpu.config import tiny_dit_config
    from longlive_tpu.models import dit as D
    from longlive_tpu.utils.checkpoint import dit_params_from_torch
    from longlive_tpu.utils.loading import load_base_dit
    from ref_loader import load_wan_model

    mm = load_wan_model()
    torch.manual_seed(0)
    cfg = tiny_dit_config()
    ref = mm.WanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=cfg.text_len,
        in_dim=cfg.in_dim, dim=cfg.dim, ffn_dim=cfg.ffn_dim,
        freq_dim=cfg.freq_dim, text_dim=cfg.text_dim, out_dim=cfg.out_dim,
        num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        qk_norm=True, cross_attn_norm=True, eps=1e-6)
    sd = {k: v.contiguous() for k, v in ref.state_dict().items()}
    keys = sorted(sd)
    half = len(keys) // 2
    d = tmp_path / "model"
    d.mkdir()
    save_file({k: sd[k] for k in keys[:half]},
              str(d / "diffusion_pytorch_model-00001-of-00002.safetensors"))
    save_file({k: sd[k] for k in keys[half:]},
              str(d / "diffusion_pytorch_model-00002-of-00002.safetensors"))
    wmap = {k: ("diffusion_pytorch_model-00001-of-00002.safetensors" if i < half
                else "diffusion_pytorch_model-00002-of-00002.safetensors")
            for i, k in enumerate(keys)}
    (d / "diffusion_pytorch_model.safetensors.index.json").write_text(
        json.dumps({"weight_map": wmap}))

    got = load_base_dit(str(d), cfg, jnp.float32)
    want = dit_params_from_torch(sd, cfg, jnp.float32)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
