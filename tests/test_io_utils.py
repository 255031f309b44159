"""Video IO + prompt extension interface + checkpoint loading."""

import os

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


def test_prompt_expander_system_prompts_and_dispatch():
    """Reference PromptExpander surface (wan/utils/prompt_extend.py:101-155):
    language/modality system-prompt selection + __call__ dispatch."""
    from longlive_tpu.utils import prompt_extend as pe

    lm = pe.PromptExpander("m", is_vl=False)
    vl = pe.PromptExpander("m", is_vl=True)
    assert lm.decide_system_prompt("en") == pe.LM_EN_SYS_PROMPT
    assert lm.decide_system_prompt("ch") == pe.LM_ZH_SYS_PROMPT
    assert vl.decide_system_prompt("en") == pe.VL_EN_SYS_PROMPT
    assert vl.decide_system_prompt("ch") == pe.VL_ZH_SYS_PROMPT

    calls = []

    class Fake(pe.PromptExpander):
        def extend(self, prompt, system_prompt, seed=-1, *a, **k):
            calls.append(("lm", prompt, seed))
            return pe.PromptOutput(True, prompt + "!", seed, system_prompt, "")

        def extend_with_img(self, prompt, system_prompt, image=None, seed=-1,
                            *a, **k):
            calls.append(("vl", prompt, image))
            return pe.PromptOutput(True, prompt + "?", seed, system_prompt, "")

    out = Fake("m")("a dog", tar_lang="en", seed=7)
    assert out.status and out.prompt == "a dog!" and out.seed == 7
    out = Fake("m", is_vl=True)("a dog", image="img.png", seed=1)
    assert out.prompt == "a dog?" and calls[-1] == ("vl", "a dog", "img.png")
    out.add_custom_field("extra", 3)
    assert out.extra == 3
    # seed < 0 is replaced with a random non-negative one
    assert Fake("m")("x").seed >= 0


def test_qwen_expander_name_map_and_lazy():
    """QwenPromptExpander resolves predefined names and defers model
    loading to first use (construction is free offline)."""
    from longlive_tpu.utils.prompt_extend import QwenPromptExpander

    q = QwenPromptExpander("Qwen2.5_7B")
    assert q.model_name == "Qwen/Qwen2.5-7B-Instruct"
    assert q._model is None  # nothing loaded yet
    q2 = QwenPromptExpander(is_vl=True)
    assert q2.model_name == "Qwen/Qwen2.5-VL-7B-Instruct"


def test_dashscope_expander_offline_raises():
    import pytest

    from longlive_tpu.utils.prompt_extend import DashScopePromptExpander

    with pytest.raises(ImportError, match="dashscope"):
        DashScopePromptExpander()


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


def test_converted_checkpoint_cache(tmp_path):
    """``ckpt_cache: true``: the torch->JAX conversion result is saved as an
    orbax pytree next to the source and restored on later loads; the cache
    invalidates when the source file changes (mtime marker)."""
    import dataclasses
    import time as _time

    import torch

    from longlive_tpu.config import PipelineConfig, tiny_dit_config
    from longlive_tpu.utils import loading
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
    path = str(tmp_path / "gen.pt")
    torch.save({"generator": ref.state_dict()}, path)
    pc = PipelineConfig(generator_ckpt=path, extras={"ckpt_cache": True})

    first = loading.load_dit_params(pc, cfg, jnp.float32)
    cache_dir = path + ".jaxcache-gen-float32"
    assert (tmp_path / "gen.pt.jaxcache-gen-float32" / "SOURCES.json").exists()
    second = loading.load_dit_params(pc, cfg, jnp.float32)  # cache hit
    for a, b in zip(jax.tree.leaves(first), jax.tree.leaves(second)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # cache is a real orbax tree (loadable directly), and hits skip torch
    from longlive_tpu.utils import orbax_io

    host = orbax_io.load_params(cache_dir + "/params")
    assert len(jax.tree.leaves(host)) == len(jax.tree.leaves(first))

    # staleness: rewriting the source with different weights must bypass
    # the old cache (mtime mismatch) and reconvert
    _time.sleep(0.01)
    torch.manual_seed(1)
    ref2 = mm.WanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=cfg.text_len,
        in_dim=cfg.in_dim, dim=cfg.dim, ffn_dim=cfg.ffn_dim,
        freq_dim=cfg.freq_dim, text_dim=cfg.text_dim, out_dim=cfg.out_dim,
        num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        qk_norm=True, cross_attn_norm=True, eps=1e-6)
    torch.save({"generator": ref2.state_dict()}, path)
    os.utime(path, (os.path.getmtime(path) + 5, os.path.getmtime(path) + 5))
    third = loading.load_dit_params(pc, cfg, jnp.float32)
    diffs = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
        for a, b in zip(jax.tree.leaves(first), jax.tree.leaves(third)))
    assert diffs > 0  # new weights actually loaded, not the stale cache


def test_epoch_shard_and_prefetch(tmp_path):
    """epoch_shard: deterministic per-(seed, epoch) shuffle, disjoint+complete
    across hosts (DistributedSampler shuffle+set_epoch semantics);
    PrefetchIterator: order-preserving, exception-propagating background
    prefetch (DataLoader worker analogue)."""
    from longlive_tpu.utils.dataset import (PrefetchIterator, TextDataset,
                                            epoch_shard, shuffled_indices)

    p = tmp_path / "p.txt"
    p.write_text("\n".join(f"prompt {i}" for i in range(10)) + "\n")
    ds = TextDataset(str(p))

    assert shuffled_indices(10, seed=3, epoch=1) == shuffled_indices(
        10, seed=3, epoch=1)
    assert shuffled_indices(10, seed=3, epoch=1) != shuffled_indices(
        10, seed=3, epoch=2)

    a = epoch_shard(ds, 0, 2, seed=3, epoch=5)
    b = epoch_shard(ds, 1, 2, seed=3, epoch=5)
    got = sorted(r["idx"] for r in a + b)
    assert got == list(range(10))  # disjoint and complete
    assert [r["idx"] for r in epoch_shard(ds, 0, 2, seed=3, epoch=5)] == [
        r["idx"] for r in a]  # deterministic

    it = PrefetchIterator(iter(range(100)), depth=3)
    assert list(it) == list(range(100))  # order preserved

    def boom():
        yield 1
        raise ValueError("source failed")

    it = PrefetchIterator(boom())
    assert next(it) == 1
    try:
        next(it)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass

    it = PrefetchIterator(iter(range(10**6)), depth=2)
    assert next(it) == 0
    it.close()  # joins without hanging on the full queue


def test_sharded_checkpointable_loader_no_cross_host_repetition():
    """Within an epoch, the two hosts' shards are disjoint and together
    cover the dataset exactly once; shuffles differ across epochs."""
    from longlive_tpu.utils.dataset import ShardedCheckpointableLoader, TextDataset
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for i in range(7):  # odd count: shards differ in length by one
            f.write(f"prompt {i}\n")
        path = f.name
    try:
        ds = TextDataset(path)
        l0 = ShardedCheckpointableLoader(ds, 0, 2, seed=3)
        l1 = ShardedCheckpointableLoader(ds, 1, 2, seed=3)
        e0 = [next(l0)["idx"] for _ in range(4)]  # host 0 shard (len 4)
        e1 = [next(l1)["idx"] for _ in range(3)]  # host 1 shard (len 3)
        assert not (set(e0) & set(e1))
        assert set(e0) | set(e1) == set(range(7))
        # epoch 1 reshuffles (both hosts agree on the new permutation)
        n0 = [next(l0)["idx"] for _ in range(4)]
        n1 = [next(l1)["idx"] for _ in range(3)]
        assert set(n0) | set(n1) == set(range(7))
        assert (n0, n1) != (e0, e1)  # astronomically unlikely to collide
    finally:
        os.unlink(path)


def test_sharded_checkpointable_loader_mid_epoch_resume():
    """state() -> restore continues mid-epoch exactly: no repetition, no
    skips, across an epoch boundary too."""
    from longlive_tpu.utils.dataset import ShardedCheckpointableLoader, TextDataset
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for i in range(5):
            f.write(f"p{i}\n")
        path = f.name
    try:
        ds = TextDataset(path)
        ref = ShardedCheckpointableLoader(ds, 0, 1, seed=9)
        full = [next(ref)["idx"] for _ in range(12)]  # 2.4 epochs

        lo = ShardedCheckpointableLoader(ds, 0, 1, seed=9)
        first = [next(lo)["idx"] for _ in range(7)]
        st = lo.state()
        resumed = ShardedCheckpointableLoader(ds, 0, 1, seed=9, state=st)
        rest = [next(resumed)["idx"] for _ in range(5)]
        assert first + rest == full
    finally:
        os.unlink(path)
