"""Real-weight conversion dress rehearsal (VERDICT r3 item 8).

Day-one risk with released artifacts is the FILE-level load path: the
reference saves `model.pt` with `_fsdp_wrapped_module.` prefixes and
`generator`/`generator_ema` layouts (trainer/distillation.py:741-813,
inference.py:72-94) plus PEFT-named LoRA adapters (:1448-1456).  This test
builds those files from the ACTUAL reference model code at tiny geometry,
loads them through `utils.loading` exactly as the CLIs do (including the
converted-checkpoint orbax cache), and asserts pipeline-level parity.
"""

import os

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from longlive_tpu.config import DiTConfig, PipelineConfig, tiny_geometry
from longlive_tpu.models import vae as V
from longlive_tpu.utils import loading
from longlive_tpu.utils.checkpoint import (dit_params_from_torch,
                                           fold_lora_into_dit_sd,
                                           vae_params_from_torch)


def _tree_allclose(a, b, atol=0.0):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


@pytest.fixture(scope="module")
def ref_ckpt_tree(tmp_path_factory):
    """A reference-layout artifact tree written with torch.save."""
    from ref_loader import load_causal_model

    cm = load_causal_model()
    torch.manual_seed(0)
    cfg = DiTConfig(dim=96, ffn_dim=128, num_heads=4, num_layers=2, in_dim=4,
                    out_dim=4, text_dim=32, text_len=16, freq_dim=32,
                    local_attn_size=4, sink_size=1, num_frame_per_block=1,
                    rope_max_pos=1024)
    ref = cm.CausalWanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=cfg.text_len,
        in_dim=cfg.in_dim, dim=cfg.dim, ffn_dim=cfg.ffn_dim,
        freq_dim=cfg.freq_dim, text_dim=cfg.text_dim, out_dim=cfg.out_dim,
        num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        local_attn_size=cfg.local_attn_size, sink_size=cfg.sink_size,
        qk_norm=True, cross_attn_norm=True, eps=1e-6,
    ).eval()
    with torch.no_grad():
        ref.head.head.weight.normal_(0, 0.02)
    sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}

    root = tmp_path_factory.mktemp("artifacts")
    # generator under FSDP prefixes; EMA shadow with distinct values
    # (reference FULL_STATE_DICT save layout)
    wrapped = {f"_fsdp_wrapped_module.{k}": v for k, v in sd.items()}
    ema_sd = {f"_fsdp_wrapped_module.{k}": (v * 0.5 if v.is_floating_point()
                                            else v) for k, v in sd.items()}
    gen_path = os.path.join(root, "longlive_base.pt")
    torch.save({"generator": wrapped, "generator_ema": ema_sd}, gen_path)

    # PEFT LoRA adapters (reference key style, distillation.py:1448-1456)
    torch.manual_seed(1)
    rank = 2
    lora = {}
    for i in range(cfg.num_layers):
        for mod in ("self_attn.q", "self_attn.o", "cross_attn.k", "ffn.0"):
            base = f"base_model.model.blocks.{i}.{mod}"
            out_f = {"self_attn.q": cfg.dim, "self_attn.o": cfg.dim,
                     "cross_attn.k": cfg.dim, "ffn.0": cfg.ffn_dim}[mod]
            lora[f"{base}.lora_A.default.weight"] = torch.randn(rank, cfg.dim) * 0.1
            lora[f"{base}.lora_B.default.weight"] = torch.randn(out_f, rank) * 0.1
    lora_path = os.path.join(root, "lora.pt")
    torch.save({"generator_lora": lora}, lora_path)
    return cfg, sd, lora, str(root), gen_path, lora_path


@pytest.mark.slow
def test_generator_file_load_matches_inmemory_conversion(ref_ckpt_tree, monkeypatch):
    cfg, sd, lora, root, gen_path, lora_path = ref_ckpt_tree
    alpha = 4.0
    config = PipelineConfig(
        generator_ckpt=gen_path, lora_ckpt=lora_path,
        extras={"adapter": {"alpha": alpha, "rank": 2.0}, "ckpt_cache": True})
    monkeypatch.setenv("LONGLIVE_CKPT_CACHE", "1")

    loaded = loading.load_dit_params(config, cfg, jnp.float32)
    expect_sd = fold_lora_into_dit_sd(dict(sd), lora, alpha_over_rank=alpha / 2.0)
    expected = dit_params_from_torch(expect_sd, cfg, jnp.float32)
    _tree_allclose(loaded, expected)

    # cache round-trip (second load restores the orbax tree) is identical
    again = loading.load_dit_params(config, cfg, jnp.float32)
    assert os.path.exists(f"{gen_path}.jaxcache-gen-float32-lorafold4-2/SOURCES.json")
    _tree_allclose(again, expected)

    # EMA layout: generator_ema selected, LoRA still folded on top
    ema = loading.load_dit_params(config, cfg, jnp.float32, use_ema=True)
    ema_sd = {k: (v * 0.5 if v.is_floating_point() else v)
              for k, v in sd.items()}
    expect_ema = dit_params_from_torch(
        fold_lora_into_dit_sd(ema_sd, lora, alpha_over_rank=alpha / 2.0),
        cfg, jnp.float32)
    _tree_allclose(ema, expect_ema)


@pytest.mark.slow
def test_pipeline_runs_on_file_loaded_weights(ref_ckpt_tree):
    """generate_latents on the file-loaded tree is bitwise the in-memory
    tree's output (transitively golden vs the reference via
    test_reference_parity's cached-generation oracle)."""
    from longlive_tpu.pipeline import CausalInferencePipeline

    cfg, sd, lora, root, gen_path, lora_path = ref_ckpt_tree
    geom = tiny_geometry()
    config = PipelineConfig(
        generator_ckpt=gen_path, lora_ckpt=lora_path,
        local_attn_size=cfg.local_attn_size, sink_size=cfg.sink_size,
        num_frame_per_block=1,
        extras={"adapter": {"alpha": 4.0, "rank": 2.0}})
    loaded = loading.load_dit_params(config, cfg, jnp.float32)
    expected = dit_params_from_torch(
        fold_lora_into_dit_sd(dict(sd), lora, alpha_over_rank=2.0),
        cfg, jnp.float32)

    noise = jax.random.normal(jax.random.PRNGKey(3),
                              (1, 3, geom.channels, geom.height, geom.width))
    pe = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.text_len, cfg.text_dim))
    outs = []
    for params in (loaded, expected):
        pipe = CausalInferencePipeline(config, params, geometry=geom,
                                       dit_config=cfg)
        cross = pipe.prepare_condition(pe)
        lat, _, _ = pipe.generate_latents_scanned(noise, cross)
        outs.append(np.asarray(lat))
    np.testing.assert_array_equal(outs[0], outs[1])
    assert np.isfinite(outs[0]).all()


@pytest.mark.slow
def test_vae_and_t5_file_conversion(ref_ckpt_tree, tmp_path, monkeypatch):
    """VAE .pth in the wan_models/<name>/ layout through load_vae_params
    (tiny VAEConfig), T5 .pth through t5_params_from_torch."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_wan_vae_rehearsal", "/root/reference/wan/modules/vae.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(2)
    vcfg = V.VAEConfig(dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                       temperal_downsample=(True,))
    ref_vae = mod.WanVAE_(
        dim=vcfg.dim, z_dim=vcfg.z_dim, dim_mult=list(vcfg.dim_mult),
        num_res_blocks=vcfg.num_res_blocks, attn_scales=[],
        temperal_downsample=list(vcfg.temperal_downsample), dropout=0.0).eval()
    model_dir = tmp_path / "wan_models" / "Wan2.1-T2V-1.3B"
    model_dir.mkdir(parents=True)
    torch.save(ref_vae.state_dict(), model_dir / "Wan2.1_VAE.pth")
    monkeypatch.chdir(tmp_path)

    config = PipelineConfig()
    params, got_cfg = loading.load_vae_params(config, jnp.float32, vcfg=vcfg)
    expected = vae_params_from_torch(ref_vae.state_dict(), vcfg, jnp.float32)
    _tree_allclose(params, expected)

    # decode executes on the file-loaded tree
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 2, vcfg.z_dim, 8, 8))
    out = V.vae_decode(params, vcfg, z, chunk=1)
    assert np.isfinite(np.asarray(out)).all()

    # T5: reference torch encoder state dict -> file -> converted tree
    src = open("/root/reference/wan/modules/t5.py").read()
    src = src.replace("from .tokenizers import HuggingfaceTokenizer", "")
    src = src.replace("device=torch.cuda.current_device(),", "device=None,")
    ns = {}
    exec(compile(src, "ref_t5_rehearsal", "exec"), ns)
    from longlive_tpu.models import t5 as T

    tcfg = T.tiny_t5_config()
    ref_t5 = ns["T5Encoder"](vocab=tcfg.vocab_size, dim=tcfg.dim,
                             dim_attn=tcfg.dim_attn, dim_ffn=tcfg.dim_ffn,
                             num_heads=tcfg.num_heads,
                             num_layers=tcfg.num_layers,
                             num_buckets=tcfg.num_buckets, shared_pos=False,
                             dropout=0.0).eval()
    t5_path = model_dir / "models_t5_umt5-xxl-enc-bf16.pth"
    torch.save(ref_t5.state_dict(), t5_path)
    got = T.t5_params_from_torch(torch.load(t5_path, weights_only=False),
                                 tcfg, jnp.float32)
    expected_t5 = T.t5_params_from_torch(ref_t5.state_dict(), tcfg, jnp.float32)
    _tree_allclose(got, expected_t5)
