"""Golden parity vs the ACTUAL reference CausalWanModel (loaded read-only
from /root/reference on CPU with stubbed diffusers/flash-attn deps).

Runs the reference's cached inference path (causal_model.py:907-1068 with
per-layer KV dict caches, clone/roll/insert and deferred commit) block by
block against our functional ring-buffer DiT with converted weights.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from longlive_tpu.config import CacheConfig, DiTConfig, tiny_geometry
from longlive_tpu.models import dit as D
from longlive_tpu.ops import kv_cache as kvc
from longlive_tpu.ops.rope import make_rope_tables
from longlive_tpu.utils.checkpoint import dit_params_from_torch


def _load_reference_causal_model():
    # CPU torch builds raise on NVTX calls; make them no-ops
    torch.cuda.nvtx.range_push = lambda *a, **k: None
    torch.cuda.nvtx.range_pop = lambda *a, **k: None

    # diffusers stubs (only mixin surface is used)
    diffusers = types.ModuleType("diffusers")
    conf = types.ModuleType("diffusers.configuration_utils")

    class ConfigMixin:
        pass

    def register_to_config(fn):
        return fn

    conf.ConfigMixin = ConfigMixin
    conf.register_to_config = register_to_config
    models = types.ModuleType("diffusers.models")
    mm = types.ModuleType("diffusers.models.modeling_utils")

    class ModelMixin(torch.nn.Module):
        pass

    mm.ModelMixin = ModelMixin
    sys.modules.setdefault("diffusers", diffusers)
    sys.modules["diffusers.configuration_utils"] = conf
    sys.modules["diffusers.models"] = models
    sys.modules["diffusers.models.modeling_utils"] = mm

    # reference-internal utils stubs (GPU memory helpers unused on CPU)
    utils_pkg = types.ModuleType("utils")
    utils_pkg.__path__ = []
    mem = types.ModuleType("utils.memory")
    mem.gpu = torch.device("cpu")
    mem.get_cuda_free_memory_gb = lambda *a, **k: 0.0
    mem.DynamicSwapInstaller = object
    mem.log_gpu_memory = lambda *a, **k: None
    dbg = types.ModuleType("utils.debug_option")
    dbg.DEBUG = False
    dbg.DEBUG_GRADIENT = False
    dbg.LOG_GPU_MEMORY = False
    sys.modules["utils"] = utils_pkg
    sys.modules["utils.memory"] = mem
    sys.modules["utils.debug_option"] = dbg

    wan = types.ModuleType("wan")
    wan.__path__ = []
    wm = types.ModuleType("wan.modules")
    wm.__path__ = []
    sys.modules["wan"] = wan
    sys.modules["wan.modules"] = wm

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    att = load("wan.modules.attention", "/root/reference/wan/modules/attention.py")
    model_mod = load("wan.modules.model", "/root/reference/wan/modules/model.py")
    cm = load("wan.modules.causal_model",
              "/root/reference/wan/modules/causal_model.py")

    # the reference SDPA fallback casts to bf16 by default (attention.py:163)
    # which breaks fp32 CPU runs; pin fp32 for the numeric oracle
    def fp32(fn):
        def wrapped(*a, **k):
            k["dtype"] = torch.float32
            return fn(*a, **k)
        return wrapped

    cm.attention = fp32(att.attention)

    def sdpa(q, k, v, *a, **kw):  # cross-attn calls flash_attention directly
        out = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        return out.transpose(1, 2).contiguous()

    model_mod.flash_attention = sdpa
    return cm


@pytest.fixture(scope="module")
def ref_setup():
    cm = _load_reference_causal_model()
    torch.manual_seed(0)
    geom = tiny_geometry()  # 8x8 latents, 4 channels -> 16 tokens/frame
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
    with torch.no_grad():  # non-trivial head (reference zero-inits it)
        ref.head.head.weight.normal_(0, 0.02)
    params = dit_params_from_torch(ref.state_dict(), cfg, jnp.float32)
    return cm, cfg, geom, ref, params


def test_cached_generation_matches_reference(ref_setup):
    cm, cfg, geom, ref, params = ref_setup
    fs = geom.frame_seq_length  # 16
    B, F_TOTAL = 1, 6  # exercises warmup, sink pinning, and rolls
    head_dim = cfg.head_dim
    torch.manual_seed(1)
    prompt = torch.randn(B, cfg.text_len, cfg.text_dim)
    x_all = torch.randn(B, F_TOTAL, cfg.in_dim, geom.height, geom.width)
    t_val = 500.0

    # reference caches (causal_inference.py:255-293)
    kv_cache = [
        {"k": torch.zeros(B, cfg.local_attn_size * fs, cfg.num_heads, head_dim),
         "v": torch.zeros(B, cfg.local_attn_size * fs, cfg.num_heads, head_dim),
         "global_end_index": torch.tensor([0]),
         "local_end_index": torch.tensor([0])}
        for _ in range(cfg.num_layers)
    ]
    crossattn_cache = [
        {"k": torch.zeros(B, cfg.text_len, cfg.num_heads, head_dim),
         "v": torch.zeros(B, cfg.text_len, cfg.num_heads, head_dim),
         "is_init": False}
        for _ in range(cfg.num_layers)
    ]

    ref_out = []
    with torch.no_grad():
        for f in range(F_TOTAL):
            xb = x_all[:, f].unsqueeze(2)  # [B, C, 1, H, W]
            t = torch.full((B, 1), t_val)
            y = ref(
                [u for u in xb], t=t, context=[prompt[0]], seq_len=10_000,
                kv_cache=kv_cache, crossattn_cache=crossattn_cache,
                current_start=f * fs,
            )
            ref_out.append(y.squeeze(2))  # [B, C, H, W]
    ref_out = torch.stack(ref_out, dim=1).numpy()  # [B, F, C, H, W]

    # ours
    cache_cfg = CacheConfig(sink_frames=cfg.sink_size,
                            ring_frames=cfg.local_attn_size - cfg.sink_size,
                            frame_seq=fs)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    cross = D.prepare_cross_kv(params, cfg, jnp.asarray(prompt.numpy()), jnp.float32)
    cache = kvc.init_cache(cache_cfg, cfg.num_layers, B, cfg.num_heads,
                           cfg.head_dim, jnp.float32)
    ours = []
    for f in range(F_TOTAL):
        xb = jnp.asarray(x_all[:, f : f + 1].numpy())
        t = jnp.full((B, 1), t_val, jnp.float32)
        flow, cache = D.dit_forward_cached(
            params, cfg, cache_cfg, tables, xb, t, cross, cache,
            jnp.asarray(f, jnp.int32), attn_impl="xla",
        )
        ours.append(np.asarray(flow[:, 0]))
    ours = np.stack(ours, axis=1)

    np.testing.assert_allclose(ours, ref_out, rtol=5e-3, atol=5e-4)


def _ref_caches(cfg, B, fs, cache_frames):
    kv = [
        {"k": torch.zeros(B, cache_frames * fs, cfg.num_heads, cfg.head_dim),
         "v": torch.zeros(B, cache_frames * fs, cfg.num_heads, cfg.head_dim),
         "global_end_index": torch.tensor([0]),
         "local_end_index": torch.tensor([0])}
        for _ in range(cfg.num_layers)
    ]
    ca = [
        {"k": torch.zeros(B, cfg.text_len, cfg.num_heads, cfg.head_dim),
         "v": torch.zeros(B, cfg.text_len, cfg.num_heads, cfg.head_dim),
         "is_init": False}
        for _ in range(cfg.num_layers)
    ]
    return kv, ca


@pytest.mark.slow
def test_recache_after_switch_matches_reference(ref_setup):
    """Prompt-switch KV-recache (interactive_causal_inference.py:34-106):
    generate under prompt A, switch to B with recache (zero cache, replay the
    last window with sink_recache_after_switch=True), continue generating —
    outputs must match our jitted recache + ring-buffer continuation."""
    cm, cfg, geom, ref, params = ref_setup
    fs = geom.frame_seq_length
    B = 1
    window = cfg.local_attn_size  # 4
    switch_at, f_total = 5, 7
    torch.manual_seed(3)
    prompt_a = torch.randn(B, cfg.text_len, cfg.text_dim)
    prompt_b = torch.randn(B, cfg.text_len, cfg.text_dim)
    x_all = torch.randn(B, f_total, cfg.in_dim, geom.height, geom.width)
    t_val = 250.0

    # ---- reference run
    kv, ca = _ref_caches(cfg, B, fs, window)
    ref_out = []
    with torch.no_grad():
        def ref_fwd(xb, f, prompt, sink_recache=False, nframes=1):
            t = torch.full((B, nframes), t_val if not sink_recache else 0.0)
            return ref([u for u in xb], t=t, context=[prompt[0]], seq_len=10_000,
                       kv_cache=kv, crossattn_cache=ca, current_start=f * fs,
                       sink_recache_after_switch=sink_recache)

        for f in range(switch_at):
            y = ref_fwd(x_all[:, f].unsqueeze(2), f, prompt_a)
            ref_out.append(y.squeeze(2))
        # switch: zero kv (global_sink=False), reset cross cache, replay
        for blk in kv:
            blk["k"].zero_(); blk["v"].zero_()
        for blk in ca:
            blk["k"].zero_(); blk["v"].zero_(); blk["is_init"] = False
        n = min(window, switch_at)
        replay = torch.stack(ref_out[-n:], dim=1)  # [B, n, C, H, W]
        ref_fwd(replay.permute(0, 2, 1, 3, 4), switch_at - n, prompt_b,
                sink_recache=True, nframes=n)
        for blk in ca:
            blk["k"].zero_(); blk["v"].zero_(); blk["is_init"] = False
        for f in range(switch_at, f_total):
            y = ref_fwd(x_all[:, f].unsqueeze(2), f, prompt_b)
            ref_out.append(y.squeeze(2))
    ref_out = torch.stack(ref_out, dim=1).numpy()

    # ---- ours
    from longlive_tpu.pipeline.causal_inference import build_recache_fn

    cache_cfg = CacheConfig(cfg.sink_size, window - cfg.sink_size, fs)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    cross_a = D.prepare_cross_kv(params, cfg, jnp.asarray(prompt_a.numpy()), jnp.float32)
    cross_b = D.prepare_cross_kv(params, cfg, jnp.asarray(prompt_b.numpy()), jnp.float32)
    cache = kvc.init_cache(cache_cfg, cfg.num_layers, B, cfg.num_heads,
                           cfg.head_dim, jnp.float32)
    ours = []

    def our_fwd(f, cross, cache):
        xb = jnp.asarray(x_all[:, f : f + 1].numpy())
        t = jnp.full((B, 1), t_val, jnp.float32)
        flow, cache = D.dit_forward_cached(
            params, cfg, cache_cfg, tables, xb, t, cross, cache,
            jnp.asarray(f, jnp.int32), attn_impl="xla")
        return np.asarray(flow[:, 0]), cache

    for f in range(switch_at):
        y, cache = our_fwd(f, cross_a, cache)
        ours.append(y)
    n = min(window, switch_at)
    replay = jnp.asarray(np.stack(ours[-n:], axis=1))
    recache = build_recache_fn(cfg, cache_cfg, tables, 0.0, n,
                               global_sink=False, overwrite_sink=True,
                               window_frames=window, attn_impl="xla")
    cache = recache(params, cache, cross_b, replay,
                    jnp.asarray(switch_at - n, jnp.int32))
    for f in range(switch_at, f_total):
        y, cache = our_fwd(f, cross_b, cache)
        ours.append(y)
    ours = np.stack(ours, axis=1)

    np.testing.assert_allclose(ours, ref_out, rtol=5e-3, atol=5e-4)


def test_window_capped_cache_matches_reference(ref_setup):
    """Training-style cache: retains 6 frames but attends only a 4-frame
    budget (sink 1 + last 3).  The reference realizes this via
    max_attention_size (set by _set_all_modules_max_attention_size,
    self_forcing_training.py:551-581); ours via window_frames."""
    cm, cfg, geom, ref, params = ref_setup
    fs = geom.frame_seq_length
    B, f_total, cache_frames, window = 1, 8, 6, 4
    torch.manual_seed(4)
    prompt = torch.randn(B, cfg.text_len, cfg.text_dim)
    x_all = torch.randn(B, f_total, cfg.in_dim, geom.height, geom.width)
    t_val = 500.0

    for m in ref.modules():
        if hasattr(m, "max_attention_size"):
            m.max_attention_size = window * fs

    kv, ca = _ref_caches(cfg, B, fs, cache_frames)
    ref_out = []
    with torch.no_grad():
        for f in range(f_total):
            t = torch.full((B, 1), t_val)
            y = ref([u for u in x_all[:, f].unsqueeze(2)], t=t,
                    context=[prompt[0]], seq_len=10_000, kv_cache=kv,
                    crossattn_cache=ca, current_start=f * fs)
            ref_out.append(y.squeeze(2))
    ref_out = torch.stack(ref_out, dim=1).numpy()

    for m in ref.modules():  # restore for other tests
        if hasattr(m, "max_attention_size"):
            m.max_attention_size = cfg.local_attn_size * 1560

    cache_cfg = CacheConfig(cfg.sink_size, cache_frames - cfg.sink_size, fs)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    cross = D.prepare_cross_kv(params, cfg, jnp.asarray(prompt.numpy()), jnp.float32)
    cache = kvc.init_cache(cache_cfg, cfg.num_layers, B, cfg.num_heads,
                           cfg.head_dim, jnp.float32)
    ours = []
    for f in range(f_total):
        xb = jnp.asarray(x_all[:, f : f + 1].numpy())
        t = jnp.full((B, 1), t_val, jnp.float32)
        flow, cache = D.dit_forward_cached(
            params, cfg, cache_cfg, tables, xb, t, cross, cache,
            jnp.asarray(f, jnp.int32), attn_impl="xla", window_frames=window)
        ours.append(np.asarray(flow[:, 0]))
    ours = np.stack(ours, axis=1)

    np.testing.assert_allclose(ours, ref_out, rtol=5e-3, atol=5e-4)


@pytest.mark.slow
def test_eager_chunked_recache_matches_reference_blockwise(ref_setup):
    """Incremental (chunked) prompt-switch recache (EagerRecache): the
    reference's interactive mode replays under a blockwise-CAUSAL mask
    (interactive_causal_inference.py:73-96) — equivalently, feeding the
    replay block-by-block through its cached path.  Our eager recache
    chunks the same way by construction; outputs after the switch must
    match the reference driven per-block."""
    cm, cfg, geom, ref, params = ref_setup
    from longlive_tpu.config import PipelineConfig
    from longlive_tpu.pipeline import CausalInferencePipeline

    fs = geom.frame_seq_length
    B = 1
    window = cfg.local_attn_size  # 4
    switch_at, f_total = 5, 7
    torch.manual_seed(7)
    prompt_a = torch.randn(B, cfg.text_len, cfg.text_dim)
    prompt_b = torch.randn(B, cfg.text_len, cfg.text_dim)
    x_all = torch.randn(B, f_total, cfg.in_dim, geom.height, geom.width)
    t_val = 250.0

    # ---- reference: per-frame replay through the cached path
    kv, ca = _ref_caches(cfg, B, fs, window)
    ref_out = []
    with torch.no_grad():
        def ref_fwd(xb, f, prompt, sink_recache=False, nframes=1):
            t = torch.full((B, nframes), t_val if not sink_recache else 0.0)
            return ref([u for u in xb], t=t, context=[prompt[0]], seq_len=10_000,
                       kv_cache=kv, crossattn_cache=ca, current_start=f * fs,
                       sink_recache_after_switch=sink_recache)

        for f in range(switch_at):
            y = ref_fwd(x_all[:, f].unsqueeze(2), f, prompt_a)
            ref_out.append(y.squeeze(2))
        for blk in kv:
            blk["k"].zero_(); blk["v"].zero_()
        for blk in ca:
            blk["k"].zero_(); blk["v"].zero_(); blk["is_init"] = False
        n = min(window, switch_at)
        for i in range(n):  # chunked: one frame per call, causal by arrival
            f = switch_at - n + i
            ref_fwd(ref_out[f].unsqueeze(2), f, prompt_b, sink_recache=True)
        for blk in ca:
            blk["k"].zero_(); blk["v"].zero_(); blk["is_init"] = False
        for f in range(switch_at, f_total):
            y = ref_fwd(x_all[:, f].unsqueeze(2), f, prompt_b)
            ref_out.append(y.squeeze(2))
    ref_out = torch.stack(ref_out, dim=1).numpy()

    # ---- ours: EagerRecache
    cache_cfg = CacheConfig(cfg.sink_size, window - cfg.sink_size, fs)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    cross_a = D.prepare_cross_kv(params, cfg, jnp.asarray(prompt_a.numpy()), jnp.float32)
    cross_b = D.prepare_cross_kv(params, cfg, jnp.asarray(prompt_b.numpy()), jnp.float32)
    cache = kvc.init_cache(cache_cfg, cfg.num_layers, B, cfg.num_heads,
                           cfg.head_dim, jnp.float32)
    pcfg = PipelineConfig(
        num_frame_per_block=cfg.num_frame_per_block, context_noise=0,
        local_attn_size=cfg.local_attn_size, sink_size=cfg.sink_size,
        num_output_frames=8, kernel_cache=False)
    pipe = CausalInferencePipeline(pcfg, params, geometry=geom,
                                   dit_config=cfg, attn_impl="xla")
    assert pipe.cache_cfg == cache_cfg
    ours = []

    def our_fwd(f, cross, cache):
        xb = jnp.asarray(x_all[:, f : f + 1].numpy())
        t = jnp.full((B, 1), t_val, jnp.float32)
        flow, cache = D.dit_forward_cached(
            params, cfg, cache_cfg, tables, xb, t, cross, cache,
            jnp.asarray(f, jnp.int32), attn_impl="xla")
        return np.asarray(flow[:, 0]), cache

    for f in range(switch_at):
        y, cache = our_fwd(f, cross_a, cache)
        ours.append(y)
    n = min(window, switch_at)
    er = pipe.begin_eager_recache(B, switch_frame=switch_at, dtype=jnp.float32)
    replay = jnp.asarray(np.stack(ours[-n:], axis=1))
    assert er.feed(cross_b, replay, switch_at - n) == n
    cache = er.finish()
    for f in range(switch_at, f_total):
        y, cache = our_fwd(f, cross_b, cache)
        ours.append(y)
    ours = np.stack(ours, axis=1)

    np.testing.assert_allclose(ours, ref_out, rtol=5e-3, atol=5e-4)
