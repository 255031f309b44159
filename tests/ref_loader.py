"""Shared loader for running reference modules (read-only, /root/reference)
as CPU numeric oracles with stubbed GPU/external deps."""

import importlib.machinery
import importlib.util
import sys
import types

import torch


def _ensure_stubs():
    torch.cuda.nvtx.range_push = lambda *a, **k: None
    torch.cuda.nvtx.range_pop = lambda *a, **k: None

    if "diffusers" not in sys.modules:
        diffusers = types.ModuleType("diffusers")
        conf = types.ModuleType("diffusers.configuration_utils")

        class ConfigMixin:
            pass

        conf.ConfigMixin = ConfigMixin
        conf.register_to_config = lambda fn: fn
        models = types.ModuleType("diffusers.models")
        mm = types.ModuleType("diffusers.models.modeling_utils")

        class ModelMixin(torch.nn.Module):
            pass

        mm.ModelMixin = ModelMixin
        sys.modules["diffusers"] = diffusers
        sys.modules["diffusers.configuration_utils"] = conf
        sys.modules["diffusers.models"] = models
        sys.modules["diffusers.models.modeling_utils"] = mm

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__path__ = []
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", loader=None,
                                                     is_package=True)
        tf = types.ModuleType("torchvision.transforms")

        class _T:
            def __init__(self, *a, **k):
                pass

        tf.Compose = lambda ts: ts
        tf.Resize = _T
        tf.ToTensor = _T
        tf.Normalize = _T
        tf.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf

    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        ftfy.__spec__ = importlib.machinery.ModuleSpec("ftfy", loader=None)
        sys.modules["ftfy"] = ftfy
    if "regex" not in sys.modules:
        import re as _re
        sys.modules["regex"] = _re

    for name in ("wan", "wan.modules", "utils"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m


def load_module(name, path):
    _ensure_stubs()
    if name in sys.modules and getattr(sys.modules[name], "__file__", None) == path:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def sdpa(q, k, v, *a, **kw):
    """fp32 SDPA stand-in for flash_attention([B,S,N,D] layout)."""
    out = torch.nn.functional.scaled_dot_product_attention(
        q.transpose(1, 2).float(), k.transpose(1, 2).float(),
        v.transpose(1, 2).float())
    return out.transpose(1, 2).contiguous().to(q.dtype)


def load_wan_model():
    """Reference wan/modules/model.py with SDPA attention."""
    load_module("wan.modules.attention",
                "/root/reference/wan/modules/attention.py")
    mod = load_module("wan.modules.model", "/root/reference/wan/modules/model.py")
    mod.flash_attention = sdpa
    return mod


def load_clip():
    """Reference wan/modules/clip.py with SDPA attention (CPU oracle)."""
    load_module("wan.modules.attention",
                "/root/reference/wan/modules/attention.py")
    load_module("wan.modules.xlm_roberta",
                "/root/reference/wan/modules/xlm_roberta.py")
    load_module("wan.modules.tokenizers",
                "/root/reference/wan/modules/tokenizers.py")
    mod = load_module("wan.modules.clip", "/root/reference/wan/modules/clip.py")
    mod.flash_attention = sdpa
    return mod


def load_causal_model():
    """Reference wan/modules/causal_model.py as a CPU fp32 oracle
    (GPU-memory helpers stubbed, SDPA attention pinned to fp32)."""
    _ensure_stubs()
    if "utils.memory" not in sys.modules:
        mem = types.ModuleType("utils.memory")
        mem.gpu = torch.device("cpu")
        mem.get_cuda_free_memory_gb = lambda *a, **k: 0.0
        mem.DynamicSwapInstaller = object
        mem.log_gpu_memory = lambda *a, **k: None
        sys.modules["utils.memory"] = mem
    if "utils.debug_option" not in sys.modules:
        dbg = types.ModuleType("utils.debug_option")
        dbg.DEBUG = False
        dbg.DEBUG_GRADIENT = False
        dbg.LOG_GPU_MEMORY = False
        sys.modules["utils.debug_option"] = dbg

    att = load_module("wan.modules.attention",
                      "/root/reference/wan/modules/attention.py")
    model_mod = load_module("wan.modules.model",
                            "/root/reference/wan/modules/model.py")
    cm = load_module("wan.modules.causal_model",
                     "/root/reference/wan/modules/causal_model.py")

    # the reference SDPA fallback casts to bf16 by default (attention.py:163)
    # which breaks fp32 CPU runs; pin fp32 for the numeric oracle
    def fp32(fn):
        def wrapped(*a, **k):
            k["dtype"] = torch.float32
            return fn(*a, **k)
        return wrapped

    cm.attention = fp32(att.attention)
    cm.flash_attention = sdpa
    model_mod.flash_attention = sdpa
    return cm
