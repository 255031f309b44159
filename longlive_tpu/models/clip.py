"""CLIP vision tower (open-clip XLM-Roberta-CLIP ViT-H/14) — the I2V image
conditioner.

TPU-native re-design of the reference's vendored CLIP
(wan/modules/clip.py:209-300 `VisionTransformer`,
clip.py:471-498 `clip_xlm_roberta_vit_h_14`, clip.py:501-543 `CLIPModel`).
Only the visual branch is live in the WanI2V path: `CLIPModel.visual`
runs the ViT with ``use_31_block=True`` (the first 31 of 32 blocks, no
post-norm) and feeds the 257 output tokens to the DiT's img_emb
(image2video.py:232-233, model.py:710-712).

Design notes:
- the stride-14 patch Conv2d is expressed as patch-extract + one matmul
  (identical math, MXU-shaped);
- the 32 transformer blocks are a stacked-parameter `lax.scan`; the
  31-block variant scans a sliced prefix of the stack;
- LayerNorms compute in f32 and cast back, matching the reference's
  `LayerNorm(x.float()).type_as(x)` (clip.py:47-50).

Documented deviation: image resizing uses `jax.image.resize` bicubic
(Catmull-Rom, a=-0.5) while torch `F.interpolate(mode='bicubic')` uses
a=-0.75; both are half-pixel aligned (align_corners=False).  The resulting
pixel differences are tiny relative to CLIP's own normalization.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import nn

# CLIP normalization constants (clip.py:456-458).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """ViT geometry (clip_xlm_roberta_vit_h_14 defaults, clip.py:475-496)."""

    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: int = 4
    num_heads: int = 16
    num_layers: int = 32
    out_dim: int = 1024
    activation: str = "gelu"  # 'gelu' | 'quick_gelu' (clip.py:141-143)
    eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


def tiny_clip_vision_config() -> CLIPVisionConfig:
    return CLIPVisionConfig(image_size=28, patch_size=14, dim=32, mlp_ratio=2,
                            num_heads=4, num_layers=3, out_dim=16)


def _act(cfg: CLIPVisionConfig, x):
    return nn.quick_gelu(x) if cfg.activation == "quick_gelu" else nn.gelu_exact(x)


def _ln(x, p, eps):
    return nn.layer_norm(x, eps, p["scale"], p["bias"])


def preprocess_image(img: jax.Array, cfg: CLIPVisionConfig = CLIPVisionConfig()
                     ) -> jax.Array:
    """[B, 3, H, W] in [-1, 1] -> normalized [B, 3, S, S] CLIP input
    (CLIPModel.visual preprocessing, clip.py:527-537)."""
    b, c, h, w = img.shape
    s = cfg.image_size
    x = img.astype(jnp.float32)
    if (h, w) != (s, s):
        x = jax.image.resize(x, (b, c, s, s), method="bicubic")
    x = x * 0.5 + 0.5
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)[None, :, None, None]
    std = jnp.asarray(CLIP_STD, jnp.float32)[None, :, None, None]
    return (x - mean) / std


def clip_vision_forward(
    params: dict,
    cfg: CLIPVisionConfig,
    x: jax.Array,  # [B, 3, S, S], already preprocessed
    use_31_block: bool = True,
) -> jax.Array:
    """VisionTransformer.forward (clip.py:279-300).  With use_31_block
    (the I2V path) returns the token sequence [B, 1+P, dim] after 31 of 32
    blocks and NO post-norm; otherwise all blocks are run (still returning
    tokens — pooling heads are not used by any Wan path)."""
    b = x.shape[0]
    p, d = cfg.patch_size, cfg.dim
    g = cfg.image_size // p
    dtype = params["patch_embedding"]["kernel"].dtype

    # stride-p conv == patch extract + matmul
    xp = x.astype(dtype).reshape(b, 3, g, p, g, p)
    xp = xp.transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, 3 * p * p)
    tokens = nn.linear(xp, params["patch_embedding"])
    cls = jnp.broadcast_to(params["cls_embedding"].astype(dtype), (b, 1, d))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + params["pos_embedding"].astype(dtype)
    if "pre_norm" in params:
        tokens = _ln(tokens, params["pre_norm"], cfg.eps)

    n, hd = cfg.num_heads, cfg.head_dim
    s = tokens.shape[1]

    def block(xcur, layer_p):
        hh = _ln(xcur, layer_p["norm1"], cfg.eps)
        qkv = nn.linear(hh, layer_p["qkv"]).reshape(b, s, 3, n, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = jax.nn.dot_product_attention(q, k, v)
        xcur = xcur + nn.linear(att.reshape(b, s, n * hd), layer_p["proj"])
        hh = _ln(xcur, layer_p["norm2"], cfg.eps)
        y = nn.linear(_act(cfg, nn.linear(hh, layer_p["fc1"])), layer_p["fc2"])
        return xcur + y, None

    layers = params["layers"]
    if use_31_block:
        layers = jax.tree.map(lambda a: a[: cfg.num_layers - 1], layers)
    tokens, _ = jax.lax.scan(block, tokens, layers)
    return tokens


def init_clip_vision_params(rng: jax.Array, cfg: CLIPVisionConfig,
                            dtype=jnp.float32) -> dict:
    d, L = cfg.dim, cfg.num_layers
    mid = int(d * cfg.mlp_ratio)
    keys = iter(jax.random.split(rng, 16))
    gain = 1.0 / math.sqrt(d)

    def stacked_lin(d_in, d_out):
        ks = jax.random.split(next(keys), L)
        return jax.vmap(lambda k: nn.init_linear(k, d_in, d_out, "xavier",
                                                 dtype=dtype))(ks)

    def ln(width):
        return {"scale": jnp.ones((L, width), dtype),
                "bias": jnp.zeros((L, width), dtype)}

    return {
        "patch_embedding": {
            # no bias when pre_norm (clip.py:248-253)
            "kernel": nn.init_linear(next(keys), 3 * cfg.patch_size ** 2, d,
                                     "xavier", bias=False, dtype=dtype)["kernel"],
        },
        "cls_embedding": gain * jax.random.normal(next(keys), (1, 1, d), dtype),
        "pos_embedding": gain * jax.random.normal(
            next(keys), (1, cfg.num_patches + 1, d), dtype),
        "pre_norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "layers": {
            "norm1": ln(d),
            "qkv": stacked_lin(d, 3 * d),
            "proj": stacked_lin(d, d),
            "norm2": ln(d),
            "fc1": stacked_lin(d, mid),
            "fc2": stacked_lin(mid, d),
        },
        "post_norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }


def clip_vision_params_from_torch(sd: dict, cfg: CLIPVisionConfig = CLIPVisionConfig(),
                                  dtype=jnp.bfloat16) -> dict:
    """XLMRobertaCLIP state_dict (the `models_clip_*.pth` checkpoint) ->
    vision-tower pytree.  Only `visual.*` keys are consumed; the textual
    XLM-Roberta branch is unused by the I2V path (SURVEY §1)."""

    def a(key):
        t = sd[key]
        t = t.float().cpu().numpy() if hasattr(t, "float") else np.asarray(t)
        return t

    L = cfg.num_layers
    pe = a("visual.patch_embedding.weight")  # [d, 3, p, p]

    def stack_linear(fmt):
        w = np.stack([a(fmt.format(i) + ".weight") for i in range(L)])
        b = np.stack([a(fmt.format(i) + ".bias") for i in range(L)])
        return {"kernel": jnp.asarray(w.transpose(0, 2, 1), dtype),
                "bias": jnp.asarray(b, dtype)}

    def stack_ln(fmt):
        return {"scale": jnp.asarray(
                    np.stack([a(fmt.format(i) + ".weight") for i in range(L)]), dtype),
                "bias": jnp.asarray(
                    np.stack([a(fmt.format(i) + ".bias") for i in range(L)]), dtype)}

    return {
        "patch_embedding": {
            "kernel": jnp.asarray(pe.reshape(cfg.dim, -1).T, dtype),
        },
        "cls_embedding": jnp.asarray(a("visual.cls_embedding"), dtype),
        "pos_embedding": jnp.asarray(a("visual.pos_embedding"), dtype),
        "pre_norm": {"scale": jnp.asarray(a("visual.pre_norm.weight"), dtype),
                     "bias": jnp.asarray(a("visual.pre_norm.bias"), dtype)},
        "layers": {
            "norm1": stack_ln("visual.transformer.{}.norm1"),
            "qkv": stack_linear("visual.transformer.{}.attn.to_qkv"),
            "proj": stack_linear("visual.transformer.{}.attn.proj"),
            "norm2": stack_ln("visual.transformer.{}.norm2"),
            "fc1": stack_linear("visual.transformer.{}.mlp.0"),
            "fc2": stack_linear("visual.transformer.{}.mlp.2"),
        },
        "post_norm": {"scale": jnp.asarray(a("visual.post_norm.weight"), dtype),
                      "bias": jnp.asarray(a("visual.post_norm.bias"), dtype)},
    }


def encode_image(params: dict, cfg: CLIPVisionConfig, img: jax.Array) -> jax.Array:
    """[-1,1] image [B, 3, H, W] -> CLIP features [B, 257, dim]
    (CLIPModel.visual, clip.py:527-542)."""
    return clip_vision_forward(params, cfg, preprocess_image(img, cfg),
                               use_31_block=True)


# ---------------------------------------------------------------------------
# XLM-Roberta text branch (reference wan/modules/xlm_roberta.py:76-170 and
# clip.py:303-325 XLMRobertaWithHead).  Unused by the Wan video generate
# paths, kept for full XLMRobertaCLIP parity (text-image similarity).


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """xlm_roberta_large defaults (xlm_roberta.py:146-165)."""

    vocab_size: int = 250002
    max_seq_len: int = 514
    type_size: int = 1
    pad_id: int = 1
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    post_norm: bool = True
    eps: float = 1e-5
    out_dim: int = 1024  # embed_dim (clip.py:310-313 head)

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


def tiny_clip_text_config() -> CLIPTextConfig:
    return CLIPTextConfig(vocab_size=64, max_seq_len=16, dim=32, num_heads=4,
                          num_layers=2, out_dim=16)


def xlm_roberta_forward(params: dict, cfg: CLIPTextConfig,
                        ids: jax.Array) -> jax.Array:
    """XLMRoberta.forward (xlm_roberta.py:118-143): ids [B, L] int32 ->
    features [B, L, dim].  Positions = pad_id + cumsum(non-pad)*non-pad;
    padding masked with -inf attention bias."""
    b, s = ids.shape
    mask = (ids != cfg.pad_id).astype(jnp.int32)
    pos = cfg.pad_id + jnp.cumsum(mask, axis=1) * mask
    x = (params["token_embedding"][ids]
         + params["type_embedding"][jnp.zeros_like(ids)]
         + params["pos_embedding"][pos])
    if cfg.post_norm:
        x = _ln(x, params["norm"], cfg.eps)

    bias = jnp.where(mask[:, None, None, :] > 0, 0.0,
                     jnp.finfo(jnp.float32).min)
    n, hd = cfg.num_heads, cfg.head_dim

    def block(xcur, layer_p):
        def attn(h):
            q = nn.linear(h, layer_p["q"]).reshape(b, s, n, hd)
            k = nn.linear(h, layer_p["k"]).reshape(b, s, n, hd)
            v = nn.linear(h, layer_p["v"]).reshape(b, s, n, hd)
            a = jax.nn.dot_product_attention(
                q, k, v, bias=bias.astype(jnp.float32))
            return nn.linear(a.reshape(b, s, n * hd), layer_p["o"])

        def ffn(h):
            return nn.linear(nn.gelu_exact(nn.linear(h, layer_p["fc1"])),
                             layer_p["fc2"])

        if cfg.post_norm:
            xo = _ln(xcur + attn(xcur), layer_p["norm1"], cfg.eps)
            xo = _ln(xo + ffn(xo), layer_p["norm2"], cfg.eps)
        else:
            xo = xcur + attn(_ln(xcur, layer_p["norm1"], cfg.eps))
            xo = xo + ffn(_ln(xo, layer_p["norm2"], cfg.eps))
        return xo, None

    x, _ = jax.lax.scan(block, x, params["layers"])
    if not cfg.post_norm:
        x = _ln(x, params["norm"], cfg.eps)
    return x


def clip_text_forward(params: dict, cfg: CLIPTextConfig,
                      ids: jax.Array) -> jax.Array:
    """XLMRobertaWithHead.forward (clip.py:315-325): masked mean pooling
    over non-pad tokens, then the 2-layer GELU head -> [B, out_dim]."""
    x = xlm_roberta_forward(params, cfg, ids)
    mask = (ids != cfg.pad_id).astype(x.dtype)[..., None]
    pooled = jnp.sum(x * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
    h = params["head"]
    return nn.linear(nn.gelu_exact(nn.linear(pooled, h["fc1"])), h["fc2"])


def init_clip_text_params(rng: jax.Array, cfg: CLIPTextConfig,
                          dtype=jnp.float32) -> dict:
    d, L = cfg.dim, cfg.num_layers
    mid = (cfg.dim + cfg.out_dim) // 2
    keys = iter(jax.random.split(rng, 16))

    def stacked_lin(d_in, d_out):
        ks = jax.random.split(next(keys), L)
        return jax.vmap(lambda k: nn.init_linear(k, d_in, d_out, "xavier",
                                                 dtype=dtype))(ks)

    def ln1():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    def lnL():
        return {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)}

    emb = lambda nrows: 0.02 * jax.random.normal(next(keys), (nrows, d), dtype)
    return {
        "token_embedding": emb(cfg.vocab_size),
        "type_embedding": emb(cfg.type_size),
        "pos_embedding": emb(cfg.max_seq_len),
        "norm": ln1(),
        "layers": {
            "q": stacked_lin(d, d), "k": stacked_lin(d, d),
            "v": stacked_lin(d, d), "o": stacked_lin(d, d),
            "norm1": lnL(),
            "fc1": stacked_lin(d, 4 * d), "fc2": stacked_lin(4 * d, d),
            "norm2": lnL(),
        },
        "head": {
            "fc1": nn.init_linear(next(keys), d, mid, "xavier", bias=False,
                                  dtype=dtype),
            "fc2": nn.init_linear(next(keys), mid, cfg.out_dim, "xavier",
                                  bias=False, dtype=dtype),
        },
    }


def clip_text_params_from_torch(sd: dict,
                                cfg: CLIPTextConfig = CLIPTextConfig(),
                                dtype=jnp.bfloat16) -> dict:
    """XLMRobertaCLIP state_dict `textual.*` keys -> text-branch pytree."""

    def a(key):
        t = sd[key]
        return t.float().cpu().numpy() if hasattr(t, "float") else np.asarray(t)

    L = cfg.num_layers

    def stack_linear(fmt, bias=True):
        w = np.stack([a(fmt.format(i) + ".weight") for i in range(L)])
        p = {"kernel": jnp.asarray(w.transpose(0, 2, 1), dtype)}
        if bias:
            p["bias"] = jnp.asarray(
                np.stack([a(fmt.format(i) + ".bias") for i in range(L)]), dtype)
        return p

    def stack_ln(fmt):
        return {"scale": jnp.asarray(
                    np.stack([a(fmt.format(i) + ".weight") for i in range(L)]), dtype),
                "bias": jnp.asarray(
                    np.stack([a(fmt.format(i) + ".bias") for i in range(L)]), dtype)}

    def lin(prefix, bias=True):
        p = {"kernel": jnp.asarray(a(prefix + ".weight").T, dtype)}
        if bias:
            p["bias"] = jnp.asarray(a(prefix + ".bias"), dtype)
        return p

    return {
        "token_embedding": jnp.asarray(a("textual.token_embedding.weight"), dtype),
        "type_embedding": jnp.asarray(a("textual.type_embedding.weight"), dtype),
        "pos_embedding": jnp.asarray(a("textual.pos_embedding.weight"), dtype),
        "norm": {"scale": jnp.asarray(a("textual.norm.weight"), dtype),
                 "bias": jnp.asarray(a("textual.norm.bias"), dtype)},
        "layers": {
            "q": stack_linear("textual.blocks.{}.attn.q"),
            "k": stack_linear("textual.blocks.{}.attn.k"),
            "v": stack_linear("textual.blocks.{}.attn.v"),
            "o": stack_linear("textual.blocks.{}.attn.o"),
            "norm1": stack_ln("textual.blocks.{}.norm1"),
            "fc1": stack_linear("textual.blocks.{}.ffn.0"),
            "fc2": stack_linear("textual.blocks.{}.ffn.2"),
            "norm2": stack_ln("textual.blocks.{}.norm2"),
        },
        "head": {
            "fc1": lin("textual.head.0", bias=False),
            "fc2": lin("textual.head.2", bias=False),
        },
    }
