"""umT5 encoder (text conditioning), TPU-native functional implementation.

Re-implements the reference T5Encoder (wan/modules/t5.py:267-312) used as
``umt5_xxl(encoder_only=True)`` (t5.py:456-469): 24 layers, dim 4096,
ffn 10240, 64 heads, vocab 256384, **per-layer** bidirectional relative
position embeddings (shared_pos=False), gated-GELU feed-forward, unscaled
attention (T5 omits the 1/sqrt(d) factor, t5.py:111-112).

Layers run under lax.scan with stacked parameters.  The relative-position
bucket matrix depends only on sequence length, so it is computed once and
every layer just gathers its own embedding table.

The ``WanTextEncoder`` semantics (utils/wan_wrapper.py:16-57): tokenize to a
fixed 512 window, encode, then zero out embeddings past each prompt's length
— downstream cross-attention runs unmasked over the zero-padded context.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import nn


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    max_dist: int = 128
    eps: float = 1e-6
    text_len: int = 512

    @property
    def head_dim(self) -> int:
        return self.dim_attn // self.num_heads


def tiny_t5_config() -> T5Config:
    # max_dist stays 128: the reference hardcodes it (t5.py:223)
    return T5Config(vocab_size=128, dim=32, dim_attn=32, dim_ffn=48,
                    num_heads=4, num_layers=2, num_buckets=8, text_len=16)


def relative_position_buckets(
    lq: int, lk: int, num_buckets: int, max_dist: int
) -> jax.Array:
    """Bidirectional bucket ids [lq, lk] (t5.py:245-264)."""
    rel = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) / math.log(max_dist / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(rel < max_exact, rel, large)
    return jnp.asarray(buckets, jnp.int32)


def t5_layer_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """T5LayerNorm: rms-only, fp32 accumulation (t5.py:53-66)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (weight.astype(jnp.float32) * y).astype(x.dtype)


def init_t5_params(rng: jax.Array, cfg: T5Config, dtype=jnp.float32) -> dict:
    """Random init matching reference init_weights (t5.py:27-43)."""
    L, d, da, dff = cfg.num_layers, cfg.dim, cfg.dim_attn, cfg.dim_ffn
    keys = iter(jax.random.split(rng, 16))

    def stack(shape, std):
        return jax.random.normal(next(keys), (L,) + shape, dtype) * std

    return {
        "token_embedding": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype),
        "blocks": {
            "norm1": jnp.ones((L, d), dtype),
            "attn": {
                "q": stack((d, da), (d * cfg.head_dim) ** -0.5),
                "k": stack((d, da), d**-0.5),
                "v": stack((d, da), d**-0.5),
                "o": stack((da, d), (cfg.num_heads * cfg.head_dim) ** -0.5),
            },
            "pos_emb": stack((cfg.num_buckets, cfg.num_heads),
                             (2 * cfg.num_buckets * cfg.num_heads) ** -0.5),
            "norm2": jnp.ones((L, d), dtype),
            "ffn": {
                "gate": stack((d, dff), d**-0.5),
                "fc1": stack((d, dff), d**-0.5),
                "fc2": stack((dff, d), dff**-0.5),
            },
        },
        "norm": jnp.ones((d,), dtype),
    }


def t5_encode(
    params: dict, cfg: T5Config, ids: jax.Array, mask: jax.Array
) -> jax.Array:
    """ids, mask: [B, L] int32 -> features [B, L, dim].

    Matches T5Encoder.forward (t5.py:303-312) with eval-mode dropout.
    """
    b, l = ids.shape
    x = params["token_embedding"][ids]
    buckets = relative_position_buckets(l, l, cfg.num_buckets, cfg.max_dist)
    # additive key mask (t5.py:102-109): -inf where mask == 0
    key_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30).astype(jnp.float32)

    def block(x, layer_p):
        return _t5_block(cfg, x, layer_p, buckets, key_bias), None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    return t5_layer_norm(x, params["norm"], cfg.eps)


def _t5_block(cfg: T5Config, x, layer_p, buckets, key_bias):
    """One encoder layer (t5.py:102-133): per-layer rel-pos bias, unscaled
    attention (no 1/sqrt(d), t5.py:111-112), fp32 softmax, gated-gelu FFN."""
    b, l = x.shape[:2]
    n, hd = cfg.num_heads, cfg.head_dim
    pos_bias = layer_p["pos_emb"][buckets]  # [L, L, n]
    pos_bias = pos_bias.transpose(2, 0, 1)[None]  # [1, n, L, L]
    h = t5_layer_norm(x, layer_p["norm1"], cfg.eps)
    q = jnp.dot(h, layer_p["attn"]["q"], preferred_element_type=jnp.float32)
    k = jnp.dot(h, layer_p["attn"]["k"], preferred_element_type=jnp.float32)
    v = jnp.dot(h, layer_p["attn"]["v"], preferred_element_type=jnp.float32).astype(x.dtype)
    q = q.reshape(b, l, n, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, l, n, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, l, n, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits + pos_bias.astype(jnp.float32) + key_bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bnqk,bnkd->bnqd", probs, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, l, n * hd)
    x = x + jnp.dot(o, layer_p["attn"]["o"],
                    preferred_element_type=jnp.float32).astype(x.dtype)

    h = t5_layer_norm(x, layer_p["norm2"], cfg.eps)
    gate = nn.gelu_tanh(jnp.dot(h, layer_p["ffn"]["gate"],
                                preferred_element_type=jnp.float32).astype(x.dtype))
    ff = jnp.dot(h, layer_p["ffn"]["fc1"],
                 preferred_element_type=jnp.float32).astype(x.dtype) * gate
    x = x + jnp.dot(ff, layer_p["ffn"]["fc2"],
                    preferred_element_type=jnp.float32).astype(x.dtype)
    return x


# module-level jit identity for the streamed path: compiles once per
# (config, shape), not once per encode call
_t5_block_jit = jax.jit(_t5_block, static_argnums=(0,))


def t5_encode_streamed(
    params: dict, cfg: T5Config, ids: jax.Array, mask: jax.Array
) -> jax.Array:
    """Per-layer weight-streamed encode — the TPU-native analogue of the
    reference's ``DynamicSwapInstaller`` (utils/memory.py:13-58), which
    streams individual submodule weights to the GPU on ``__getattr__`` in
    <40 GB mode (inference.py:62,135-136).

    ``params`` leaves live on the HOST (numpy arrays, or pinned-host jax
    arrays); each of the ``num_layers`` layer trees is transferred to the
    device only for the duration of its own forward, so HBM high-water is
    one umT5 layer (~0.4 GB) + activations instead of the full 11 GB
    encoder.  The embedding lookup gathers the needed rows on the host.
    Numerics are identical to ``t5_encode`` (same jitted block body).
    """
    import numpy as np

    def _host(a):
        return a if isinstance(a, np.ndarray) else np.asarray(a)

    ids_h = np.asarray(ids)
    x = jnp.asarray(_host(params["token_embedding"])[ids_h])
    l = ids_h.shape[1]
    buckets = relative_position_buckets(l, l, cfg.num_buckets, cfg.max_dist)
    key_bias = jnp.where(jnp.asarray(mask)[:, None, None, :] > 0, 0.0,
                         -1e30).astype(jnp.float32)

    # module-level jit identity: a per-call jax.jit(partial(...)) would
    # own a fresh compile cache each encode, re-compiling the umT5 block
    # for every prompt in low_memory mode
    block_jit = _t5_block_jit
    blocks = params["blocks"]
    num_layers = len(_host(jax.tree.leaves(blocks)[0]))
    for i in range(num_layers):
        layer_host = jax.tree.map(lambda a: _host(a)[i], blocks)
        layer_dev = jax.tree.map(jnp.asarray, layer_host)  # host -> HBM
        x = block_jit(cfg, x, layer_dev, buckets, key_bias)
        del layer_dev  # freed before the next layer streams in
    return t5_layer_norm(x, jnp.asarray(_host(params["norm"])), cfg.eps)


def encode_prompts(
    params: dict, cfg: T5Config, ids: jax.Array, mask: jax.Array
) -> jax.Array:
    """WanTextEncoder.forward semantics (utils/wan_wrapper.py:43-57): encode
    the fixed-length window, then zero features past each prompt length."""
    feats = t5_encode(params, cfg, ids, mask)
    return feats * (mask > 0)[..., None].astype(feats.dtype)


# ---------------------------------------------------------------------------
# torch -> jax conversion (umt5-xxl encoder state_dict, t5.py:267-312)


def t5_params_from_torch(sd: dict, cfg: T5Config, dtype=jnp.bfloat16) -> dict:
    from ..utils.checkpoint import _np, clean_state_dict_keys

    sd = clean_state_dict_keys(sd)
    L = cfg.num_layers

    def stack_t(fmt):
        return jnp.asarray(np.stack([_np(sd[fmt.format(i)]).T for i in range(L)]), dtype)

    def stack(fmt):
        return jnp.asarray(np.stack([_np(sd[fmt.format(i)]) for i in range(L)]), dtype)

    return {
        "token_embedding": jnp.asarray(_np(sd["token_embedding.weight"]), dtype),
        "blocks": {
            "norm1": stack("blocks.{}.norm1.weight"),
            "attn": {
                "q": stack_t("blocks.{}.attn.q.weight"),
                "k": stack_t("blocks.{}.attn.k.weight"),
                "v": stack_t("blocks.{}.attn.v.weight"),
                "o": stack_t("blocks.{}.attn.o.weight"),
            },
            "pos_emb": stack("blocks.{}.pos_embedding.embedding.weight"),
            "norm2": stack("blocks.{}.norm2.weight"),
            "ffn": {
                "gate": stack_t("blocks.{}.ffn.gate.0.weight"),
                "fc1": stack_t("blocks.{}.ffn.fc1.weight"),
                "fc2": stack_t("blocks.{}.ffn.fc2.weight"),
            },
        },
        "norm": jnp.asarray(_np(sd["norm.weight"]), dtype),
    }


class T5TextEncoder:
    """Tokenizer + encoder façade mirroring WanTextEncoder
    (utils/wan_wrapper.py:16-57).  The tokenizer requires local HF assets
    (google/umt5-xxl); absent assets raise at construction, matching the
    reference's dependence on a downloaded ``wan_models`` directory."""

    def __init__(self, params: dict, cfg: T5Config = T5Config(),
                 tokenizer_path: Optional[str] = None,
                 low_memory: bool = False):
        """``low_memory=True`` keeps the encoder weights on the HOST and
        streams one layer at a time to the device per encode — the
        reference's DynamicSwapInstaller <40 GB mode
        (utils/memory.py:13-58, inference.py:62,135-136)."""
        self.cfg = cfg
        self.low_memory = low_memory
        if low_memory:
            self.params = jax.tree.map(np.asarray, params)

            def _stream_encode(p, i, m):
                feats = t5_encode_streamed(p, cfg, i, m)
                return feats * (jnp.asarray(m) > 0)[..., None].astype(feats.dtype)

            self._encode = _stream_encode
        else:
            self.params = params
            self._encode = jax.jit(lambda p, i, m: encode_prompts(p, cfg, i, m))
        self.tokenizer = None
        if tokenizer_path is not None:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_path)

    def __call__(self, text_prompts: List[str]) -> dict:
        assert self.tokenizer is not None, "tokenizer assets required"
        enc = self.tokenizer(
            text_prompts, padding="max_length", truncation=True,
            max_length=self.cfg.text_len, return_tensors="np",
            add_special_tokens=True,
        )
        ids = jnp.asarray(enc["input_ids"], jnp.int32)
        mask = jnp.asarray(enc["attention_mask"], jnp.int32)
        return {"prompt_embeds": self._encode(self.params, ids, mask)}
