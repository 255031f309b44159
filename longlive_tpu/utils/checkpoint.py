"""Checkpoint ingestion: PyTorch state_dicts -> JAX parameter pytrees.

Covers the released artifact formats the reference loads
(inference.py:72-130):
- Wan2.1-T2V-1.3B DiT (``CausalWanModel``/``WanModel`` state_dict),
- Wan2.1_VAE.pth (``WanVAE_`` state_dict),
- umT5-xxl encoder (``T5Encoder`` state_dict),
- LongLive generator checkpoints (``{'generator': sd}`` / ``{'generator_ema':
  sd}`` / raw sd, with ``_fsdp_wrapped_module.`` key cleaning,
  inference.py:81-94) and PEFT LoRA adapters (rank-256, folded into the base
  weights at load so inference needs no adapter runtime,
  utils/lora_utils.py:19-103).

All outputs are numpy/jnp pytrees matching ``models.dit.init_dit_params`` /
``models.vae.init_vae_params`` / ``models.t5.init_t5_params`` layouts.
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from ..config import DiTConfig
from ..models.vae import VAEConfig


def _np(t) -> np.ndarray:
    """torch tensor -> numpy (handles bf16 via float32 round-trip)."""
    import torch

    if isinstance(t, np.ndarray):
        return t
    t = t.detach().cpu()
    if t.dtype == torch.bfloat16:
        t = t.float()
    return t.numpy()


def clean_state_dict_keys(sd: dict) -> dict:
    """Strips FSDP wrapper prefixes (reference inference.py:81-87) and
    ``model.`` / ``module.`` prefixes."""
    out = {}
    for k, v in sd.items():
        k = k.replace("_fsdp_wrapped_module.", "")
        k = re.sub(r"^(module\.)", "", k)
        out[k] = v
    return out


def unwrap_generator_checkpoint(ckpt: dict, use_ema: bool = False) -> dict:
    """Handles the {'generator'|'generator_ema'|'model': sd} layouts
    (inference.py:72-94)."""
    for key in (["generator_ema", "generator"] if use_ema else ["generator", "model"]):
        if key in ckpt and isinstance(ckpt[key], dict):
            return clean_state_dict_keys(ckpt[key])
    return clean_state_dict_keys(ckpt)


def _linear(sd, prefix, dtype):
    p = {"kernel": jnp.asarray(_np(sd[f"{prefix}.weight"]).T, dtype)}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[f"{prefix}.bias"]), dtype)
    return p


def _stack_linear(sd, fmt, num_layers, dtype):
    ws = np.stack([_np(sd[fmt.format(i) + ".weight"]).T for i in range(num_layers)])
    p = {"kernel": jnp.asarray(ws, dtype)}
    if fmt.format(0) + ".bias" in sd:
        bs = np.stack([_np(sd[fmt.format(i) + ".bias"]) for i in range(num_layers)])
        p["bias"] = jnp.asarray(bs, dtype)
    return p


def dit_params_from_torch(
    sd: dict, cfg: DiTConfig = DiTConfig(), dtype=jnp.bfloat16
) -> dict:
    """CausalWanModel/WanModel state_dict -> models.dit params pytree."""
    sd = clean_state_dict_keys(sd)
    L = cfg.num_layers

    def stacked_attn(which):
        p = {
            "q": _stack_linear(sd, f"blocks.{{}}.{which}.q", L, dtype),
            "k": _stack_linear(sd, f"blocks.{{}}.{which}.k", L, dtype),
            "v": _stack_linear(sd, f"blocks.{{}}.{which}.v", L, dtype),
            "o": _stack_linear(sd, f"blocks.{{}}.{which}.o", L, dtype),
        }
        if cfg.qk_norm:
            p["norm_q"] = {"scale": jnp.asarray(
                np.stack([_np(sd[f"blocks.{i}.{which}.norm_q.weight"]) for i in range(L)]),
                dtype)}
            p["norm_k"] = {"scale": jnp.asarray(
                np.stack([_np(sd[f"blocks.{i}.{which}.norm_k.weight"]) for i in range(L)]),
                dtype)}
        return p

    pe_w = _np(sd["patch_embedding.weight"])  # [dim, in, pt, ph, pw]
    cross = stacked_attn("cross_attn")
    if cfg.model_type == "i2v":
        # WanI2VCrossAttention extras (model.py:234-237)
        cross["k_img"] = _stack_linear(sd, "blocks.{}.cross_attn.k_img", L, dtype)
        cross["v_img"] = _stack_linear(sd, "blocks.{}.cross_attn.v_img", L, dtype)
        if cfg.qk_norm:
            cross["norm_k_img"] = {"scale": jnp.asarray(
                np.stack([_np(sd[f"blocks.{i}.cross_attn.norm_k_img.weight"])
                          for i in range(L)]), dtype)}
    blocks = {
        "self_attn": stacked_attn("self_attn"),
        "cross_attn": cross,
        "ffn": {
            "fc1": _stack_linear(sd, "blocks.{}.ffn.0", L, dtype),
            "fc2": _stack_linear(sd, "blocks.{}.ffn.2", L, dtype),
        },
        "modulation": jnp.asarray(
            np.stack([_np(sd[f"blocks.{i}.modulation"])[0] for i in range(L)]), dtype
        ),
    }
    if cfg.cross_attn_norm:
        blocks["norm3"] = {
            "scale": jnp.asarray(
                np.stack([_np(sd[f"blocks.{i}.norm3.weight"]) for i in range(L)]), dtype),
            "bias": jnp.asarray(
                np.stack([_np(sd[f"blocks.{i}.norm3.bias"]) for i in range(L)]), dtype),
        }

    extra = {}
    if cfg.model_type == "i2v":
        # MLPProj img_emb: Sequential(LN, Linear, GELU, Linear, LN)
        # (model.py:469-482, 615-616)
        extra["img_emb"] = {
            "ln1": {"scale": jnp.asarray(_np(sd["img_emb.proj.0.weight"]), dtype),
                    "bias": jnp.asarray(_np(sd["img_emb.proj.0.bias"]), dtype)},
            "fc1": _linear(sd, "img_emb.proj.1", dtype),
            "fc2": _linear(sd, "img_emb.proj.3", dtype),
            "ln2": {"scale": jnp.asarray(_np(sd["img_emb.proj.4.weight"]), dtype),
                    "bias": jnp.asarray(_np(sd["img_emb.proj.4.bias"]), dtype)},
        }

    from ..models.dit import canonicalize_rope_layout

    return canonicalize_rope_layout(extra | {
        "patch_embedding": {
            "kernel": jnp.asarray(pe_w.reshape(cfg.dim, -1).T, dtype),
            "bias": jnp.asarray(_np(sd["patch_embedding.bias"]), dtype),
        },
        "text_embedding": {
            "fc1": _linear(sd, "text_embedding.0", dtype),
            "fc2": _linear(sd, "text_embedding.2", dtype),
        },
        "time_embedding": {
            "fc1": _linear(sd, "time_embedding.0", dtype),
            "fc2": _linear(sd, "time_embedding.2", dtype),
        },
        "time_projection": {"fc": _linear(sd, "time_projection.1", dtype)},
        "blocks": blocks,
        "head": {
            "head": _linear(sd, "head.head", dtype),
            "modulation": jnp.asarray(_np(sd["head.modulation"])[0], dtype),
        },
    }, cfg)


_PEFT_NAME = {"fc1": "ffn.0", "fc2": "ffn.2"}  # reference Sequential indices


def lora_to_peft_sd(lora: dict, cfg: DiTConfig,
                    prefix: str = "base_model.model.") -> dict:
    """Our stacked adapter tree (training.lora.init_lora layout:
    {group: {name: {a [L, d_in, r], b [L, r, d_out]}}}) -> reference PEFT
    LoRA state dict (numpy values; keys
    ``{prefix}blocks.{i}.{group}.{name}.lora_{A,B}.weight`` with torch
    layouts A [r, d_in], B [d_out, r]) — so adapters trained here can be
    stacked onto reference checkpoints (inference.py:96-130) or fed back
    through fold_lora_into_dit_sd.

    Under ``cfg.rope_layout == 'halfsplit'`` the self-attn q/k adapters were
    trained in the permuted channel basis; their B output axis is mapped
    back to the reference's interleaved basis here (and forward-mapped in
    :func:`peft_sd_to_lora`), so the exported delta composes with
    UNpermuted reference weights exactly."""
    from ..ops.rope import halfsplit_qk_perm

    g = halfsplit_qk_perm(cfg.head_dim, cfg.num_heads)
    ginv = np.argsort(g)
    out = {}
    for group, lg in lora.items():
        for name, ab in lg.items():
            a = np.asarray(ab["a"], np.float32)  # [L, d_in, r]
            b = np.asarray(ab["b"], np.float32)  # [L, r, d_out]
            if (cfg.rope_layout == "halfsplit" and group == "self_attn"
                    and name in ("q", "k")):
                # ours[:, :, j] corresponds to ref column g[j]
                b = b[:, :, ginv]
            ref_name = _PEFT_NAME.get(name, f"{group}.{name}")
            for i in range(a.shape[0]):
                base = f"{prefix}blocks.{i}.{ref_name}"
                out[f"{base}.lora_A.weight"] = a[i].T.copy()  # [r, d_in]
                out[f"{base}.lora_B.weight"] = b[i].T.copy()  # [d_out, r]
    return out


def peft_sd_to_lora(lora_sd: dict, cfg: DiTConfig) -> dict:
    """Inverse of :func:`lora_to_peft_sd`: reference PEFT LoRA state dict ->
    our stacked adapter tree (for continued training of released adapters).
    Accepts the reference's ``.default`` PEFT key variant."""
    import re as _re

    from ..ops.rope import halfsplit_qk_perm

    lora_sd = clean_state_dict_keys(lora_sd)
    g = halfsplit_qk_perm(cfg.head_dim, cfg.num_heads)
    pat = _re.compile(
        r"(?:base_model\.(?:model\.)*)?blocks\.(\d+)\.(.+)\.lora_A"
        r"(?:\.default)?\.weight$")
    names = {"ffn.0": ("ffn", "fc1"), "ffn.2": ("ffn", "fc2")}
    acc = {}
    for k, a in lora_sd.items():
        m = pat.match(k)
        if not m:
            continue
        i, ref_name = int(m.group(1)), m.group(2)
        if ref_name in names:
            group, name = names[ref_name]
        else:
            group, name = ref_name.rsplit(".", 1)
        b = lora_sd[k.replace("lora_A", "lora_B")]
        acc.setdefault((group, name), {})[i] = (_np(a), _np(b))
    lora = {}
    for (group, name), per_layer in sorted(acc.items()):
        a = np.stack([per_layer[i][0].T for i in sorted(per_layer)])  # [L,d_in,r]
        b = np.stack([per_layer[i][1].T for i in sorted(per_layer)])  # [L,r,d_out]
        if (cfg.rope_layout == "halfsplit" and group == "self_attn"
                and name in ("q", "k")):
            b = b[:, :, g]
        lora.setdefault(group, {})[name] = {
            "a": jnp.asarray(a, jnp.float32), "b": jnp.asarray(b, jnp.float32)}
    return lora


def fold_lora_into_dit_sd(sd: dict, lora_sd: dict, alpha_over_rank: float = 1.0) -> dict:
    """Folds PEFT LoRA weights into base linears: W += (alpha/r) * B @ A
    (reference stacks base + adapter at inference, inference.py:96-130;
    adapter config rank=alpha=256 -> scale 1.0,
    configs/longlive_inference.yaml:33-39)."""
    import torch

    sd = dict(clean_state_dict_keys(sd))
    lora_sd = clean_state_dict_keys(lora_sd)
    pat = re.compile(r"(.+)\.lora_A(?:\.default)?\.weight$")
    for k, a in lora_sd.items():
        m = pat.match(k)
        if not m:
            continue
        base = m.group(1)
        base = re.sub(r"^base_model\.(model\.)*", "", base)
        b_key = k.replace("lora_A", "lora_B")
        b = lora_sd[b_key]
        w_key = f"{base}.weight"
        if w_key not in sd:
            raise KeyError(f"LoRA target {w_key} not in base state_dict")
        delta = (torch.as_tensor(b).float() @ torch.as_tensor(a).float()) * alpha_over_rank
        sd[w_key] = torch.as_tensor(_np(sd[w_key])).float() + delta
    return sd


# ---------------------------------------------------------------------------
# VAE


def _conv(sd, prefix, dtype):
    p = {"w": jnp.asarray(_np(sd[f"{prefix}.weight"]), dtype)}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]), dtype)
    return p


def _gamma(sd, key, dtype):
    return jnp.asarray(_np(sd[key]).reshape(-1), dtype)


def _res_block_from_torch(sd, prefix, dtype):
    p = {
        "norm1": _gamma(sd, f"{prefix}.residual.0.gamma", dtype),
        "conv1": _conv(sd, f"{prefix}.residual.2", dtype),
        "norm2": _gamma(sd, f"{prefix}.residual.3.gamma", dtype),
        "conv2": _conv(sd, f"{prefix}.residual.6", dtype),
        "shortcut": None,
    }
    if f"{prefix}.shortcut.weight" in sd:
        p["shortcut"] = _conv(sd, f"{prefix}.shortcut", dtype)
    return p


def _attn_block_from_torch(sd, prefix, dtype):
    return {
        "norm": _gamma(sd, f"{prefix}.norm.gamma", dtype),
        "qkv": _conv(sd, f"{prefix}.to_qkv", dtype),
        "proj": _conv(sd, f"{prefix}.proj", dtype),
    }


def _resample_from_torch(sd, prefix, dtype):
    p = {"conv": _conv(sd, f"{prefix}.resample.1", dtype)}
    if f"{prefix}.time_conv.weight" in sd:
        p["time_conv"] = _conv(sd, f"{prefix}.time_conv", dtype)
    return p


def vae_params_from_torch(
    sd: dict, cfg: VAEConfig = VAEConfig(), dtype=jnp.float32
) -> dict:
    """WanVAE_ state_dict (vae.py:483-636) -> models.vae params pytree."""
    from ..models.vae import WAN_LATENT_MEAN, WAN_LATENT_STD

    sd = clean_state_dict_keys(sd)
    n_stages = len(cfg.dim_mult)

    # encoder downsamples: [res x num_res_blocks, resample?] per stage
    downs, idx = [], 0
    for i in range(n_stages):
        for _ in range(cfg.num_res_blocks):
            downs.append(_res_block_from_torch(sd, f"encoder.downsamples.{idx}", dtype))
            idx += 1
        if i != n_stages - 1:
            downs.append(_resample_from_torch(sd, f"encoder.downsamples.{idx}", dtype))
            idx += 1

    ups, idx = [], 0
    for i in range(n_stages):
        for _ in range(cfg.num_res_blocks + 1):
            ups.append(_res_block_from_torch(sd, f"decoder.upsamples.{idx}", dtype))
            idx += 1
        if i != n_stages - 1:
            ups.append(_resample_from_torch(sd, f"decoder.upsamples.{idx}", dtype))
            idx += 1

    return {
        "encoder": {
            "conv1": _conv(sd, "encoder.conv1", dtype),
            "downsamples": downs,
            "middle": [
                _res_block_from_torch(sd, "encoder.middle.0", dtype),
                _attn_block_from_torch(sd, "encoder.middle.1", dtype),
                _res_block_from_torch(sd, "encoder.middle.2", dtype),
            ],
            "head_norm": _gamma(sd, "encoder.head.0.gamma", dtype),
            "head_conv": _conv(sd, "encoder.head.2", dtype),
        },
        "decoder": {
            "conv1": _conv(sd, "decoder.conv1", dtype),
            "middle": [
                _res_block_from_torch(sd, "decoder.middle.0", dtype),
                _attn_block_from_torch(sd, "decoder.middle.1", dtype),
                _res_block_from_torch(sd, "decoder.middle.2", dtype),
            ],
            "upsamples": ups,
            "head_norm": _gamma(sd, "decoder.head.0.gamma", dtype),
            "head_conv": _conv(sd, "decoder.head.2", dtype),
        },
        "conv1": _conv(sd, "conv1", dtype),
        "conv2": _conv(sd, "conv2", dtype),
        "mean": jnp.asarray(WAN_LATENT_MEAN[: cfg.z_dim], jnp.float32),
        "std": jnp.asarray(WAN_LATENT_STD[: cfg.z_dim], jnp.float32),
    }
