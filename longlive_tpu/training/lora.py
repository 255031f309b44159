"""LoRA adapters for training (reference utils/lora_utils.py:19-103,
trainer/distillation.py:147-297, 1398-1456).

The reference wraps every nn.Linear inside the transformer blocks with PEFT
LoRA (rank/alpha 256 in shipped configs, applied to generator and critic —
longlive_train_long.yaml adapter section).  Here adapters are a separate
pytree over the stacked block linears; ``attach_lora`` embeds them into the
params tree and ``models.nn.linear`` applies

    W = W0 + (alpha/rank) * A @ B

one LAYER at a time inside the scanned body (the PEFT execution model —
no full merged model ever materializes), so autodiff yields adapter
gradients and the optimizer runs over the adapter tree only.  PEFT init:
A ~ kaiming-uniform, B = 0 (delta starts at zero).  ``merge_lora`` (full
materialized merge) remains for host-side one-offs (EMA visualization
fold, checkpoint export).

Inference folds adapters into the base weights instead
(utils/checkpoint.fold_lora_into_dit_sd).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

LORA_TARGET_GROUPS = ("self_attn", "cross_attn", "ffn")
_LINEAR_NAMES = {"q", "k", "v", "o", "fc1", "fc2"}


def init_lora(rng: jax.Array, params: dict, rank: int = 256,
              dtype=jnp.float32) -> dict:
    """Adapter tree mirroring params['blocks'] linears: each gets
    {'a': [L, d_in, r], 'b': [L, r, d_out]}."""
    lora = {}
    keys = iter(jax.random.split(rng, 64))
    for group in LORA_TARGET_GROUPS:
        gp = params["blocks"].get(group)
        if gp is None:
            continue
        lg = {}
        for name, p in gp.items():
            if name not in _LINEAR_NAMES or "kernel" not in p:
                continue
            L, d_in, d_out = p["kernel"].shape
            bound = 1.0 / math.sqrt(d_in)  # kaiming-uniform fan_in
            lg[name] = {
                "a": jax.random.uniform(next(keys), (L, d_in, rank), dtype,
                                        -bound, bound),
                "b": jnp.zeros((L, rank, d_out), dtype),
            }
        lora[group] = lg
    return lora


def attach_lora(params: dict, lora: dict, alpha_over_rank: float = 1.0) -> dict:
    """Embed adapters into the params tree WITHOUT materializing merged
    weights: each targeted linear gains ``lora_a``/``lora_b``/``lora_s``
    leaves (stacked [L, ...] like the kernels, so the layer scan slices
    them per layer) and ``models.nn.linear`` applies the delta inside the
    scanned layer body.  This is the PEFT execution model of the reference
    (every block nn.Linear wrapped, trainer/distillation.py:1398-1456):
    peak weight residency stays at the bases + adapters — a full merged
    1.3B copy for generator AND critic alongside their bases and the
    teacher (5x1.3B) cannot fit a 16 GB chip.  Differentiable wrt
    ``lora`` (the embedded leaves ARE the adapter arrays; no copies)."""
    blocks = dict(params["blocks"])
    for group, lg in lora.items():
        gp = dict(blocks[group])
        for name, ab in lg.items():
            base = gp[name]
            L = base["kernel"].shape[0]
            gp[name] = {**base, "lora_a": ab["a"], "lora_b": ab["b"],
                        "lora_s": jnp.full((L,), alpha_over_rank, jnp.float32)}
        blocks[group] = gp
    return {**params, "blocks": blocks}


def merge_lora(params: dict, lora: dict, alpha_over_rank: float = 1.0) -> dict:
    """W = W0 + scale * A@B over the stacked block linears; everything else
    passes through untouched.  Differentiable wrt ``lora``."""
    blocks = dict(params["blocks"])
    for group, lg in lora.items():
        gp = dict(blocks[group])
        for name, ab in lg.items():
            base = gp[name]
            delta = jnp.einsum(
                "lir,lro->lio", ab["a"], ab["b"],
                preferred_element_type=jnp.float32,
            ) * alpha_over_rank
            kernel = (base["kernel"].astype(jnp.float32) + delta).astype(
                base["kernel"].dtype)
            gp[name] = {**base, "kernel": kernel}
        blocks[group] = gp
    return {**params, "blocks": blocks}


def lora_params_count(lora: dict) -> int:
    return sum(x.size for x in jax.tree.leaves(lora))
