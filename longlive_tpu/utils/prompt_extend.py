"""Prompt extension interface.

The reference vendors Qwen/DashScope prompt rewriting
(wan/utils/prompt_extend.py) for the vanilla-Wan path; LongLive's shipped
pipelines instead read pre-extended prompts from disk
(`extended_prompt_path`, utils/dataset.py:15-38).  This module keeps the
*interface*: a pluggable rewriter with an identity default and a
local-HF-model hook, so extended prompts can be produced online when a
rewriter model is available (no network access is assumed).
"""

from __future__ import annotations

from typing import Callable, Optional

PromptRewriter = Callable[[str], str]

_SYSTEM_HINT = (
    "Rewrite the prompt into a detailed video description covering subject, "
    "motion, scene, lighting and camera, preserving the original meaning."
)


def identity_rewriter(prompt: str) -> str:
    return prompt


def hf_rewriter(model_path: str, max_new_tokens: int = 256) -> PromptRewriter:
    """Builds a rewriter from a local HF causal LM checkpoint (the Qwen
    analogue of the reference's QwenPromptExpander)."""
    from transformers import AutoModelForCausalLM, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_path)
    model = AutoModelForCausalLM.from_pretrained(model_path)

    def rewrite(prompt: str) -> str:
        text = f"{_SYSTEM_HINT}\n\nPrompt: {prompt}\n\nExtended:"
        ids = tok(text, return_tensors="pt")
        out = model.generate(**ids, max_new_tokens=max_new_tokens, do_sample=False)
        return tok.decode(out[0][ids["input_ids"].shape[1]:],
                          skip_special_tokens=True).strip()

    return rewrite


def get_rewriter(kind: str = "identity", **kwargs) -> PromptRewriter:
    if kind == "identity":
        return identity_rewriter
    if kind == "hf":
        return hf_rewriter(**kwargs)
    raise ValueError(f"unknown prompt rewriter {kind!r}")
