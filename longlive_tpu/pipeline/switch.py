"""Single-switch generation pipeline.

The reference ``SwitchCausalInferencePipeline`` is unusable as written
(undefined names crash `_recache_after_switch`,
switch_causal_inference.py:76,83,180 — see SURVEY.md "known reference bugs");
its *intent* — one prompt switch at a fixed frame, used for training-time
visualization (trainer/distillation.py:1462-1551) — is realized here as the
single-switch special case of the interactive pipeline.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..models import dit as D
from .interactive import InteractiveCausalInferencePipeline


class SwitchCausalInferencePipeline(InteractiveCausalInferencePipeline):
    def generate_latents_switch(
        self,
        noise: jax.Array,
        cross_first: D.CrossKV,
        cross_second: D.CrossKV,
        switch_frame_index: int,
        rng: Optional[jax.Array] = None,
        profile: bool = False,
    ) -> jax.Array:
        return self.generate_latents_interactive(
            noise, [cross_first, cross_second], [switch_frame_index],
            rng=rng, profile=profile,
        )
