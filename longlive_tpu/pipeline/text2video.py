"""Bidirectional text-to-video sampler — the vanilla Wan2.1 T2V path.

TPU-native re-design of ``WanT2V`` (reference wan/text2video.py:26-266):
a 50-step UniPC / DPM-Solver++ classifier-free-guidance sampler over the
full (non-causal) WanModel.  Differences from the reference, by design:

- the cond and uncond (negative-prompt) forwards are batched into ONE
  model call per step (the reference runs them sequentially,
  text2video.py:236-239) — on the MXU a 2x batch is nearly free;
- the whole sampler is a single `lax.scan` (`ops.solvers.sample_flow`)
  over host-precomputed solver coefficients: one compiled program per
  video shape, zero per-step host work;
- noise is drawn from a JAX PRNG key instead of a device generator.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import DiTConfig
from ..models.dit import CrossKV, prepare_cross_kv
from ..models.dit_bidirectional import bidirectional_forward
from ..ops import solvers as SV
from ..ops.rope import make_rope_tables

# The default negative prompt baked into the Wan configs
# (wan/configs/shared_config.py `sample_neg_prompt`).
DEFAULT_NEGATIVE_PROMPT = (
    "色调艳丽，过曝，静态，细节模糊不清，字幕，风格，作品，画作，画面，静止，整体发灰，最差质量，"
    "低质量，JPEG压缩残留，丑陋的，残缺的，多余的手指，画得不好的手部，画得不好的脸部，畸形的，"
    "毁容的，形态畸形的肢体，手指融合，静止不动的画面，杂乱的背景，三条腿，背景人很多，倒着走"
)


class Text2VideoPipeline:
    """Drives the bidirectional WanModel with a multistep flow solver.

    Text encoding and VAE decoding live outside this class (as in the
    causal pipelines): pass prompt embeddings in, get latents out.
    """

    def __init__(self, params: dict, cfg: DiTConfig, attn_impl: str = "auto",
                 mesh=None, offload_blocks: bool = False):
        self.params = params
        self.cfg = cfg
        self.attn_impl = attn_impl
        self.tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
        # Ulysses SP over the mesh's `sp` axis — the reference wires its
        # vendored xDiT context parallelism into exactly this path
        # (wan/text2video.py:87-97); here it is parallel.sequence
        self.mesh = mesh
        self.sp = int(mesh.shape["sp"]) if mesh is not None and "sp" in mesh.shape else 1
        self._fn_cache = {}
        # per-access weight streaming (reference offload_model=True +
        # DynamicSwapInstaller, the 14B-on-small-HBM path): block params
        # live on host, streamed one layer ahead of compute
        self.offload_blocks = offload_blocks
        if offload_blocks:
            if self.sp > 1:
                raise ValueError("offload_blocks streams layers on one "
                                 "device; it composes with dp sharding of "
                                 "prompts, not sp")
            from ..utils.memory import blocks_to_host

            self.params = blocks_to_host(params)

    def prepare_condition(self, prompt_embeds: jax.Array) -> CrossKV:
        return prepare_cross_kv(self.params, self.cfg, prompt_embeds)

    def _sampler(self, guide_scale: float):
        key = float(guide_scale)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg, tables, attn_impl = self.cfg, self.tables, self.attn_impl

        mesh, sp = self.mesh, self.sp

        def run(params, noise, cross_both: CrossKV, coeffs: SV.SolverCoeffs):
            b = noise.shape[0]

            def model_fn(x, t):
                xx = jnp.concatenate([x, x], axis=0)
                tt = jnp.full((2 * b,), t, jnp.float32)
                if sp > 1:
                    from ..parallel.sequence import sp_bidirectional_forward

                    out = sp_bidirectional_forward(
                        params, cfg, tables, mesh, xx, tt, cross_both,
                        attn_impl=attn_impl)
                else:
                    out = bidirectional_forward(params, cfg, tables, xx, tt,
                                                cross_both, attn_impl=attn_impl)
                cond, uncond = out[:b], out[b:]
                return uncond + guide_scale * (cond - uncond)

            return SV.sample_flow(model_fn, noise, coeffs)

        fn = jax.jit(run)
        self._fn_cache[key] = fn
        return fn

    def generate_latents(
        self,
        cond_embeds: jax.Array,  # [B, text_len, text_in_dim]
        null_embeds: jax.Array,  # negative prompt embeddings, same shape
        noise: Optional[jax.Array] = None,
        *,
        rng: Optional[jax.Array] = None,
        latent_shape: Optional[tuple] = None,  # (B, F, C, H, W)
        sampling_steps: int = 50,
        shift: float = 5.0,
        guide_scale: float = 5.0,
        solver: str = "unipc",
        dtype=jnp.bfloat16,
    ) -> jax.Array:
        """WanT2V.generate (text2video.py:110-266) minus text/VAE stages.
        Returns clean latents [B, F, C, H, W]."""
        if noise is None:
            if rng is None or latent_shape is None:
                raise ValueError("pass either noise or (rng, latent_shape)")
            noise = jax.random.normal(rng, latent_shape, jnp.float32)
        coeffs = SV.make_coefficients(solver, sampling_steps, shift)
        if self.offload_blocks:
            # context mode: each layer's cross K/V is derived inline from
            # its streamed weights — no [L, ...] cross arrays and no pull of
            # the stacked cross projections to device (prepare_cross_kv
            # would), so a model that NEVER fits in HBM (14B) still samples
            from ..models.dit import embed_text
            from ..models.dit_bidirectional import bidirectional_forward_streamed

            b = noise.shape[0]
            # the text embedding is constant for the whole generation —
            # embed once here, not inside every solver step
            # (match prepare_condition's embed dtype exactly)
            ctx2 = embed_text(
                self.params,
                jnp.concatenate([cond_embeds, null_embeds], axis=0),
                jnp.bfloat16)

            def model_fn(x, t):
                xx = jnp.concatenate([x, x], axis=0)
                tt = jnp.full((2 * b,), t, jnp.float32)
                out = bidirectional_forward_streamed(
                    self.params, self.cfg, self.tables, xx, tt,
                    attn_impl=self.attn_impl, context=ctx2,
                    context_embedded=True)
                c_, u_ = out[:b], out[b:]
                return u_ + guide_scale * (c_ - u_)

            return SV.sample_flow_eager(model_fn, noise.astype(dtype), coeffs)
        cond = self.prepare_condition(cond_embeds)
        null = self.prepare_condition(null_embeds)
        both = CrossKV(
            k=jnp.concatenate([cond.k, null.k], axis=1),
            v=jnp.concatenate([cond.v, null.v], axis=1),
        )
        out = self._sampler(guide_scale)(self.params, noise.astype(dtype),
                                         both, coeffs)
        return out
