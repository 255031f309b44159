"""Bidirectional image-to-video sampler — the vanilla Wan2.1 I2V path.

TPU-native re-design of ``WanI2V`` (reference wan/image2video.py:39-346):
condition a bidirectional i2v WanModel on (a) the first frame's VAE latents
+ a first-frame mask concatenated to the model input channels, and (b) CLIP
image tokens attended via the per-block image cross-attention branch, then
run the same UniPC / DPM++ CFG sampler as text-to-video.

Same TPU design choices as pipeline.text2video: cond/uncond batched into
one forward, whole sampler as one lax.scan.  The CLIP features and the
conditioning latents `y` are shared between cond and uncond branches
(image2video.py:281-293), so they are simply tiled across the 2B batch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DiTConfig
from ..models import vae as V
from ..models.clip import CLIPVisionConfig, encode_image
from ..models.dit import CrossKV, prepare_cross_kv
from ..models.dit_bidirectional import bidirectional_forward, prepare_img_cross_kv
from ..ops import solvers as SV
from ..ops.rope import make_rope_tables


def build_i2v_mask(num_pixel_frames: int, lat_h: int, lat_w: int,
                   temporal_stride: int = 4) -> jax.Array:
    """First-frame mask in latent time: [4, F_lat, lat_h, lat_w]
    (image2video.py:207-214).  Pixel-frame mask = 1 for frame 0 only; frame
    0 is repeated ``temporal_stride`` times (the VAE encodes it alone), then
    groups of 4 fold into the channel axis."""
    msk = jnp.zeros((num_pixel_frames, lat_h, lat_w), jnp.float32)
    msk = msk.at[0].set(1.0)
    msk = jnp.concatenate(
        [jnp.repeat(msk[:1], temporal_stride, axis=0), msk[1:]], axis=0)
    f_lat = msk.shape[0] // temporal_stride
    msk = msk.reshape(f_lat, temporal_stride, lat_h, lat_w)
    return msk.transpose(1, 0, 2, 3)  # [4, F_lat, h, w]


def encode_first_frame_condition(
    vae_params: dict,
    vae_cfg: V.VAEConfig,
    img: jax.Array,  # [B, 3, H, W] in [-1, 1]
    num_pixel_frames: int,
) -> jax.Array:
    """VAE-encode [img, zeros x (F-1)] and prepend the first-frame mask:
    returns y [B, stride+z, F_lat, lat_h, lat_w] — [B, 20, ...] at full scale
    (image2video.py:207-246).  The mask channel count equals the VAE's
    temporal stride (4 for Wan; derived from the config here)."""
    b, c, h, w = img.shape
    stride_t = 2 ** sum(vae_cfg.temperal_downsample)
    video = jnp.concatenate(
        [img[:, None], jnp.zeros((b, num_pixel_frames - 1, c, h, w), img.dtype)],
        axis=1)
    lat = V.vae_encode(vae_params, vae_cfg, video)  # [B, F_lat, z, h', w']
    lat = lat.transpose(0, 2, 1, 3, 4)  # [B, z, F_lat, h', w']
    _, z, f_lat, lh, lw = lat.shape
    msk = build_i2v_mask(num_pixel_frames, lh, lw, stride_t)
    msk = jnp.broadcast_to(msk[None], (b,) + msk.shape).astype(lat.dtype)
    return jnp.concatenate([msk, lat], axis=1)  # [B, 4+z, F, h, w]


class Image2VideoPipeline:
    """Drives the bidirectional i2v WanModel with a multistep flow solver.

    Heavy encoders (T5, CLIP, VAE) run outside/before; this class consumes
    prompt embeddings, CLIP features, and the conditioning tensor `y`.
    """

    def __init__(self, params: dict, cfg: DiTConfig, attn_impl: str = "auto"):
        assert cfg.model_type == "i2v", "Image2VideoPipeline needs an i2v DiT"
        self.params = params
        self.cfg = cfg
        self.attn_impl = attn_impl
        self.tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
        self._fn_cache = {}

    def _sampler(self, guide_scale: float):
        key = float(guide_scale)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg, tables, attn_impl = self.cfg, self.tables, self.attn_impl

        def run(params, noise, y, cross_both, cross_img, coeffs):
            b = noise.shape[0]
            y2 = jnp.concatenate([y, y], axis=0)  # shared cond tensor

            def model_fn(x, t):
                xx = jnp.concatenate([x, x], axis=0)
                xx = jnp.concatenate([xx, y2.astype(xx.dtype)], axis=2)
                tt = jnp.full((2 * b,), t, jnp.float32)
                out = bidirectional_forward(params, cfg, tables, xx, tt,
                                            cross_both, attn_impl=attn_impl,
                                            cross_kv_img=cross_img)
                cond, uncond = out[:b], out[b:]
                return uncond + guide_scale * (cond - uncond)

            return SV.sample_flow(model_fn, noise, coeffs)

        fn = jax.jit(run)
        self._fn_cache[key] = fn
        return fn

    def generate_latents(
        self,
        cond_embeds: jax.Array,  # [B, text_len, text_dim]
        null_embeds: jax.Array,
        clip_fea: jax.Array,  # [B, 257, clip_dim] (models.clip.encode_image)
        y: jax.Array,  # [B, 20, F, h, w] (encode_first_frame_condition)
        noise: Optional[jax.Array] = None,
        *,
        rng: Optional[jax.Array] = None,
        latent_shape: Optional[Tuple[int, ...]] = None,  # (B, F, C, H, W)
        sampling_steps: int = 40,
        shift: float = 5.0,
        guide_scale: float = 5.0,
        solver: str = "unipc",
        dtype=jnp.bfloat16,
    ) -> jax.Array:
        """WanI2V.generate (image2video.py:129-338) minus encoder stages.
        Returns clean latents [B, F, C, H, W]."""
        if noise is None:
            if rng is None or latent_shape is None:
                raise ValueError("pass either noise or (rng, latent_shape)")
            noise = jax.random.normal(rng, latent_shape, jnp.float32)
        cond = prepare_cross_kv(self.params, self.cfg, cond_embeds)
        null = prepare_cross_kv(self.params, self.cfg, null_embeds)
        both = CrossKV(k=jnp.concatenate([cond.k, null.k], axis=1),
                       v=jnp.concatenate([cond.v, null.v], axis=1))
        img = prepare_img_cross_kv(self.params, self.cfg, clip_fea)
        img2 = CrossKV(k=jnp.concatenate([img.k, img.k], axis=1),
                       v=jnp.concatenate([img.v, img.v], axis=1))
        # y arrives channel-first [B, 20, F, h, w]; model input is
        # [B, F, C, H, W], so move channels behind time.
        y_f = y.transpose(0, 2, 1, 3, 4)
        coeffs = SV.make_coefficients(solver, sampling_steps, shift)
        return self._sampler(guide_scale)(self.params, noise.astype(dtype),
                                          y_f, both, img2, coeffs)
