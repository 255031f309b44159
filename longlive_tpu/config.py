"""Model / pipeline configuration.

The reference drives everything from OmegaConf YAML (train.py:24-26,
inference.py:27, configs/*.yaml).  We keep YAML-compatible config parsing
(same keys as configs/longlive_inference.yaml etc.) on top of typed frozen
dataclasses so the geometry is static under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import yaml


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    """Geometry of the (causal) Wan DiT.

    Defaults = Wan2.1-T2V-1.3B @ 480x832 with LongLive attention settings
    (reference wan/configs/wan_t2v_1_3B.py:20-29,
    configs/longlive_inference.yaml:9-12).
    """

    dim: int = 1536
    ffn_dim: int = 8960
    num_heads: int = 12
    num_layers: int = 30
    in_dim: int = 16
    out_dim: int = 16
    text_dim: int = 4096
    text_len: int = 512
    freq_dim: int = 256
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    # causal attention structure
    local_attn_size: int = 12  # frames in the attention window (-1 = global)
    sink_size: int = 3  # frames pinned at the start (frame sink)
    num_frame_per_block: int = 3
    rope_max_pos: int = 1024
    # 't2v' or 'i2v' (reference wan/modules/model.py:563); 'i2v' adds the
    # per-block k_img/v_img cross-attention and the img_emb CLIP projector,
    # and expects in_dim = 36 (16 noise + 4 mask + 16 image latents).
    model_type: str = "t2v"
    clip_dim: int = 1280  # CLIP vision feature width feeding img_emb
    # RoPE channel layout: "halfsplit" permutes the q/k projection outputs at
    # param-build time so complex pairs are (re half ++ im half) per head —
    # the rotation becomes two 64-lane slices + f32 mul-adds instead of the
    # stride-2 pair gather (measured ~16.6 ms/forward of Mosaic relayouts at
    # the decode shape, ops/rope.py).  Attention is invariant to a consistent
    # q/k channel permutation, so outputs match "interleaved" exactly.
    rope_layout: str = "halfsplit"

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


@dataclasses.dataclass(frozen=True)
class LatentGeometry:
    """Latent-video geometry. 480x832 pixels -> 60x104 latents -> 30x52
    patches = 1560 tokens/frame (reference pipeline/causal_inference.py:41)."""

    channels: int = 16
    height: int = 60
    width: int = 104
    patch_size: Tuple[int, int, int] = (1, 2, 2)

    @property
    def tokens_h(self) -> int:
        return self.height // self.patch_size[1]

    @property
    def tokens_w(self) -> int:
        return self.width // self.patch_size[2]

    @property
    def frame_seq_length(self) -> int:
        return self.tokens_h * self.tokens_w


@dataclasses.dataclass(frozen=True)
class CacheConfig:
    """Static geometry of the frame-sink + ring-window KV cache.

    The reference sizes the cache at ``local_attn_size * frame_seq_length``
    tokens, keeps ``sink_size`` frames pinned, and rolls the rest
    (pipeline/causal_inference.py:109-127, wan/modules/causal_model.py:231-287).
    Here the rolling region is a ring buffer: frame ``f`` lives at frame-slot
    ``sink + (f - ring_base) % ring_frames`` and nothing ever moves.
    """

    sink_frames: int = 3
    ring_frames: int = 9  # local_attn_size - sink_size
    frame_seq: int = 1560

    @property
    def total_frames(self) -> int:
        return self.sink_frames + self.ring_frames

    @property
    def size_tokens(self) -> int:
        return self.total_frames * self.frame_seq

    @property
    def sink_tokens(self) -> int:
        return self.sink_frames * self.frame_seq

    @staticmethod
    def from_model(
        cfg: DiTConfig, geom: LatentGeometry, num_output_frames: int
    ) -> "CacheConfig":
        """Mirrors the reference sizing policy: local window when
        local_attn_size != -1, else the full video length
        (pipeline/causal_inference.py:110-127)."""
        if cfg.local_attn_size != -1:
            sink = cfg.sink_size
            ring = cfg.local_attn_size - cfg.sink_size
        else:
            sink = cfg.sink_size
            ring = num_output_frames - cfg.sink_size
        return CacheConfig(
            sink_frames=sink, ring_frames=ring, frame_seq=geom.frame_seq_length
        )


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Run configuration (reference configs/longlive_inference.yaml keys)."""

    denoising_step_list: Tuple[int, ...] = (1000, 750, 500, 250)
    warp_denoising_step: bool = True
    num_frame_per_block: int = 3
    timestep_shift: float = 5.0
    local_attn_size: int = 12
    sink_size: int = 3
    num_output_frames: int = 120
    context_noise: int = 0
    global_sink: bool = True
    seed: int = 0
    switch_frame_indices: Tuple[int, ...] = ()
    # reference inference.py:72-94,185-246 surface: EMA weights from the
    # generator checkpoint, samples per prompt, index-vs-prompt filenames,
    # and a cap on processed prompt batches (-1 = no cap)
    use_ema: bool = False
    num_samples: int = 1
    save_with_index: bool = False
    inference_iter: int = -1
    # store cached (roped) keys int8 with per-token dequant scales; keys are
    # quantized ONCE at cache-write time, so the flash kernel runs int8-QK
    # without any per-forward K-quantize pass (serving-only knob; no
    # reference analogue — its KV cache is bf16, causal_model.py:206-236)
    kv_int8: bool = False
    # Skip the clean-context commit pass (causal_inference.py:191-200 runs a
    # 5th forward on x0 purely to write cache K/V): instead keep the K/V the
    # LAST denoise forward already computed from its (low-noise, ~t=250)
    # input.  Cuts DiT work per block 5->4 forwards (-20%).  Training-free
    # Block-Cascading-style acceleration — context is slightly noisy, which
    # LongLive's context_noise training tolerates; OFF by default (quality
    # delta quantified in scripts/quality_delta.py).
    reuse_last_denoise_kv: bool = False
    # Keep the KV cache in the flash kernel's own operand layout
    # ([L*B*N, S_pad, D], ops/kv_cache.init_cache_kl) and thread it through
    # every forward of a block: per-layer decode attention reads the cache
    # with zero relayout and block K/V commit in place — removes the
    # write-then-attend path's ~16 ms/forward KV-write tax (PERF.md; measured
    # −5.9% e2e int8, −4.8% bf16, chip session r2e).  Exact reformulation.
    # None = AUTO (the default): ON whenever supported — single-device
    # serving (sp == 1), bf16 cache (no kv_int8), contiguous-ring config —
    # else OFF.  Explicit True raises if unsupported; False forces the
    # write-then-attend form.  No reference analogue.
    kernel_cache: Optional[bool] = None
    # Rotate q inside the flash-kernel prologue instead of a separate
    # pass over q (halfsplit rope layout only; single-segment bf16-cache
    # attends).  Pure data-movement change up to one extra bf16 rounding
    # of q between the rms premul and the rotation.
    fused_rope: bool = False
    # Incremental prompt-switch recache (pipeline.causal_inference.
    # EagerRecache): with scheduled switch indices, the replay window is
    # committed chunk-by-chunk as its frames are generated, so the
    # at-switch serial stall is ~zero instead of the one-shot recache
    # (~550 ms).  Reproduces the reference's blockwise-causal interactive
    # mask semantics (interactive_causal_inference.py:73-96); costs one
    # extra cache buffer of HBM while a switch approaches.
    eager_recache: bool = False
    # Reduced replay window for REACTIVE (unscheduled) prompt switches:
    # a switch that arrives without schedule cannot use the eager
    # (incremental) recache — the one-shot replay of min(local_attn, t)
    # frames is a ~550 ms serial stall.  With this set to r, an
    # unscheduled switch replays only the last r frames (block-aligned),
    # cutting the stall roughly proportionally.  The first post-switch
    # blocks see a shorter history window (same spirit as the reference's
    # no-quality-drop window-9 ablation, reports.md:57-61); the window
    # refills with post-switch frames within local_attn frames, after
    # which the state is self-consistent again.  Under global_sink=False
    # the pinned sink becomes the first frames of the REDUCED replay
    # (slightly newer than the full replay's).  None = reference-exact
    # full-window replay.  No reference analogue.
    reactive_recache_frames: Optional[int] = None
    # Attention impl override for the KV-recache (prompt-switch) forward
    # only.  "pallas_qk8" runs the recache's dense prefill QK^T on the int8
    # MXU pipe: unlike the decode path (where the per-forward cache-quantize
    # passes made int8-QK a net loss, PERF.md negative result #2), the
    # recache quantizes each token ONCE against O(S^2) attention work.
    # None = the pipeline's attn_impl.
    recache_attn_impl: Optional[str] = None
    model_name: str = "Wan2.1-T2V-1.3B"
    data_path: Optional[str] = None
    output_folder: Optional[str] = None
    generator_ckpt: Optional[str] = None
    lora_ckpt: Optional[str] = None
    profile: bool = False
    extras: dict = dataclasses.field(default_factory=dict)

    def dit_config(self) -> DiTConfig:
        return DiTConfig(
            local_attn_size=self.local_attn_size,
            sink_size=self.sink_size,
            num_frame_per_block=self.num_frame_per_block,
        )


def _parse_switch_indices(v: Any) -> Tuple[int, ...]:
    # interactive config stores "40, 80, 120, 160, 200" as a string
    # (configs/longlive_interactive_inference.yaml:27, parsed at
    # interactive_inference.py:146-163)
    if v is None:
        return ()
    if isinstance(v, str):
        return tuple(int(s) for s in v.replace(",", " ").split())
    return tuple(int(s) for s in v)


# Every YAML key the framework consumes (inference + training CLIs and
# their extension keys).  Keys here are either wired to behavior or are
# deliberate no-ops on TPU (GPU-runtime knobs listed in
# _REFERENCE_NOOP_KEYS).  Anything else triggers a loud warning instead of
# the reference's silent getattr-default behavior.
_CONSUMED_KEYS = frozenset({
    # shared model/schedule
    "denoising_step_list", "warp_denoising_step", "num_frame_per_block",
    "model_kwargs", "model_name", "seed", "context_noise", "global_sink",
    "num_train_timestep", "timestep_shift", "guidance_scale",
    # inference
    "num_output_frames", "switch_frame_indices", "data_path",
    "output_folder", "generator_ckpt", "lora_ckpt", "adapter", "profile",
    "use_ema", "num_samples", "save_with_index", "inference_iter",
    "negative_prompt",
    # training
    "distribution_loss", "lr", "lr_critic", "beta1", "beta2",
    "beta1_critic", "beta2_critic", "weight_decay",
    "dfake_gen_update_ratio", "gradient_accumulation_steps", "ema_weight",
    "ema_start_step", "num_training_frames", "min_num_training_frames",
    "slice_last_frames", "last_step_only", "ts_schedule", "ts_schedule_max",
    "real_name", "fake_name", "denoising_loss_type",
    "image_or_video_shape", "batch_size", "max_iters", "log_iters",
    "max_checkpoints", "vis_interval", "vis_video_lengths",
    "wandb_project", "wandb_entity", "wandb_key",
    "streaming_training", "streaming_chunk_size", "streaming_max_length",
    "streaming_min_new_frame", "switch_choices", "switch_mode",
    "switch_prompt_path", "train_first_chunk", "mixed_precision",
    # TPU-native extension keys (no reference analogue; see field docs)
    "kv_int8", "reuse_last_denoise_kv", "kernel_cache", "fused_rope",
    "eager_recache", "recache_attn_impl", "reactive_recache_frames",
    "ckpt_cache", "low_memory",
    "parallel", "opt_on_host", "opt_async", "ema_on_host", "cache_int8",
    "staged_phases", "block_vjp", "page_generator", "teacher_stream",
    "tiny_debug", "allow_random_weights", "phase_ledger",
})

# Reference keys that configure its CUDA/FSDP runtime and have no TPU
# meaning: sharding/wrap strategies are replaced by the pjit mesh rules
# (`parallel:`), remat is always structured per-layer, gc/telemetry knobs
# are torch-runtime specifics.  Accepted silently for reference-config
# compatibility.
_REFERENCE_NOOP_KEYS = frozenset({
    "sharding_strategy", "generator_fsdp_wrap_strategy",
    "real_score_fsdp_wrap_strategy", "fake_score_fsdp_wrap_strategy",
    "text_encoder_fsdp_wrap_strategy", "gradient_checkpointing",
    "gc_interval", "trainer", "total_batch_size", "val_batch_size",
    "val_data_path", "val_switch_prompt_path", "vis_ema", "load_raw_video",
    # default_config.yaml keys of reference paths we realize differently
    # (geometry is LatentGeometry; i2v is the Image2VideoPipeline)
    "causal", "ckpt_step", "discriminator_lr_multiplier", "eval_first_n",
    "height", "width", "num_frames", "i2v", "independent_first_frame",
    "prompt_name", "prompt_path", "same_step_across_blocks",
})

RECOGNIZED_KEYS = _CONSUMED_KEYS | _REFERENCE_NOOP_KEYS


def warn_unknown_keys(raw: dict, source: str = "config") -> list:
    """Reference configs are the de-facto API; a typo'd key silently doing
    nothing is the failure mode this guards (VERDICT r3 Missing #4)."""
    import sys

    unknown = sorted(k for k in (raw or {}) if k not in RECOGNIZED_KEYS)
    for k in unknown:
        print(f"[longlive_tpu] WARNING: {source}: unknown config key "
              f"{k!r} is ignored", file=sys.stderr)
    return unknown


def load_pipeline_config(path: str) -> PipelineConfig:
    """Loads a reference-format YAML config (e.g. longlive_inference.yaml)."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    warn_unknown_keys(raw, source=path)
    return pipeline_config_from_dict(raw)


def pipeline_config_from_dict(raw: dict) -> PipelineConfig:
    mk = raw.get("model_kwargs", {}) or {}
    known = dict(
        denoising_step_list=tuple(raw.get("denoising_step_list", (1000, 750, 500, 250))),
        warp_denoising_step=bool(raw.get("warp_denoising_step", True)),
        num_frame_per_block=int(raw.get("num_frame_per_block", 3)),
        timestep_shift=float(mk.get("timestep_shift", 5.0)),
        local_attn_size=int(mk.get("local_attn_size", -1)),
        sink_size=int(mk.get("sink_size", 0)),
        num_output_frames=int(raw.get("num_output_frames", 120)),
        context_noise=int(raw.get("context_noise", 0)),
        global_sink=bool(raw.get("global_sink", False)),
        seed=int(raw.get("seed", 0)),
        switch_frame_indices=_parse_switch_indices(raw.get("switch_frame_indices")),
        use_ema=bool(raw.get("use_ema", False)),
        num_samples=int(raw.get("num_samples", 1)),
        save_with_index=bool(raw.get("save_with_index", False)),
        inference_iter=int(raw.get("inference_iter", -1)),
        model_name=raw.get("model_name", "Wan2.1-T2V-1.3B"),
        data_path=raw.get("data_path"),
        output_folder=raw.get("output_folder"),
        generator_ckpt=raw.get("generator_ckpt"),
        lora_ckpt=raw.get("lora_ckpt"),
        profile=bool(raw.get("profile", False)),
        # TPU serving extension keys (no reference analogue; absent from
        # reference YAMLs, so the defaults rule)
        kv_int8=bool(raw.get("kv_int8", False)),
        reuse_last_denoise_kv=bool(raw.get("reuse_last_denoise_kv", False)),
        kernel_cache=raw.get("kernel_cache"),  # None = auto
        fused_rope=bool(raw.get("fused_rope", False)),
        eager_recache=bool(raw.get("eager_recache", False)),
        recache_attn_impl=raw.get("recache_attn_impl"),
        reactive_recache_frames=(
            None if raw.get("reactive_recache_frames") is None
            else int(raw["reactive_recache_frames"])),
    )
    extras = {k: v for k, v in raw.items() if k not in known and k != "model_kwargs"}
    return PipelineConfig(extras=extras, **known)


# Model-family presets (reference wan/configs/wan_t2v_1_3B.py:20-29,
# wan_t2v_14B.py; the 14B is the optional DMD teacher via `real_name`,
# configs/longlive_train_init.yaml:5-7).
WAN_MODEL_CONFIGS = {
    "Wan2.1-T2V-1.3B": dict(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30),
    "Wan2.1-T2V-14B": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40),
}


def dit_config_for(model_name: str, **overrides) -> DiTConfig:
    base = WAN_MODEL_CONFIGS.get(model_name)
    if base is None:
        raise KeyError(f"unknown model {model_name!r}; known: {list(WAN_MODEL_CONFIGS)}")
    return DiTConfig(**{**base, **overrides})


# Small geometry used by unit tests: keeps every code path (sink, ring,
# blocks, RoPE splits) while being ~1000x cheaper than the 1.3B shapes.
def tiny_dit_config() -> DiTConfig:
    return DiTConfig(
        dim=96,
        ffn_dim=128,
        num_heads=4,
        num_layers=2,
        in_dim=4,
        out_dim=4,
        text_dim=32,
        text_len=16,
        freq_dim=32,
        local_attn_size=4,
        sink_size=1,
        num_frame_per_block=1,
        rope_max_pos=64,
    )


def tiny_geometry() -> LatentGeometry:
    return LatentGeometry(channels=4, height=8, width=8)
