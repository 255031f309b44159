"""VBench-style video quality metrics.

The reference README/paper cite VBench scores but the repo ships NO eval
harness (SURVEY.md §4: "External benchmark: VBench scores cited in
README/paper, no harness in repo").  This module provides the harness the
reference lacks: the standard VBench temporal/frame-wise dimensions
computed with self-contained proxies (VBench proper scores some dimensions
with external checkpoints — RAFT, DINO, MUSIQ, AMT — that cannot ship
here; where we substitute a proxy the docstring says so).

All metrics take ``video`` as float array [T, H, W, 3] in [0, 1] and return
a score in [0, 1] (higher = better, matching VBench's convention).  The
CLIP-based dimensions (subject/background consistency, CLIP text-video
score) use the in-repo CLIP ViT-H tower (models/clip.py) when its params
are supplied, falling back to downsampled pixel features otherwise.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np


def _as_video(video) -> np.ndarray:
    v = np.asarray(video, np.float32)
    assert v.ndim == 4 and v.shape[-1] == 3, f"want [T,H,W,3], got {v.shape}"
    return np.clip(v, 0.0, 1.0)


def temporal_flicker(video) -> float:
    """VBench 'temporal flickering': 1 - mean absolute difference between
    consecutive frames (VBench computes MAE over static regions; this proxy
    uses the full frame).  Static video -> 1.0."""
    v = _as_video(video)
    if len(v) < 2:
        return 1.0
    mae = np.abs(np.diff(v, axis=0)).mean()
    return float(1.0 - mae)


def motion_smoothness(video) -> float:
    """VBench 'motion smoothness' proxy: 1 - normalized second temporal
    difference (VBench proper scores AMT-interpolated frame error; constant-
    velocity motion scores 1.0 under both)."""
    v = _as_video(video)
    if len(v) < 3:
        return 1.0
    accel = np.abs(v[2:] - 2.0 * v[1:-1] + v[:-2]).mean()
    return float(1.0 - min(accel * 2.0, 1.0))


def dynamic_degree(video, threshold: float = 0.01) -> float:
    """VBench 'dynamic degree' proxy: fraction of frame pairs whose mean
    absolute difference exceeds ``threshold`` (VBench uses RAFT flow
    magnitude).  Higher = more motion; not a quality score per se."""
    v = _as_video(video)
    if len(v) < 2:
        return 0.0
    mae = np.abs(np.diff(v, axis=0)).mean(axis=(1, 2, 3))
    return float((mae > threshold).mean())


def imaging_quality(video) -> float:
    """VBench 'imaging quality' proxy: normalized Laplacian variance
    (sharpness; VBench proper uses MUSIQ).  Blurred/flat videos score low."""
    v = _as_video(video).mean(axis=-1)  # luma-ish
    lap = (-4.0 * v[:, 1:-1, 1:-1] + v[:, :-2, 1:-1] + v[:, 2:, 1:-1]
           + v[:, 1:-1, :-2] + v[:, 1:-1, 2:])
    sharp = float(lap.var())
    return float(1.0 - math.exp(-sharp * 300.0))


def _frame_features(video: np.ndarray, clip_params=None, clip_cfg=None,
                    max_frames: int = 16) -> np.ndarray:
    """[T, D] L2-normalized per-frame features: CLIP ViT-H pooled features
    when params are given, else 16x16 downsampled pixels."""
    v = _as_video(video)
    if len(v) > max_frames:
        idx = np.linspace(0, len(v) - 1, max_frames).round().astype(int)
        v = v[idx]
    if clip_params is not None:
        import jax.numpy as jnp

        from ..models import clip as C

        imgs = jnp.asarray(v.transpose(0, 3, 1, 2)) * 2.0 - 1.0  # [T,3,H,W] [-1,1]
        tokens = C.encode_image(clip_params, clip_cfg, imgs)
        feats = np.asarray(tokens[:, 0].astype(jnp.float32))  # CLS token
    else:
        t, h, w, _ = v.shape
        hs, ws = max(h // 16, 1), max(w // 16, 1)
        feats = v[:, : hs * 16 : hs, : ws * 16 : ws].reshape(t, -1)
        feats = feats - feats.mean(axis=1, keepdims=True)
    norm = np.linalg.norm(feats, axis=1, keepdims=True) + 1e-8
    return feats / norm


def subject_consistency(video, clip_params=None, clip_cfg=None) -> float:
    """VBench 'subject consistency': mean of (cos(first, t) + cos(t-1, t))/2
    over frames (DINO features in VBench; CLIP/pixel features here)."""
    f = _frame_features(video, clip_params, clip_cfg)
    if len(f) < 2:
        return 1.0
    sim_first = (f[1:] @ f[0]).clip(0, 1)
    sim_prev = np.einsum("td,td->t", f[1:], f[:-1]).clip(0, 1)
    return float(((sim_first + sim_prev) / 2.0).mean())


def background_consistency(video, clip_params=None, clip_cfg=None) -> float:
    """VBench 'background consistency': mean cosine similarity of each frame
    feature to the video's mean feature (CLIP features in VBench)."""
    f = _frame_features(video, clip_params, clip_cfg)
    mean = f.mean(axis=0)
    mean /= np.linalg.norm(mean) + 1e-8
    return float((f @ mean).clip(0, 1).mean())


def clip_score(video, text_features, clip_params, clip_cfg) -> float:
    """CLIP text-video alignment (VBench 'overall consistency' family):
    mean cosine similarity between L2-normalized CLIP text features and
    per-frame image features.  Requires the in-repo CLIP tower params and
    precomputed text features (models.clip.clip_text_forward)."""
    f = _frame_features(video, clip_params, clip_cfg)
    tf = np.asarray(text_features, np.float32).reshape(-1)
    tf /= np.linalg.norm(tf) + 1e-8
    return float((f @ tf).clip(-1, 1).mean())


def evaluate_video(video, clip_params=None, clip_cfg=None,
                   text_features=None) -> dict:
    """All dimensions for one video.  Returns {metric: score}."""
    out = {
        "temporal_flicker": temporal_flicker(video),
        "motion_smoothness": motion_smoothness(video),
        "dynamic_degree": dynamic_degree(video),
        "imaging_quality": imaging_quality(video),
        "subject_consistency": subject_consistency(video, clip_params, clip_cfg),
        "background_consistency": background_consistency(video, clip_params, clip_cfg),
    }
    if text_features is not None and clip_params is not None:
        out["clip_score"] = clip_score(video, text_features, clip_params, clip_cfg)
    return out
