"""VBench-style eval harness: metric sanity + CLI."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longlive_tpu.eval import (
    background_consistency,
    clip_score,
    dynamic_degree,
    evaluate_video,
    imaging_quality,
    motion_smoothness,
    subject_consistency,
    temporal_flicker,
)


def _static_video(t=8, h=32, w=32):
    rng = np.random.RandomState(0)
    frame = rng.rand(1, h, w, 3).astype(np.float32)
    return np.repeat(frame, t, axis=0)


def _noise_video(t=8, h=32, w=32):
    return np.random.RandomState(1).rand(t, h, w, 3).astype(np.float32)


def _smooth_pan(t=8, h=32, w=32):
    """Constant-velocity pan over a smooth (low-frequency) random texture —
    textured enough that optical flow is well-posed (a pure linear ramp has
    no flow signal, for RAFT either), smooth enough that flow tracks it (iid
    pixel noise is untrackable by any flow method)."""
    rng = np.random.RandomState(4)
    coarse = rng.rand(h // 8, w // 2, 3).astype(np.float32)
    tex = np.kron(coarse, np.ones((8, 8, 1), np.float32))  # [h, 4w, 3]
    frames = [tex[:, 2 * i : 2 * i + w] for i in range(t)]
    return np.stack(frames)


def test_static_video_scores():
    v = _static_video()
    assert temporal_flicker(v) == 1.0
    # flow-interpolated reconstruction of a static frame is exact up to
    # remap interpolation noise
    assert motion_smoothness(v) > 0.995
    assert dynamic_degree(v) == 0.0
    assert subject_consistency(v) > 0.999
    assert background_consistency(v) > 0.999


def test_noise_video_scores_lower():
    vs, vn = _static_video(), _noise_video()
    assert temporal_flicker(vn) < temporal_flicker(vs)
    assert motion_smoothness(vn) < motion_smoothness(vs)
    assert dynamic_degree(vn) == 1.0
    assert subject_consistency(vn) < 0.9


def test_smooth_motion_beats_noise():
    vp, vn = _smooth_pan(), _noise_video()
    assert motion_smoothness(vp) > motion_smoothness(vn)
    assert dynamic_degree(vp) > 0.0


def test_imaging_quality_prefers_sharp():
    sharp = _noise_video()
    blur = np.ones((8, 32, 32, 3), np.float32) * 0.5
    assert imaging_quality(sharp) > imaging_quality(blur)


@pytest.mark.slow
def test_clip_feature_paths():
    """CLIP-backed consistency + clip_score on the tiny vision tower."""
    from longlive_tpu.models import clip as C

    cfg = C.tiny_clip_vision_config()
    params = C.init_clip_vision_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    v = np.random.RandomState(2).rand(4, cfg.image_size, cfg.image_size, 3
                                      ).astype(np.float32)
    s = subject_consistency(v, params, cfg)
    assert 0.0 <= s <= 1.0
    text_feat = np.random.RandomState(3).rand(cfg.dim).astype(np.float32)
    cs = clip_score(v, text_feat, params, cfg)
    assert -1.0 <= cs <= 1.0


def test_evaluate_video_keys():
    out = evaluate_video(_smooth_pan())
    for k in ("temporal_flicker", "motion_smoothness", "dynamic_degree",
              "imaging_quality", "subject_consistency", "background_consistency"):
        assert k in out


def test_run_eval_cli(tmp_path):
    v = _smooth_pan()
    np.save(tmp_path / "vid.npy", v)
    out_json = tmp_path / "scores.json"
    r = subprocess.run(
        [sys.executable, "-m", "longlive_tpu.run_eval",
         str(tmp_path / "vid.npy"), "--json", str(out_json)],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    lines = [json.loads(l) for l in r.stdout.strip().splitlines()]
    assert "aggregate" in lines[-1]
    saved = json.loads(out_json.read_text())
    assert saved["aggregate"]["temporal_flicker"] > 0.5
