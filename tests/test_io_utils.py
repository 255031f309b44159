"""Video IO + prompt extension interface."""

import numpy as np

from longlive_tpu.utils.prompt_extend import get_rewriter
from longlive_tpu.utils.video_io import to_video_array, write_video


def test_write_video_mp4(tmp_path):
    v = np.random.rand(4, 32, 48, 3).astype(np.float32)
    p = str(tmp_path / "out.mp4")
    write_video(p, v, fps=16)
    import os
    assert os.path.exists(p) and os.path.getsize(p) > 0


def test_to_video_array_range():
    pixels = np.stack([np.full((2, 3, 8, 8), -1.0), np.full((2, 3, 8, 8), 1.0)])
    v = to_video_array(pixels[:1])
    assert v.shape == (2, 8, 8, 3)
    assert v.min() >= 0.0 and v.max() <= 1.0


def test_identity_rewriter():
    rw = get_rewriter("identity")
    assert rw("a cat") == "a cat"
