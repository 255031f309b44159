"""Video export (reference writes mp4 at 16 fps, inference.py:244)."""

from __future__ import annotations

import os

import numpy as np


def write_video(path: str, video: np.ndarray, fps: int = 16) -> None:
    """video: [T, H, W, 3] float in [0,1] or uint8.  Writes mp4 via OpenCV
    (bundled codec, no ffmpeg needed), falling back to imageio then .npy."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if video.dtype != np.uint8:
        video = (np.clip(video, 0.0, 1.0) * 255.0).astype(np.uint8)
    try:
        import cv2

        h, w = video.shape[1:3]
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not writer.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        for frame in video:
            writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        writer.release()
        return
    except Exception:
        pass
    try:
        import imageio

        imageio.mimwrite(path, list(video), fps=fps)
    except Exception:
        np.save(path + ".npy", video)


def to_video_array(pixels) -> np.ndarray:
    """[B, T, 3, H, W] in [-1,1] -> [T, H, W, 3] in [0,1] (batch 0),
    matching `video*0.5+0.5` (causal_inference.py:220-221)."""
    v = np.asarray(pixels)[0]
    v = v * 0.5 + 0.5
    return np.clip(v.transpose(0, 2, 3, 1), 0.0, 1.0)
