"""run_t2v CLI smoke (tiny_debug): t2v and i2v modes end-to-end to mp4."""

import os
import sys

import numpy as np
import pytest


@pytest.mark.parametrize("mode", ["t2v", "i2v"])
@pytest.mark.slow
def test_run_t2v_tiny(tmp_path, monkeypatch, mode):
    out = str(tmp_path / f"{mode}.mp4")
    argv = ["run_t2v", "--prompt", "a red fox", "--tiny_debug",
            "--size", "16x16", "--frame_num", "5", "--steps", "3",
            "--output", out]
    if mode == "i2v":
        import imageio.v2 as imageio

        img = str(tmp_path / "seed.png")
        imageio.imwrite(img, (np.random.rand(24, 24, 3) * 255).astype("uint8"))
        argv += ["--image", img, "--solver", "dpm++"]
    monkeypatch.setattr(sys, "argv", argv)
    from longlive_tpu.run_t2v import main

    main()
    assert os.path.exists(out) and os.path.getsize(out) > 0
