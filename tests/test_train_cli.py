"""End-to-end training CLI smoke (tiny_debug mode): run 2 steps, checkpoint,
auto-resume."""

import pytest
import sys

import jax
import yaml


@pytest.mark.slow
def test_run_train_tiny(tmp_path, monkeypatch):
    cfg = {
        "tiny_debug": True,
        "distribution_loss": "dmd",
        "num_frame_per_block": 1,
        "num_training_frames": 4,
        "min_num_training_frames": 4,
        "slice_last_frames": 4,
        "denoising_step_list": [1000, 750, 500, 250],
        "warp_denoising_step": True,
        "dfake_gen_update_ratio": 2,
        "log_iters": 1,
        "max_checkpoints": 2,
        "max_iters": 2,
        "model_kwargs": {"timestep_shift": 5.0, "local_attn_size": 4, "sink_size": 1},
        "image_or_video_shape": [1, 4, 4, 8, 8],
        "negative_prompt": "low quality",
        # single-device: the 8-virtual-device CPU FSDP path is covered by
        # dryrun_multichip + tests/test_training.py; running the full CLI
        # loop sharded starves XLA:CPU's collective rendezvous on small
        # hosts (AwaitAndLogIfStuck abort on 1-core runners)
        "parallel": {"dp": 1, "fsdp": 1},
    }
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    logdir = tmp_path / "run"

    from longlive_tpu.run_train import main

    monkeypatch.setattr(sys, "argv", [
        "run_train", "--config_path", str(cfg_path), "--logdir", str(logdir),
        "--no_auto_resume"])
    main()
    assert (logdir / "metrics.jsonl").exists()

    from longlive_tpu.utils import orbax_io

    assert orbax_io.latest_checkpoint_step(str(logdir)) == 2

    # auto-resume restores and exits immediately (step >= max_iters)
    monkeypatch.setattr(sys, "argv", [
        "run_train", "--config_path", str(cfg_path), "--logdir", str(logdir)])
    main()
