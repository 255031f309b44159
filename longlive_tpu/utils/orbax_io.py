"""Orbax checkpoint save / load / auto-resume.

TPU-native replacement for the reference's FSDP FULL_STATE_DICT rank-0
checkpointing (trainer/distillation.py:741-813): the whole train state
{gen_params, critic_params, gen_opt, critic_opt, ema_params, step} is saved
as a (sharded) pytree; auto-resume scans the logdir for the latest step
(distillation.py:605-629) and bounded retention keeps ``max_checkpoints``
(distillation.py:654-688).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"checkpoint_model_(\d+)$")


def _ckpt_dir(logdir: str, step: int) -> str:
    # same naming as the reference: checkpoint_model_{step:06d}
    return os.path.join(os.path.abspath(logdir), f"checkpoint_model_{step:06d}")


def save_train_state(logdir: str, step: int, state: Any,
                     max_checkpoints: Optional[int] = None) -> str:
    path = _ckpt_dir(logdir, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, dict(state), force=True)
    ckptr.wait_until_finished()
    # retention runs on process 0 only (multi-process: every process calls
    # save for the collective write, but deleting concurrently would race)
    if max_checkpoints and jax.process_index() == 0:
        steps = sorted(list_checkpoint_steps(logdir))
        for s in steps[:-max_checkpoints]:
            import shutil

            shutil.rmtree(_ckpt_dir(logdir, s), ignore_errors=True)
    return path


def list_checkpoint_steps(logdir: str):
    if not os.path.isdir(logdir):
        return []
    out = []
    for name in os.listdir(logdir):
        m = _STEP_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_checkpoint_step(logdir: str) -> Optional[int]:
    steps = list_checkpoint_steps(logdir)
    return steps[-1] if steps else None


def save_params(path: str, params: Any) -> str:
    """Saves a converted parameter pytree (e.g. torch->JAX DiT/VAE/T5 params)
    so later runs skip re-conversion."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
    return path


def load_params(path: str, abstract_params: Any = None) -> Any:
    """Without ``abstract_params`` the tree is restored as host numpy
    arrays in their saved dtypes (callers device_put as needed)."""
    ckptr = ocp.StandardCheckpointer()
    if abstract_params is None:
        return ckptr.restore(os.path.abspath(path))
    return ckptr.restore(os.path.abspath(path), abstract_params)


def restore_train_state(logdir: str, abstract_state: Any,
                        step: Optional[int] = None) -> Any:
    """Restores into the sharding/dtype layout of ``abstract_state``
    (pass the live state or a jax.eval_shape pytree)."""
    if step is None:
        step = latest_checkpoint_step(logdir)
        if step is None:
            return None
    path = _ckpt_dir(logdir, step)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, dict(abstract_state))
