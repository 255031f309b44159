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


def _multihost_safe(state: Any) -> Any:
    """Multi-process saves reject host-local jax.Arrays (e.g. the python-
    side ``step`` scalar): every fully-addressable array is identical on
    all processes here (same-PRNG design), so save it as numpy — orbax
    writes replicated numpy from the primary only.  Cross-process sharded
    arrays pass through untouched."""
    if jax.process_count() == 1:
        return dict(state)
    import numpy as np

    def conv(x):
        if isinstance(x, jax.Array) and x.is_fully_addressable:
            return np.asarray(x)
        return x

    return jax.tree.map(conv, dict(state))


def save_train_state(logdir: str, step: int, state: Any,
                     max_checkpoints: Optional[int] = None) -> str:
    path = _ckpt_dir(logdir, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _multihost_safe(state), force=True)
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


def save_loader_state(logdir: str, step: int, state: dict) -> None:
    """Per-host data-loader position (ShardedCheckpointableLoader.state()),
    saved beside the step's checkpoint.  Per-host files: shards may differ
    in length by one, so (epoch, index) can differ across hosts."""
    import json

    path = _ckpt_dir(logdir, step)
    os.makedirs(path, exist_ok=True)
    marker = os.path.join(path, f"loader_state_p{jax.process_index()}.json")
    tmp = f"{marker}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, marker)


def load_loader_state(logdir: str, step: Optional[int] = None) -> Optional[dict]:
    import json

    if step is None:
        step = latest_checkpoint_step(logdir)
        if step is None:
            return None
    marker = os.path.join(_ckpt_dir(logdir, step),
                          f"loader_state_p{jax.process_index()}.json")
    if not os.path.exists(marker):
        return None  # pre-loader checkpoint: restart from the epoch head
    with open(marker) as f:
        return json.load(f)


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
    return ckptr.restore(path, _multihost_safe(abstract_state))
