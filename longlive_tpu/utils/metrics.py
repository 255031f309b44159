"""Metrics / telemetry interface.

The reference logs to wandb on rank 0 (trainer/distillation.py:72-83,
1320-1358) and calls NVIDIA One Logger lifecycle hooks (distillation.py:
88-125 — an interface whose module is absent from the repo/PyPI; treated
here, as in SURVEY.md §5, as an optional-telemetry interface).

``MetricsLogger`` multiplexes: JSONL file (always), wandb (if importable and
configured), and lifecycle callbacks (the One Logger analogue).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, List, Optional


class MetricsLogger:
    def __init__(self, logdir: str = "logs", wandb_config: Optional[dict] = None,
                 is_main_process: bool = True):
        self.is_main = is_main_process
        self.path = os.path.join(logdir, "metrics.jsonl")
        self._wandb = None
        self._callbacks: List[Callable[[str, dict], None]] = []
        if self.is_main:
            os.makedirs(logdir, exist_ok=True)
            if wandb_config:
                try:
                    import wandb

                    wandb.init(**wandb_config)
                    self._wandb = wandb
                except Exception:
                    pass

    def add_lifecycle_callback(self, fn: Callable[[str, dict], None]):
        """One Logger-style lifecycle hook: fn(event_name, payload)."""
        self._callbacks.append(fn)

    def event(self, name: str, payload: Optional[dict] = None):
        for fn in self._callbacks:
            fn(name, payload or {})

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        if not self.is_main:
            return
        row = dict(metrics)
        row["ts"] = time.time()
        if step is not None:
            row["step"] = step
        with open(self.path, "a") as f:
            f.write(json.dumps(row, default=float) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
