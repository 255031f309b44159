"""Tracing / profiling utilities.

TPU-native replacements for the reference's three mechanisms (SURVEY.md §5):
CUDA-event phase timing (causal_inference.py:97-107,202-248), NVTX ranges
(interactive_causal_inference.py:36-106), and the cudaProfilerApi bracket for
nsys (interactive_inference.py:198-206):

- ``trace(logdir)``: XProf/TensorBoard trace capture via jax.profiler.
- ``annotate(name)``: named scope visible in traces (NVTX-range analogue).
- ``PhaseTimer``: wall-clock phase breakdown with device sync.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/longlive_xprof"):
    """Capture an XProf trace of the enclosed region (view in TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope for kernels inside jit (shows up in XProf like an NVTX
    range, e.g. around recache / block phases)."""
    return jax.named_scope(name)


class PhaseTimer:
    """Per-phase wall timing with block_until_ready sync, mirroring the
    reference's init/diffusion/block/vae/switch breakdown printouts."""

    def __init__(self):
        self.phases: Dict[str, List[float]] = {}
        self._t0: Optional[float] = None
        self._name: Optional[str] = None

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            self.phases.setdefault(name, []).append(time.perf_counter() - t0)

    def report(self) -> str:
        lines = ["Profiling results:"]
        total = sum(sum(v) for v in self.phases.values())
        for name, vals in self.phases.items():
            s = sum(vals)
            lines.append(
                f"  - {name}: {s*1e3:.2f} ms over {len(vals)} calls "
                f"({100*s/max(total,1e-9):.1f}%)"
            )
        lines.append(f"  - Total: {total*1e3:.2f} ms")
        return "\n".join(lines)
