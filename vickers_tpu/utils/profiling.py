"""Tracing / profiling (SURVEY §5 observability plan).

The reference's only timing is wall-clock epoch seconds and GUI stage
timers (train.py:631,657; ui_infer_rectangle.py:748-752).  Here:

- ``trace(dir)``: context manager around ``jax.profiler`` — captures a
  full XLA trace (HLO timings, HBM usage) viewable in TensorBoard/Perfetto.
- ``StageTimer``: the GUI-style per-stage wall timer, reusable anywhere.
- ``device_memory_stats``: per-device HBM allocation snapshot.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional, Tuple


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Profile the enclosed block with jax.profiler if log_dir is set."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates named wall-clock stages (ms), like the GUI log pane."""

    def __init__(self) -> None:
        self.stages: List[Tuple[str, float]] = []
        self._t = time.perf_counter()

    def mark(self, name: str) -> float:
        now = time.perf_counter()
        ms = (now - self._t) * 1e3
        self.stages.append((name, ms))
        self._t = now
        return ms

    def as_dict(self) -> Dict[str, float]:
        return dict(self.stages)

    def format(self) -> str:
        return " | ".join(f"{n} {ms:.1f}ms" for n, ms in self.stages)


def device_memory_stats() -> List[Dict]:
    import jax

    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        out.append({
            "device": str(d),
            "bytes_in_use": s.get("bytes_in_use"),
            "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            "bytes_limit": s.get("bytes_limit"),
        })
    return out
