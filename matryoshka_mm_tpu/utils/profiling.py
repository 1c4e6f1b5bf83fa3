"""Profiling & tracing hooks.

The reference has no built-in tracing (SURVEY.md §5: wall-clock logging
only); this module is the greenfield TPU observability layer: jax profiler
traces viewable in TensorBoard/Perfetto, named-span annotations that show up
on the TPU timeline, and a lightweight stage timer for host-side phases.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a device trace: ``with trace('/tmp/t'): step(...)``.

    Open the directory with TensorBoard's profile plugin or Perfetto.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that appears on the TPU timeline inside a trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Host-side stage timer writing a JSONL breakdown (data / H2D / step)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._t0: Dict[str, float] = {}
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: round(v / max(self.counts[k], 1), 6)
                for k, v in self.totals.items()}

    def dump(self):
        line = json.dumps({"avg_s": self.summary(), "totals_s":
                           {k: round(v, 4) for k, v in self.totals.items()}})
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        return line


def device_memory_stats() -> Dict[str, int]:
    """Per-device HBM usage when the backend exposes it."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            ms = d.memory_stats()
            out[str(d)] = {"bytes_in_use": ms.get("bytes_in_use", -1),
                           "bytes_limit": ms.get("bytes_limit", -1)}
        except Exception:
            out[str(d)] = {}
    return out
