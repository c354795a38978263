"""Observability: structured logs, per-stage counters, profiler hook.

The reference's only diagnostics are stderr printfs (dbg_printf/err_printf,
mlvfs.h:118-144) and the dual-ISO analysis lines printed per clip
(hdr.c:622,820-822,1870). Here:

  - `log` — a standard logger ("mlvfs_tpu"); the dual-ISO engine emits the
    same analysis facts (ISO pattern, white levels, fitted EV) at DEBUG;
  - `metrics` — process-wide per-stage wall time + frame/byte counters,
    reported by the CLI after conversion (the north-star numbers:
    frames/sec/chip, bytes in/out, per-stage time);
  - `trace` — context manager that wraps a region in a jax.profiler trace
    when MLVFS_TPU_PROFILE=<dir> is set.
"""

from __future__ import annotations

import contextlib
import logging
import os
import threading
import time

log = logging.getLogger("mlvfs_tpu")
if not log.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
    log.addHandler(_h)
    log.setLevel(os.environ.get("MLVFS_TPU_LOG", "WARNING").upper())


class _Metrics:
    def __init__(self):
        self._lock = threading.Lock()
        self.stage_seconds = {}
        self.counters = {}

    def add_time(self, stage: str, seconds: float):
        with self._lock:
            self.stage_seconds[stage] = self.stage_seconds.get(stage, 0.0) + seconds

    def count(self, name: str, n: int = 1):
        with self._lock:
            self.counters[name] = self.counters.get(name, 0) + n

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "stage_seconds": dict(self.stage_seconds),
                "counters": dict(self.counters),
            }

    def reset(self):
        with self._lock:
            self.stage_seconds.clear()
            self.counters.clear()

    def report(self) -> str:
        snap = self.snapshot()
        # stages run concurrently (readback/write overlap the next batch's
        # decode/process), so stage times do not sum to wall-clock
        lines = ["  (stages overlap; columns do not sum to wall time)"]
        frames = snap["counters"].get("frames", 0)
        for stage, secs in sorted(snap["stage_seconds"].items()):
            per = f" ({frames / secs:.1f} fps)" if frames and secs > 0 else ""
            lines.append(f"  {stage:<12} {secs:8.3f}s{per}")
        for name, value in sorted(snap["counters"].items()):
            lines.append(f"  {name:<12} {value}")
        return "\n".join(lines)


metrics = _Metrics()


class StageTimer:
    """with StageTimer('decode'): ... — accumulates into `metrics`."""

    def __init__(self, stage: str):
        self.stage = stage

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        metrics.add_time(self.stage, time.perf_counter() - self.t0)
        return False


@contextlib.contextmanager
def trace(name: str):
    """jax.profiler trace for the region when MLVFS_TPU_PROFILE is set."""
    profile_dir = os.environ.get("MLVFS_TPU_PROFILE")
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        with jax.profiler.TraceAnnotation(name):
            yield
