"""Tracing and per-step timing.

The reference has no profiling story at all (SURVEY.md §5: tqdm bars and
wall-clock prints only, src/Trainer01.py:291). On TPU the two tools that
matter are (a) XLA profiler traces viewable in TensorBoard/XProf — captured
here with `trace()` / the trainer's `profiling` config block — and (b)
dispatch-to-dispatch step timing, which `StepTimer` aggregates into
mean/percentile stats and rays/s. Host wall clock between device dispatches
is the honest number on this hardware: device-side events are asynchronous
and `block_until_ready` is unreliable over remote-relay backends, so timing
must bracket a host-synchronizing read (the trainer's loss fetch).
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Optional


@contextlib.contextmanager
def trace(logdir: Path, create_perfetto_trace: bool = False):
    """Capture a jax.profiler trace into `logdir` (view with TensorBoard's
    profile plugin or Perfetto). No-op if the profiler is unavailable
    (e.g. already active, or unsupported backend)."""
    import jax

    logdir = Path(logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    started = False
    try:
        jax.profiler.start_trace(str(logdir), create_perfetto_trace=create_perfetto_trace)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StepTimer:
    """Rolling step-time statistics (host wall clock between completions).

    Call `tick()` once per completed step (or pass `steps=k` for fused
    multi-step dispatches). `stats()` returns mean/p50/p90/max step
    milliseconds and steps/s over the retained window.
    """

    def __init__(self, window: int = 512, rays_per_step: int = 0):
        self.window = window
        self.rays_per_step = rays_per_step
        self._last: Optional[float] = None
        self._samples: list[float] = []  # per-step seconds

    def reset(self) -> None:
        self._last = None
        self._samples.clear()

    def tick(self, steps: int = 1) -> Optional[float]:
        """Record a completion; returns per-step seconds for this tick."""
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            return None
        dt = (now - self._last) / max(steps, 1)
        self._last = now
        self._samples.extend([dt] * max(steps, 1))
        if len(self._samples) > self.window:
            del self._samples[: len(self._samples) - self.window]
        return dt

    def stats(self) -> dict:
        if not self._samples:
            return {}
        s = sorted(self._samples)
        n = len(s)
        mean = sum(s) / n
        out = {
            "step_ms_mean": mean * 1e3,
            "step_ms_p50": s[n // 2] * 1e3,
            "step_ms_p90": s[min(n - 1, (9 * n) // 10)] * 1e3,
            "step_ms_max": s[-1] * 1e3,
            "steps_per_s": 1.0 / mean,
        }
        if self.rays_per_step:
            out["rays_per_s"] = self.rays_per_step / mean
        return out

    def dump(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(self.stats(), indent=2))
