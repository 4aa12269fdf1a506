"""Tracing / profiling helpers (new subsystem — the reference has none).

* `trace(logdir)` — context manager around `jax.profiler` emitting a
  TensorBoard-compatible device trace of everything executed inside.
* `Throughput` — simple steady-state frames/s meter with device sync.

NB: on remote-tunneled backends `jax.block_until_ready` may return before
execution completes; `Throughput` therefore syncs with `jax.device_get`.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as exc:  # profiling unsupported on some backends
        print(f"[profiling] trace unavailable: {exc}")
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


@dataclass
class Throughput:
    """Accumulates (frames, seconds) across timed steps."""

    frames: int = 0
    seconds: float = 0.0
    _laps: List[float] = field(default_factory=list)

    def step(self, fn, *args, frames: int):
        """Run fn(*args), sync, and record the elapsed wall-clock."""

        import jax

        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        dt = time.perf_counter() - t0
        self.frames += frames
        self.seconds += dt
        self._laps.append(dt)
        return out

    @property
    def fps(self) -> float:
        return self.frames / self.seconds if self.seconds > 0 else float("nan")

    def report(self) -> str:
        best = min(self._laps) if self._laps else float("nan")
        return (
            f"{self.frames} frames in {self.seconds:.3f}s — "
            f"{self.fps:.0f} frames/s (best step {best * 1e3:.1f} ms)"
        )


__all__ = ["trace", "Throughput"]
