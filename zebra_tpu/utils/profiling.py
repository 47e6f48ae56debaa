"""Observability: phase timers and device tracing.

The reference scatters manual wall-clock accumulators across the model
(t_tppr in the embedding module, reset_timer on TGN, t_index/t_real_update
in the updater — SURVEY.md §5); here timing is centralized:

- ``PhaseTimers`` — named wall-clock accumulators with an events counter,
  yielding the per-epoch log line schema (tppr/train/val seconds) plus an
  events/s rate, the framework's north-star metric.
- ``trace_context`` — wraps ``jax.profiler.trace`` so any region can be
  captured for TensorBoard/Perfetto with one line
  (``with trace_context("/tmp/trace"): ...``).

Device-side step costs are visible per phase because every phase is a
single XLA program (zebra_tpu.train.phase); the profiler trace shows its
internal schedule."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class PhaseTimers:
    def __init__(self):
        self.seconds: Dict[str, float] = defaultdict(float)
        self.events: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, n_events: int = 0) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            self.seconds[name] += time.time() - t0
            self.events[name] += n_events

    def rate(self, name: str) -> float:
        """events/s for a phase (0 when untimed)."""
        s = self.seconds.get(name, 0.0)
        return self.events.get(name, 0) / s if s > 0 else 0.0

    def reset(self):
        self.seconds.clear()
        self.events.clear()

    def summary(self) -> str:
        parts = []
        for name in sorted(self.seconds):
            part = f"{name}: {self.seconds[name]:.2f}s"
            if self.events.get(name):
                part += f" ({self.rate(name):.0f} ev/s)"
            parts.append(part)
        return ", ".join(parts)


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into ``log_dir`` (no-op when None)."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
