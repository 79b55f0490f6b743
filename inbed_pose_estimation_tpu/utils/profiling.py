"""Tracing / profiling subsystem.

The reference has none (SURVEY.md §5.1: tqdm bars only); since the
north-star metric is images/sec/chip this framework treats profiling as
first-class:
  * `StepTimer` — per-phase wall-clock EMA with images/sec derivation,
  * `trace(logdir)` — context manager around jax.profiler traces (view in
    TensorBoard / xprof),
  * `annotate(name)` — TraceAnnotation wrapper so named phases show up on
    the TPU timeline.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class StepTimer:
    """Windowed-mean phase timer.

    Phase times are arithmetic means since the last `reset()` — NOT a
    running EMA: an EMA seeded by the first (compile-heavy, ~100x) steps
    takes hundreds of steps to decay to steady state, so every printed
    line would still be compile-contaminated.  The trainer resets the
    window at each summary, making each printed line the honest mean of
    its own summary window.

    Usage:
        timer = StepTimer()
        with timer.phase("data"):
            batch = next(loader)
        with timer.phase("step"):
            state, metrics = train_step(state, batch)  # sync inside
        print(timer.summary(batch_size)); timer.reset()
    """

    def __init__(self, ema: float | None = None):  # ema kept for API compat
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @property
    def means(self) -> Dict[str, float]:
        return {k: self.totals[k] / self.counts[k]
                for k in self.totals if self.counts[k]}

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def images_per_sec(self, batch_size: int, phase: str = "step") -> float:
        m = self.means.get(phase, 0.0)
        return batch_size / m if m > 0 else 0.0

    def summary(self, batch_size: Optional[int] = None) -> str:
        parts = [f"{k}={v * 1000:.1f}ms" for k, v in sorted(self.means.items())]
        if batch_size and "step" in self.means:
            parts.append(f"ips={self.images_per_sec(batch_size):.1f}")
        return " ".join(parts)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the device timeline."""
    return jax.profiler.TraceAnnotation(name)
