"""Profiling helpers (SURVEY §5: the reference only has host-side sps
counters; on TPU we add first-class ``jax.profiler`` capture)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace (view with TensorBoard/XProf or
    Perfetto). Wrap a handful of steady-state train steps::

        with profiling.trace("/tmp/ppo-trace"):
            for _ in range(5):
                state, _ = step(state)
            jax.block_until_ready(state)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Steady-state env-steps/s meter with block_until_ready barriers
    (the reference's ``throughput/train_sps`` methodology)."""

    def __init__(self, steps_per_iter: int):
        self.steps_per_iter = steps_per_iter
        self._t0: Optional[float] = None
        self._iters = 0

    def start(self, barrier=None) -> None:
        if barrier is not None:
            jax.block_until_ready(barrier)
        self._t0 = time.perf_counter()
        self._iters = 0

    def tick(self) -> None:
        self._iters += 1

    def stop(self, barrier) -> float:
        jax.block_until_ready(barrier)
        elapsed = time.perf_counter() - self._t0
        return self.steps_per_iter * self._iters / elapsed
