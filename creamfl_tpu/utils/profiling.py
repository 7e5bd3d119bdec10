"""Tracing / profiling utilities.

The reference has none (SURVEY.md §5: tqdm bars only). TPU-native
observability: ``trace`` wraps a block in a jax.profiler trace viewable
in TensorBoard/Perfetto; ``StepTimer`` collects per-phase wall-clock
with device synchronization, reported per federated round.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace when a log dir is given, no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Named phase timers with a per-round report line.

    Forces completion of ``sync`` pytrees before reading the clock so
    async dispatch doesn't misattribute time.
    """

    def __init__(self, logger=None):
        self.logger = logger
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        """``sync`` may be a pytree or a zero-arg callable returning one
        (use a callable when the phase replaces/donates the state — a
        pytree captured at entry would reference deleted buffers)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync() if callable(sync) else sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self, round_n: int) -> Dict[str, float]:
        summary = {f"{k}_s": round(v, 3) for k, v in self.totals.items()}
        if self.logger:
            parts = " ".join(f"{k}={v}" for k, v in sorted(
                summary.items()))
            self.logger.log(f"round {round_n} timing | {parts}")
        self.totals.clear()
        self.counts.clear()
        return summary
