"""Tracing/profiling utilities.

The reference annotates the field MLP with autograd profiler ranges
("resblock", "resnetfc_infer", ref scenerf/models/resnetfc.py:7,55,140) but
ships no profiler driver. Here: jax.named_scope carries the same annotations
into XLA/HLO op names (visible in XProf/Perfetto), and `trace()` is a complete
capture driver around jax.profiler.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax

named_scope = jax.named_scope


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a device+host profile viewable in XProf/TensorBoard:

        with profiling.trace("/tmp/scenerf_trace"):
            state, m = trainer.train_step(state, batch, key)
            jax.block_until_ready(m["total_loss"])
    """
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timer for throughput logs (host-side, no device sync)."""

    def __init__(self, window: int = 20):
        self.window = window
        self.times: list = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.time()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")
