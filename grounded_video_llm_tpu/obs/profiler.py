"""Profiling hooks: jax.profiler traces + per-phase wall timers.

The reference has no tracing at all (SURVEY §5.1 — a tqdm bar and unwired
step-time deques). Here: a context manager around jax.profiler for TensorBoard
-viewable device traces, named trace annotations for phases, and a lightweight
wall-clock phase timer with an explicit device barrier (on the axon backend
block_until_ready is not a reliable barrier — bench.py:62 — so the timer
fetches a scalar probe)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax
import numpy as np


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the device timeline)."""
    return jax.profiler.TraceAnnotation(name)


def sync(x=None):
    """Hard device barrier: fetch a scalar derived from x (or a dummy)."""
    if x is None:
        return
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[0])[0])


class PhaseTimer:
    """Accumulating wall-clock timer for pipeline phases (decode, preprocess,
    encode, prefill, decode-loop...)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, barrier_on=None):
        t0 = time.time()
        try:
            yield
        finally:
            sync(barrier_on)
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {name: {"total_s": self.totals[name],
                       "count": self.counts[name],
                       "mean_s": self.totals[name] / max(self.counts[name], 1)}
                for name in self.totals}

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items(),
                              key=lambda kv: -kv[1]["total_s"]):
            lines.append(f"{name:>16}: {s['mean_s']*1000:8.1f} ms/call "
                         f"x{s['count']} = {s['total_s']:.2f}s")
        return "\n".join(lines)
