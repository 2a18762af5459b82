"""Tracing / profiling utilities.

Parity (WHAT): the reference's ubiquitous chrono spans with running averages
logged per stage (feature+intramatch time, tracking time, backend time,
SURVEY §5 — e.g. /root/reference/MCApps/src/mc_slam_app.cpp:770-792),
plus integration with the JAX device profiler for trace capture.

Caveat for tunneled TPU backends: jax.block_until_ready can resolve before
device completion; `sync()` materializes a scalar to host, which is the only
reliable fence (this is also what bench.py uses).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


def sync(x) -> None:
    """Reliable device fence: materialize (a tiny slice of) x to host."""
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]


class StageTimers:
    """Named span timers with running averages (VLOG-style stage stats)."""

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)
        self.last = {}

    @contextlib.contextmanager
    def span(self, name: str, fence=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                sync(fence)
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1
            self.last[name] = dt

    def mean_ms(self, name: str) -> float:
        c = self.count.get(name, 0)
        return 1e3 * self.total[name] / c if c else 0.0

    def report(self) -> str:
        lines = []
        for name in sorted(self.total):
            lines.append(
                f"{name}: mean {self.mean_ms(name):.2f} ms over "
                f"{self.count[name]} calls (last {self.last[name]*1e3:.2f} ms)"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a JAX profiler trace (open with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
