"""Profiling and phase timing.

The reference only prints elapsed times around demo phases
(/root/reference/tools/demo_panst3r.py:214-215,250-253).  Here: first-class
`jax.profiler` trace capture plus a lightweight phase timer that
block-until-ready's its operands so device work is attributed correctly.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, *block_on):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict[str, dict]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_s": self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}

    def report(self) -> str:
        lines = []
        for k, v in sorted(self.summary().items(),
                           key=lambda kv: -kv[1]["total_s"]):
            lines.append(f"{k:32s} {v['total_s']:8.3f}s "
                         f"x{v['count']:<4d} ({v['mean_s'] * 1e3:8.2f} ms)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
