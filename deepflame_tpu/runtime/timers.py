"""Per-phase wall-clock instrumentation.

Role parity: the reference's manual time_monitor_* accumulators printed each
step (/root/reference/applications/solvers/dfLowMachFoam/dfLowMachFoam.C:
151-205, 534-593) and the chemistry pipeline timers (dfChemistryModel.H:
147-156). Plus a hook into jax.profiler for device-level traces (the TPU
answer to the reference's NVTX/cudaEvent macros, dfMatrixOpBase.H:42-75).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["PhaseTimers", "trace"]


class PhaseTimers:
    """Accumulating wall-clock timers; blocks on device work for honesty."""

    def __init__(self, sync: bool = True):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                try:
                    jax.effects_barrier()
                except Exception:
                    pass
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [f"{'phase':<24}{'total_s':>10}{'calls':>8}{'avg_ms':>10}{'%':>6}"]
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<24}{t:>10.3f}{n:>8}{1e3 * t / n:>10.2f}"
                         f"{100 * t / total:>6.1f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(out_dir: str):
    """jax.profiler trace context (view with TensorBoard/perfetto)."""
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
