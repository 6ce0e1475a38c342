"""Observability: per-iteration tracing, throughput meters, profiling.

The reference's tracing surface (SURVEY.md section 5): per-iteration logL +
step-kind lines at verbosity > MINIMAL (stop, em_alg.c:123-136), wall-clock
stamps, and the repeat-timing harness.  TPU-native additions: an
iterations/sec + genotype-cells/sec meter and a jax.profiler context.
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Optional

from multiclust_tpu.messages import Verbosity

MINIMAL = Verbosity.MINIMAL  # message.h:45-53


def make_trace_printer(verbosity: int, out=None):
    """Per-iteration trace matching the reference's format
    ('%4d (EM): %.2f (delta): %.5g', em_alg.c:123-136); returns None when
    the verbosity gates it off."""
    if verbosity <= MINIMAL:
        return None
    out = out or sys.stderr
    last = {"ll": None}

    def trace(state, kind="EM"):
        ll = float(state.logL)
        prev = last["ll"]
        delta = float("inf") if prev is None else ll - prev
        out.write("%4d (%s): %.2f (delta): %.5g\n"
                  % (int(state.n_iter), kind, ll, delta))
        last["ll"] = ll

    return trace


class ThroughputMeter:
    """EM iterations/sec and genotype-cells/sec/chip (BASELINE.md metric)."""

    def __init__(self, cells_per_iter: int, n_chips: int = 1):
        self.cells_per_iter = cells_per_iter
        self.n_chips = max(n_chips, 1)
        self.n_iter = 0
        self.t0 = time.perf_counter()

    def update(self, n_iter: int):
        self.n_iter = n_iter

    @property
    def seconds(self) -> float:
        return time.perf_counter() - self.t0

    @property
    def iters_per_sec(self) -> float:
        return self.n_iter / max(self.seconds, 1e-9)

    @property
    def cells_per_sec_per_chip(self) -> float:
        return self.iters_per_sec * self.cells_per_iter / self.n_chips

    def report(self) -> str:
        return (f"{self.n_iter} EM iterations in {self.seconds:.2f}s = "
                f"{self.iters_per_sec:.1f} it/s, "
                f"{self.cells_per_sec_per_chip:.3e} cells/s/chip")


@contextlib.contextmanager
def profile(log_dir: Optional[str]):
    """jax.profiler trace context (no-op when log_dir is falsy)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
