"""Profiling and timing helpers (SURVEY.md §5: the reference has no
profiling hooks at all; wall-clock was measured externally).

Two tools:
  * :func:`trace` — context manager around ``jax.profiler`` producing a
    TensorBoard/perfetto trace directory.
  * :func:`device_time` — robust kernel timing on this machine's tunneled
    TPU, where ``block_until_ready`` does not synchronise and repeated
    identical dispatches are deduped: chains ``K`` data-dependent iterations
    inside one jit and fits the slope between two chain lengths (the same
    methodology as ``bench.py``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/trace"):`` — profile the enclosed device work."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chained_slope(make_run: Callable[[int], Callable[[], jax.Array]],
                  *, k_lo: int = 1, k_hi: int = 5, reps: int = 3,
                  stat=np.median) -> float:
    """Per-iteration device seconds via chained-K slope fitting.

    ``make_run(K)`` must return a zero-arg jitted function chaining K
    data-dependent iterations and returning a scalar; the host readback of
    that scalar is the only reliable synchronisation point on this machine's
    tunneled TPU.  This is the single timing primitive shared by
    ``bench.py`` and :func:`device_time`.
    """
    med = {}
    for k in (k_lo, k_hi):
        f = make_run(k)
        float(f())  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f())
            ts.append(time.perf_counter() - t0)
        med[k] = float(stat(ts))
    slope = (med[k_hi] - med[k_lo]) / (k_hi - k_lo)
    if slope <= 0.0:
        # Timing noise swamped the K-spread: med[k_hi] <= med[k_lo] is not a
        # measurement, it's jitter.  Report NaN so callers (bench.py) surface
        # an invalid run instead of an absurd throughput.
        return float("nan")
    return slope


def device_time(step: Callable[[jax.Array], jax.Array], x0: jax.Array,
                *, k_lo: int = 1, k_hi: int = 9, reps: int = 5) -> float:
    """Min-statistic per-iteration device seconds of ``step`` (a
    data-dependent ``x -> x`` function), via :func:`chained_slope`."""
    def make(K):
        @jax.jit
        def run():
            return jax.numpy.sum(
                jax.lax.fori_loop(0, K, lambda i, x: step(x), x0))
        return run

    return chained_slope(make, k_lo=k_lo, k_hi=k_hi, reps=reps, stat=np.min)
