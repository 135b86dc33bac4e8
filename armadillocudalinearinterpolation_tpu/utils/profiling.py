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


def device_time(step: Callable[[jax.Array], jax.Array], x0: jax.Array,
                *, k_lo: int = 1, k_hi: int = 9, reps: int = 5) -> float:
    """Median per-iteration device seconds of ``step`` (a data-dependent
    ``x -> x`` function), measured by chained-K slope."""
    def make(K):
        @jax.jit
        def run():
            return jax.numpy.sum(
                jax.lax.fori_loop(0, K, lambda i, x: step(x), x0))
        return run

    med = {}
    for k in (k_lo, k_hi):
        f = make(k)
        float(f())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f())
            ts.append(time.perf_counter() - t0)
        med[k] = float(np.min(ts))
    return max((med[k_hi] - med[k_lo]) / (k_hi - k_lo), 1e-9)
