"""Benchmark harness — run on one real TPU chip; prints ONE JSON line.

Headline metric (BASELINE.md config 2): batched 2D bilinear interpolation,
64 grids of 256x256, 1M scattered queries, fp32 — queries/sec on the Pallas
MXU kernel.  ``vs_baseline`` is the speedup over this framework's own XLA
gather lowering of the identical computation (the reference repo publishes
no numbers — BASELINE.md — so the software baseline is the natural
denominator and stays comparable across rounds).

Timing methodology: the axon tunnel's ``block_until_ready`` does not actually
synchronise, the runtime dedupes repeated identical dispatches, and a host
readback costs ~28 ms RTT.  So every measurement chains K data-dependent
kernel iterations inside one jit and fits the slope between two K values —
pure device time, no RTT, no dedupe.

Extra (non-headline) numbers go to stderr: 1D lerp throughput, event-driven
map evaluation, and the Newton-solve wall-clock (BASELINE.md configs 1/3/4).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


from armadillocudalinearinterpolation_tpu.utils.cache import (
    enable_compilation_cache)
from armadillocudalinearinterpolation_tpu.utils.profiling import (
    chained_slope as _slope)

# Persistent compile cache: the Pallas evolve kernel's first Mosaic compile
# is minutes per shape; pay it once per machine, not per bench run.
enable_compilation_cache()


def bench_bilinear2d():
    """Config 2: 64 x 256x256 grids, 1M scattered fp32 queries."""
    from armadillocudalinearinterpolation_tpu.ops import interp, interp_pallas

    B, H, W = 64, 256, 256
    Q = 1_048_576 // B
    grids = jax.random.normal(jax.random.PRNGKey(0), (B, H, W), jnp.float32)
    pts0 = jax.random.uniform(jax.random.PRNGKey(1), (B, Q, 2), jnp.float32,
                              0.0, float(H) - 1.0)

    def chained(op):
        def make(K):
            @jax.jit
            def run():
                def body(_, p):
                    out = op(p)  # (B, Q)
                    r = (out * 977.0) % (H - 1.0)
                    return jnp.stack([r, (r * 1.7) % (W - 1.0)], axis=-1)
                return jnp.sum(jax.lax.fori_loop(0, K, body, pts0))
            return run
        return make

    s_pallas = _slope(chained(
        lambda p: interp_pallas.bilinear_batched(p, grids)), reps=5, stat=np.min)
    s_xla = _slope(chained(
        lambda p: interp.bilinear_batched(p, grids)), k_lo=1, k_hi=2, reps=2,
        stat=np.min)
    qps = B * Q / s_pallas
    return qps, s_pallas, s_xla


def bench_lerp1d():
    """Config 1 (scaled): 1k-node sin table, 10M fp32 queries."""
    from armadillocudalinearinterpolation_tpu.ops import interp_pallas

    n = 1000
    fp = jnp.sin(jnp.linspace(-3, 3, n, dtype=jnp.float32))
    Q = 10_000_000
    q0 = jax.random.uniform(jax.random.PRNGKey(2), (Q,), jnp.float32, -3, 3)

    def make(K):
        @jax.jit
        def run():
            def body(_, q):
                return interp_pallas.lerp1d(q, fp, -3.0, 6.0 / (n - 1)) * 2.9
            return jnp.sum(jax.lax.fori_loop(0, K, body, q0))
        return run

    # ~0.7 ms/iter is below the tunnel's RTT jitter: widen the K spread a bit
    # and take minima (min-to-min RTT jitter is ~0.4 ms).
    s = _slope(make, k_lo=1, k_hi=9, reps=7, stat=np.min)
    return Q / s


def bench_map_and_newton():
    """Configs 3-4: map evaluation at N=1024 and Newton solve at N=4096."""
    from armadillocudalinearinterpolation_tpu import (
        ModelConfig, MapParams, NewtonConfig, make_residual_fn, newton_solve)

    Z0 = jnp.array([0.3310, 0.6914, 1.3557], jnp.float32)
    key = jax.random.PRNGKey(0)

    # Map eval, reference workload shape (Driver.cu:19,69 at modern scale).
    cfg = ModelConfig(n_neurons=1024, n_real=1024, dtype="float32")
    params = MapParams.create(13.0589, 0.1, dtype="float32")
    F = make_residual_fn(cfg, params, key)

    # K is a traced argument: a Python-int bound would let XLA unroll the
    # chain into K copies of the Pallas map, multiplying Mosaic compile time
    # past the compile-helper's limit.  One rolled program serves every K.
    @jax.jit
    def run_k(k):
        def body(_, z):
            f = F(z)
            return z + 0.0 * f  # data dependence without drift
        return jnp.sum(jax.lax.fori_loop(0, k, body, Z0))

    def make(K):
        return lambda: run_k(jnp.int32(K))

    s_map = _slope(make, k_lo=1, k_hi=3, reps=2)

    # Newton wall-clock at N=4096 (tol 1e-8 target; fp32 floors near 1e-6).
    cfg4k = ModelConfig(n_neurons=4096, n_real=64, dtype="float32")
    F4k = make_residual_fn(cfg4k, params, key)
    ncfg = NewtonConfig(tolerance=1e-8, max_iterations=6, fd_epsilon=1e-3,
                        fd_mode="central")
    solve = jax.jit(lambda z: newton_solve(F4k, z, ncfg))
    res = solve(Z0)
    t0 = time.perf_counter()
    res = solve(Z0)
    norm = float(res.residual_norm)  # readback syncs
    t_solve = time.perf_counter() - t0
    return s_map, t_solve, int(res.iterations), norm


def main():
    extras = {}

    # The headline must survive anything: a crashed TPU worker or a failed
    # kernel compile degrades to an error record, never an empty stdout —
    # and the remaining (independent) benchmarks still run and report.
    qps = s_xla = s_pallas = None
    try:
        qps, s_pallas, s_xla = bench_bilinear2d()
        extras["bilinear2d_pallas_ms"] = round(s_pallas * 1e3, 3)
        extras["bilinear2d_xla_ms"] = round(s_xla * 1e3, 3)
    except Exception as e:
        extras["headline_error"] = str(e)[:300]

    try:
        extras["lerp1d_qps"] = round(bench_lerp1d() / 1e9, 3)
    except Exception as e:  # keep the headline alive
        extras["lerp1d_error"] = str(e)[:200]

    try:
        s_map, t_solve, iters, norm = bench_map_and_newton()
        extras["map_eval_N1024_R1024_ms"] = round(s_map * 1e3, 1)
        extras["newton_N4096_s"] = round(t_solve, 2)
        extras["newton_iters"] = iters
        extras["newton_final_norm"] = norm
    except Exception as e:
        extras["map_error"] = str(e)[:200]

    print(json.dumps(extras), file=sys.stderr)
    print(json.dumps({
        "metric": "batched_2d_bilinear_interp",
        "value": round(qps / 1e6, 1) if qps else 0.0,
        "unit": "Mqueries/s",
        "vs_baseline": round(s_xla / s_pallas, 2) if qps else 0.0,
    }))


if __name__ == "__main__":
    main()
