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

Emission protocol (VERDICT r3 #1): the cumulative record — headline fields
plus every extras key measured so far — is re-printed as one JSON line on
stdout after EVERY stage, so the last complete stdout line is always the
full record-so-far and a driver timeout can only truncate coverage, never
zero it.  Judged stages (BASELINE.md configs 2/4/5/3) run first and
unconditionally; the remaining stages are skipped once the wall-clock
budget (BENCH_BUDGET_S, default 1500 s) is spent, each skip recorded.

Variance control (VERDICT r4 #1): a tunnel-health probe (dispatch RTT + a
fixed matmul kernel's device time) brackets the run, and leftover budget
re-measures the judged metrics — the recorded key is the best pass, with
``<key>_spread`` = [min, max] distinguishing tunnel drift from a code
regression in-record.
"""

from __future__ import annotations

import json
import os
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

# ---------------------------------------------------------------------------
# Wall-clock budget (VERDICT r3 #1: one slow stage must never zero the whole
# round's record).  The driver's observed window is ~29 min; default to 25 so
# the final emission always lands.  Judged stages always run; optional stages
# are skipped once the budget is spent (each skip is recorded).
_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T0)


def _chained(op, pts0, H, W):
    """Chained-iteration maker for the 2D benches: K data-dependent interp
    calls in one jit (each output feeds the next query set via cheap
    modulos), so the fitted slope isolates the op from the tunnel's
    dispatch latency.  Shared by every bilinear bench — the chaining
    recipe must stay identical across them."""
    def make(K):
        @jax.jit
        def run():
            def body(_, pp):
                o = op(pp)
                rr = (o * 977.0) % (H - 1.0)
                return jnp.stack([rr, (rr * 1.7) % (W - 1.0)], axis=-1)
            return jnp.sum(jax.lax.fori_loop(0, K, body, pts0))
        return run
    return make


def tunnel_probe():
    """Tunnel-health probe (VERDICT r4 #1b): dispatch+readback latency and
    a FIXED reference kernel's per-iteration device time, recorded at bench
    start AND end so a slow judged stage is attributable in-record — the
    r04 headline spread (415-477 Mq/s across same-day runs of identical
    code) had no in-record way to distinguish tunnel drift from a kernel
    regression.  The reference kernel (chained 512x512 f32 matmuls) touches
    neither this framework's kernels nor its configs, so its drift is pure
    environment."""
    # 2048^2, not 512^2: the 512 chain's ~0.5 ms of device signal across
    # the K spread drowned in the ~25 ms RTT's jitter and the slope fit
    # returned NaN (recorded as null) in the round-5 shakeout run 2 —
    # ~0.35 ms/iter x 64 iters of spread gives ~22 ms of signal instead
    x = jax.random.normal(jax.random.PRNGKey(42), (2048, 2048), jnp.float32)
    # dispatch+readback RTT: tiny op, host float() sync
    f_tiny = jax.jit(lambda v: jnp.sum(v[:8, :8]))
    float(f_tiny(x))  # warm
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f_tiny(x))
        rtts.append(time.perf_counter() - t0)

    def make(K):
        @jax.jit
        def run():
            def body(_, m):
                mm = m @ x
                return mm / (1.0 + jnp.abs(mm[0, 0]))   # data dependence
            return jnp.sum(jax.lax.fori_loop(0, K, body, x))
        return run

    s = _slope(make, k_lo=2, k_hi=66, reps=5, stat=np.min)
    return {"rtt_ms": round(min(rtts) * 1e3, 1),
            "matmul2048_us": round(s * 1e6, 1)}


def bench_bilinear2d(measure_xla: bool = True):
    """Config 2: 64 x 256x256 grids, 1M scattered fp32 queries.

    ``measure_xla=False`` re-measures only the judged Pallas slope
    (variance-control passes, VERDICT r4 #1a — the XLA baseline is not
    tunnel-sensitive enough to justify re-paying its ~12 s)."""
    from armadillocudalinearinterpolation_tpu.ops import interp, interp_pallas

    B, H, W = 64, 256, 256
    Q = 1_048_576 // B
    grids = jax.random.normal(jax.random.PRNGKey(0), (B, H, W), jnp.float32)
    pts0 = jax.random.uniform(jax.random.PRNGKey(1), (B, Q, 2), jnp.float32,
                              0.0, float(H) - 1.0)

    def chained(op):
        return _chained(op, pts0, H, W)

    # wide K spread: at ~2-3 ms/iter the device signal must dominate the
    # tunnel's ~0.5-1 ms min-to-min RTT jitter, or the fitted slope can
    # overshoot physical peak (a >100% MFU reading is a measurement bug —
    # k_hi=17 still read 102.6% MFU in one 2026-08-20 tunnel state, so
    # the spread doubled to 32 device-ms of signal)
    s_pallas = _slope(chained(
        lambda p: interp_pallas.bilinear_batched(p, grids)),
        k_lo=1, k_hi=33, reps=7, stat=np.min)
    s_xla = _slope(chained(
        lambda p: interp.bilinear_batched(p, grids)), k_lo=1, k_hi=2, reps=2,
        stat=np.min) if measure_xla else float("nan")
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


def bench_lerp1d_64k():
    """Large-table 1D lerp: 64k-node table, 2M queries.

    Routes to the sort-for-locality path (``lerp1d_binned``): batched value
    sort -> dynamic-span chunk sweep -> batched restore sort (VERDICT r2
    item #4; the round-2 rolled chunk sweep measured 0.172 Gq/s here).
    """
    from armadillocudalinearinterpolation_tpu.ops import interp, interp_pallas

    n = 65536
    fp = jnp.sin(jnp.linspace(-3, 3, n, dtype=jnp.float32))
    Q = 2_097_152
    q0 = jax.random.uniform(jax.random.PRNGKey(3), (Q,), jnp.float32, -3, 3)
    dx = 6.0 / (n - 1)

    out = interp_pallas.lerp1d(q0, fp, -3.0, dx)
    ref = interp.lerp_uniform(q0, fp, -3.0, dx)
    err = float(jnp.max(jnp.abs(out - ref)))

    def make(K):
        @jax.jit
        def run():
            # keep every chained iteration UNIFORM over the table: feeding
            # the interpolant back as the next queries (`val * 2.9`) makes
            # iterations >= 1 arcsine-distributed (bimodal at +-2.9), and
            # the column group straddling the gap then sweeps the whole
            # table — measured 2x below the uniform-query number this
            # metric is defined as.  An ulp-scale data-dependent shift of
            # q0 keeps the distribution while defeating CSE.
            def body(_, q):
                val = interp_pallas.lerp1d(q, fp, -3.0, dx)
                return q0 + 1e-6 * val
            return jnp.sum(jax.lax.fori_loop(0, K, body, q0))
        return run

    # unstable sorts took per-iteration cost to ~2 ms: a K-spread of 4 sat
    # inside tunnel jitter and sporadically fit a NaN slope — widen it
    s = _slope(make, k_lo=1, k_hi=13, reps=7, stat=np.min)
    return Q / s, err


def bench_interp1d_nonuniform():
    """Non-uniform nodes (arma::interp1 general semantics), 4k nodes, 2M q."""
    from armadillocudalinearinterpolation_tpu.ops import interp, interp_pallas

    n = 4096
    key = jax.random.PRNGKey(4)
    gaps = 0.1 + jax.random.uniform(key, (n - 1,), jnp.float32)
    xp = jnp.concatenate([jnp.zeros(1), jnp.cumsum(gaps)])
    fp = jnp.sin(0.05 * xp)
    Q = 2_097_152
    q0 = jax.random.uniform(jax.random.PRNGKey(5), (Q,), jnp.float32,
                            -1.0, float(xp[-1]) + 1.0)

    f = interp_pallas.make_interp1d(xp, fp)
    err = float(jnp.max(jnp.abs(f(q0) - interp.interp1d(q0, xp, fp))))

    def make(K):
        @jax.jit
        def run():
            def body(_, q):
                # ulp-scale data-dependent shift: keeps the query
                # distribution uniform over the table (f(q)*2.9 as the
                # next queries concentrated everything in the first ~2
                # chunks of the ~2000-wide domain, flattering the sweep)
                # while defeating CSE across iterations
                return q0 + 1e-6 * f(q)
            return jnp.sum(jax.lax.fori_loop(0, K, body, q0))
        return run

    s = _slope(make, k_lo=1, k_hi=13, reps=7, stat=np.min)
    return Q / s, err


def bench_bilinear2d_f64():
    """BASELINE config 2, fp64 leg, two on-chip paths: the Pallas hi/lo
    corner-gather kernel (f64-exact, fast) and XLA f64 emulation (slow
    baseline) — both validated against host numpy double."""
    from armadillocudalinearinterpolation_tpu.ops import interp, interp_pallas

    jax.config.update("jax_enable_x64", True)
    B, H, W = 16, 256, 256
    Q = 16384
    grids = jax.random.normal(jax.random.PRNGKey(6), (B, H, W), jnp.float64)
    pts0 = jax.random.uniform(jax.random.PRNGKey(7), (B, Q, 2), jnp.float64,
                              0.0, float(H) - 1.0)
    out = interp.bilinear_batched(pts0, grids)

    # host-double oracle
    g = np.asarray(grids)
    p = np.asarray(pts0)
    r = np.clip(p[..., 0], 0, H - 1.0)
    c = np.clip(p[..., 1], 0, W - 1.0)
    r0 = np.clip(np.floor(r).astype(int), 0, H - 2)
    c0 = np.clip(np.floor(c).astype(int), 0, W - 2)
    tr, tc = r - r0, c - c0
    bi = np.arange(B)[:, None]
    ref = ((1 - tr) * (1 - tc) * g[bi, r0, c0]
           + (1 - tr) * tc * g[bi, r0, c0 + 1]
           + tr * (1 - tc) * g[bi, r0 + 1, c0]
           + tr * tc * g[bi, r0 + 1, c0 + 1])
    err = float(np.max(np.abs(np.asarray(out) - ref)))

    out_p = interp_pallas.bilinear_batched_f64(pts0, grids)
    err_p = float(np.max(np.abs(np.asarray(out_p) - ref)))

    def chained(op):
        return _chained(op, pts0, H, W)

    s_xla = _slope(chained(lambda p: interp.bilinear_batched(p, grids)),
                   k_lo=1, k_hi=3, reps=3, stat=np.min)
    s_pal = _slope(chained(
        lambda p: interp_pallas.bilinear_batched_f64(p, grids)),
        k_lo=1, k_hi=5, reps=3, stat=np.min)
    return B * Q / s_xla, err, B * Q / s_pal, err_p


def bench_bilinear2d_binned_1024():
    """Grid-size scaling leg of config 2: 8 grids of 1024x1024, 1M queries.

    Past ~512x512 the full tent kernel exceeds TPU scoped VMEM; the
    2D-binned path (sort queries into ~120x120 bins, each bin one 128x128
    full-K MXU tile, dynamic group loop — ops/interp_pallas.py) keeps
    near-flat per-query cost in grid size.
    """
    from armadillocudalinearinterpolation_tpu.ops import interp, interp_pallas

    B, H, W = 8, 1024, 1024
    Q = 1_048_576 // B
    grids = jax.random.normal(jax.random.PRNGKey(8), (B, H, W), jnp.float32)
    pts0 = jax.random.uniform(jax.random.PRNGKey(9), (B, Q, 2), jnp.float32,
                              0.0, float(H) - 1.0)
    err = float(jnp.max(jnp.abs(
        interp_pallas.bilinear_batched(pts0, grids, method="binned")
        - interp.bilinear_batched(pts0, grids))))

    def chained(op):
        return _chained(op, pts0, H, W)

    s_binned = _slope(chained(
        lambda p: interp_pallas.bilinear_batched(p, grids, method="binned")),
        k_lo=1, k_hi=9, reps=5, stat=np.min)
    s_xla = _slope(chained(lambda p: interp.bilinear_batched(p, grids)),
                   k_lo=1, k_hi=2, reps=2, stat=np.min)
    return B * Q / s_binned, s_binned, s_xla, err


def bench_pallas_parity():
    """VERDICT #2: driver-captured Pallas-vs-XLA evolve parity on real TPU.

    Max |Delta f| between the two evolve backends at the reference point
    (reference contract: EvolveKernel, EventDrivenMap.cu:575-674).

    The f32 backends are compared at the judged N=1024 shape; the
    emulated-f64 anchor runs at N=512, R=64 (VERDICT r3 #3 — the
    f32-vs-f64 delta it validates is shape-independent, and the emulated
    evolve is the ~13 s/eval path the replay exists to avoid)."""
    from armadillocudalinearinterpolation_tpu import (
        ModelConfig, MapParams, event_driven_map)

    jax.config.update("jax_enable_x64", True)
    Z = jnp.array([0.3310, 0.6914, 1.3557], jnp.float32)
    key = jax.random.PRNGKey(0)
    params = MapParams.create(13.0589, 0.1, dtype="float32")
    cfg = ModelConfig(n_neurons=1024, n_real=256, dtype="float32")
    f_p = event_driven_map(cfg, params, key, Z, evolve_backend="pallas")
    f_x = event_driven_map(cfg, params, key, Z, evolve_backend="xla")
    # windowed variant must agree with the full kernel exactly
    cfg_w = ModelConfig(n_neurons=1024, n_real=256, dtype="float32",
                        evolve_window=128)
    f_w = event_driven_map(cfg_w, params, key, Z, evolve_backend="pallas")
    # anchor both f32 backends against the on-chip f64 map (same key/draws):
    # the meaningful claim is that the Pallas kernel adds no error beyond
    # f32 itself, not that two f32 op orders agree bitwise
    cfg_s = ModelConfig(n_neurons=512, n_real=64, dtype="float32",
                        evolve_window=128)
    f_p_s = event_driven_map(cfg_s, params, key, Z, evolve_backend="pallas")
    f_x_s = event_driven_map(cfg_s, params, key, Z, evolve_backend="xla")
    cfg64 = ModelConfig(n_neurons=512, n_real=64, dtype="float64",
                        root_tol=1e-12, evolve_window=128)
    params64 = MapParams.create(13.0589, 0.1, dtype="float64")
    f_64 = event_driven_map(cfg64, params64, key, Z.astype(jnp.float64),
                            evolve_backend="xla")
    d_p64 = float(jnp.max(jnp.abs(f_p_s.astype(jnp.float64) - f_64)))
    d_x64 = float(jnp.max(jnp.abs(f_x_s.astype(jnp.float64) - f_64)))
    return (float(jnp.max(jnp.abs(f_p - f_x))),
            float(jnp.max(jnp.abs(f_w - f_p))), d_p64, d_x64)


def bench_shard_map_pallas():
    """VERDICT r3 #5: the shard_map + Pallas combination executed for real.

    The CPU virtual-mesh tests exercise ``make_shard_map_residual_fn`` with
    the XLA backend only (the Pallas kernel needs a TPU); here the Pallas
    evolve runs under ``shard_map`` on a 1-device mesh on the real chip and
    must reproduce the unsharded Pallas map evaluated with the same
    per-device key fold (identical draws, trivial psum -> delta ~ 0).
    """
    from armadillocudalinearinterpolation_tpu import (
        ModelConfig, MapParams, event_driven_map)
    from armadillocudalinearinterpolation_tpu.parallel import (
        make_mesh, make_shard_map_residual_fn)

    cfg = ModelConfig(n_neurons=1024, n_real=256, dtype="float32",
                      evolve_window=128)
    params = MapParams.create(13.0589, 0.1, dtype="float32")
    key = jax.random.PRNGKey(0)
    Z = jnp.array([0.3310, 0.6914, 1.3557], jnp.float32)
    mesh = make_mesh({"real": 1})
    F = make_shard_map_residual_fn(cfg, params, key, mesh,
                                   evolve_backend="pallas")
    with mesh:
        f_sharded = jax.jit(F)(Z)
        f_sharded = np.asarray(f_sharded)
    # unsharded reference with the sharded path's device-0 key fold
    f_ref = np.asarray(event_driven_map(
        cfg, params, jax.random.fold_in(key, 0), Z,
        evolve_backend="pallas"))
    return float(np.max(np.abs(f_sharded - f_ref)))


def bench_map_eval():
    """Config 3: map evaluation at N=1024, R=1024 (windowed Pallas evolve)."""
    from armadillocudalinearinterpolation_tpu import (
        ModelConfig, MapParams, make_residual_fn)

    Z0 = jnp.array([0.3310, 0.6914, 1.3557], jnp.float32)
    key = jax.random.PRNGKey(0)
    # Reference workload shape (Driver.cu:19,69 at modern scale); the
    # windowed evolve kernel is certified-exact vs the full kernel.
    cfg = ModelConfig(n_neurons=1024, n_real=1024, dtype="float32",
                      evolve_window=128)
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

    return _slope(make, k_lo=1, k_hi=3, reps=2)


def _newton_cfg64():
    from armadillocudalinearinterpolation_tpu import ModelConfig, MapParams

    # R=64 is justified by the round-4 floor study (artifacts/
    # floor_vs_r.jsonl, VERDICT r3 #5): its event-reordering floor is
    # 1.78e-9 (5.6x margin under the judged 1e-8), while R=256 measures
    # a WORSE floor (1.68e-8 — denser reordering-boundary staircase) and
    # fails the target from a perturbed guess.  Bigger ensembles do not
    # average the floor down at fixed sigma.
    # replay_jvp pinned so the newton_exact key keeps its machine-grade-
    # tangent semantics across rounds even if the library default moves;
    # the f32-tangent alternative is recorded by the jacfwd_modes stage
    cfg64 = ModelConfig(n_neurons=4096, n_real=64, dtype="float64",
                        root_tol=1e-12, evolve_window=512, max_events=4096,
                        replay_jvp="df64")
    params64 = MapParams.create(13.0589, 0.1, dtype="float64")
    return cfg64, params64


def bench_newton_1e8(state):
    """Config 4: Newton to 1e-8 at N=4096, fully on the TPU chip.

    Hybrid precision, matching the reference's double-solver-over-float-map
    split at the modern target (NewtonSolver.cpp runs in double; the judged
    tolerance is 1e-8): a jitted fp32 Newton (Pallas evolve) takes the
    iterate to ~2e-5, then the df64 schedule-replay path (model/replay.py:
    Pallas f32 schedule pass + double-float replay, ~0.6 s/eval vs 13 s for
    XLA's emulated f64 in round 2) converges to the 1e-8 target via the
    fused frozen-schedule stencil and the best-iterate polish
    (solvers/staged.py).  Host-driven outer loop keeps every device
    program bounded (the tunneled worker kills >10 min programs).

    The derived measurements — replay-eval timing, the df64-vs-emulated
    delta, the exact-jacfwd variant — are SEPARATE bench stages sharing
    ``state`` so a mid-run timeout records this judged number first.
    """
    from armadillocudalinearinterpolation_tpu import newton_solve_staged

    jax.config.update("jax_enable_x64", True)
    key = jax.random.PRNGKey(0)
    Z0 = jnp.array([0.3310, 0.6914, 1.3557], jnp.float32)
    cfg64, params64 = _newton_cfg64()

    jits = {}  # shared across passes: the replay trace alone is ~13 s

    def staged_solve(z0):
        pol = newton_solve_staged(cfg64, params64, key, z0,
                                  tolerance=1e-8, jit_cache=jits)
        return pol, int(pol.iterations)

    # Cold path = AOT warmup + first solve (VERDICT r4 #4: measure the
    # trace-vs-compile breakdown, then cut it).  staged_aot_warmup lowers
    # every program of the recipe serially (tracing is GIL-bound Python)
    # and compiles them IN PARALLEL (the compile is a remote RPC here);
    # the first solve then starts fully warm.  newton_N4096_cold_s keeps
    # its round-2..4 semantics — wall-clock from nothing to the first
    # converged solution — now attributable via the breakdown keys.
    from armadillocudalinearinterpolation_tpu import staged_aot_warmup
    breakdown = staged_aot_warmup(cfg64, params64, key, Z0,
                                  tolerance=1e-8, jit_cache=jits)
    t0 = time.perf_counter()
    pol_cold, iters = staged_solve(Z0)
    t_first = time.perf_counter() - t0
    t_cold = breakdown["total_s"] + t_first
    breakdown["first_solve_s"] = round(t_first, 2)

    t0 = time.perf_counter()
    pol, iters = staged_solve(Z0 + jnp.float32(1e-3))
    t_solve = time.perf_counter() - t0

    state["key"] = key
    state["jits"] = jits
    state["pol"] = pol
    state["Z0"] = Z0
    state["staged_solve"] = staged_solve
    return (t_solve, t_cold, iters,
            max(float(pol.residual_norm), float(pol_cold.residual_norm)),
            breakdown)


def bench_newton_warm_pass(state, pass_no: int):
    """Variance-control re-measure of the judged warm staged solve
    (VERDICT r4 #1a): one more solve from a DIFFERENT perturbed guess
    through the same cached programs."""
    t0 = time.perf_counter()
    pol, _ = state["staged_solve"](state["Z0"]
                                   + jnp.float32(1e-3 * (pass_no + 1)))
    t = time.perf_counter() - t0
    return t, float(pol.residual_norm)


def bench_replay_eval(state):
    """Single df64-replay map evaluation (schedule pass + replay scan),
    warm: the direct measure of the replay-path optimizations (kick
    tables, anchor/delta exp split).  Host readback forces real timing
    through the tunnel (block_until_ready does not synchronise)."""
    F64 = state["jits"]["F_acc_fn"]
    sol = state["pol"].solution
    t_eval = []
    for k in range(3):
        z_e = sol + (k + 1) * 1e-7
        t0 = time.perf_counter()
        float(jnp.sum(F64(z_e)))
        t_eval.append(time.perf_counter() - t0)
    return min(t_eval)


def bench_replay_vs_emu(state):
    """VERDICT r3 deliverable: df64-replay vs XLA-emulated-f64 residual
    delta at the solution (NOT part of the timed solve; the emulated
    evaluation alone costs ~13 s — the whole point of the replay path)."""
    from armadillocudalinearinterpolation_tpu import make_residual_fn

    cfg64, params64 = _newton_cfg64()
    F_emu = make_residual_fn(cfg64, params64, state["key"],
                             evolve_backend="xla")
    F64 = state["jits"]["F_acc_fn"]
    sol = state["pol"].solution
    return float(jnp.max(jnp.abs(F_emu(sol) - F64(sol))))


def bench_newton_exact(state):
    """ONE stage-2 mode variant beside the (frozen-fwd) default headline
    (VERDICT r3 #3 cut the exact+frozen pair to a single variant):
    "exact" = jacfwd through the replay, the machine-grade-Jacobian
    robustness reference.  When the judged newton_1e8 stage ran, its
    stage-1 / F-residual / polish programs are REUSED (same resolved cfg
    and F_acc object — only the jacfwd program is new), cutting this
    non-judged stage's cold cost by the shared compiles (VERDICT r4
    weak #4: this stage consumed a third of the r04 run's budget)."""
    from armadillocudalinearinterpolation_tpu import (NewtonConfig,
                                                      newton_solve_staged)

    key = jax.random.PRNGKey(0)
    Z0 = jnp.array([0.3310, 0.6914, 1.3557], jnp.float32)
    cfg64, params64 = _newton_cfg64()
    # Stage-2 drives all the way to 0.9e-8 itself (NOT the recipe-default
    # 5*tolerance capture range + polish): with machine-grade Jacobians
    # one extra quadratic iteration replaces the frozen-Jacobian polish
    # crawl from the 5e-8 hand-off.  Measured on chip (round 5, warm
    # staged exact from Z0+1e-3): 5e-8/6 = 34.2-46.4 s at 54 total
    # iterations (the polish ground its full 40-iteration budget);
    # 0.9e-8/8 = 13.4 s at 12 iterations, final norm 4.6e-9.
    ncfg_f = NewtonConfig(tolerance=0.9e-8, max_iterations=8,
                          fd_mode="exact", fd_epsilon=1e-6)
    jits_f = {}
    if "jits" in state:
        j = state["jits"]
        for k in ("stage1", "F_acc"):
            if k in j:
                jits_f[k] = j[k]
        s2 = j.get("stage2_cache", {})
        if "F" in s2 and "F_acc" in j:
            # polish program + its F-identity contract travel together
            jits_f["stage2_cache"] = {"_F_identity": j["F_acc"],
                                      "F": s2["F"]}
    pol_fc = newton_solve_staged(cfg64, params64, key, Z0,
                                 tolerance=1e-8, stage2_ncfg=ncfg_f,
                                 jit_cache=jits_f)
    t0 = time.perf_counter()
    pol_f = newton_solve_staged(cfg64, params64, key,
                                Z0 + jnp.float32(1e-3),
                                tolerance=1e-8, stage2_ncfg=ncfg_f,
                                jit_cache=jits_f)
    return (time.perf_counter() - t0,
            max(float(pol_f.residual_norm), float(pol_fc.residual_norm)))


def bench_jacfwd_modes(state):
    """VERDICT r4 #5 deliverable: the f32-tangent custom JVP A/B, on chip.

    Times the full-map exact Jacobian at N=4096 (the newton_exact
    stage's workload) via the column-wise ``jacfwd_cols`` in both tangent
    modes, against the forward eval the same stage records.  Round-5
    context (all warm, this builder's measurements): ``jax.jacfwd``'s
    vmapped tangents cost 3.35 s (df64) / 3.08 s (f32) — the vmap-of-jvp
    through the event loop is pathological on this backend — while
    sequential columns run 1.24 s / 0.38 s.  The record captures the
    column-mode numbers plus the f32-vs-df64 Jacobian agreement."""
    from armadillocudalinearinterpolation_tpu import make_residual_fn
    from armadillocudalinearinterpolation_tpu.solvers.newton import (
        jacfwd_cols)

    cfg64, params64 = _newton_cfg64()
    key = state.get("key", jax.random.PRNGKey(0))
    sol = state["pol"].solution if "pol" in state else jnp.array(
        [0.32623663, 0.71936722, 1.36899475], jnp.float64)
    out = {}
    Js = {}
    for mode in ("f32", "df64"):
        F = make_residual_fn(cfg64.with_(replay_jvp=mode), params64, key,
                             evolve_backend="replay")
        Jf = jax.jit(jacfwd_cols(F))
        Jf(sol).block_until_ready()
        ts = []
        for k in range(3):
            t0 = time.perf_counter()
            J = Jf(sol + (k + 1) * 1e-7)
            J.block_until_ready()
            ts.append(time.perf_counter() - t0)
        Js[mode] = J
        out[f"jacfwd_{mode}_N4096_ms"] = round(min(ts) * 1e3, 1)
    d = float(jnp.max(jnp.abs(Js["f32"] - Js["df64"])))
    out["jacfwd_f32_vs_df64_rel"] = d / float(jnp.max(jnp.abs(Js["df64"])))
    return out


def bench_replay_exp_modes():
    """ROADMAP on-chip A/B: the df64 replay's small-exp strategy.

    Times one warm df64-replay map evaluation (f32 Pallas schedule pass +
    replay scan) for the default ``ModelConfig.replay_exp_mode`` vs ONE
    alternative, at N=2048 (VERDICT r3 #3 shrank this stage from four
    N=4096 programs).  Full decision record, 2026-08-19 (v5e, N=4096,
    warm ms/eval, bitwise-identical results): small 231.0, hoisted 234.7,
    cond 249.4, fast 271.3 — the per-event cond partially executes both
    branches, so the default is "hoisted" (config.py).  The stage keeps
    running as a regression guard; the residual delta between the two
    modes is recorded so a fast-but-wrong mode can never pass silently.
    """
    from armadillocudalinearinterpolation_tpu import (
        ModelConfig, MapParams, make_residual_fn)

    jax.config.update("jax_enable_x64", True)
    key = jax.random.PRNGKey(0)
    z = jnp.array([0.3310, 0.6914, 1.3557], jnp.float64)
    params = MapParams.create(13.0589, 0.1, dtype="float64")
    out = {}
    ref = None
    for mode in ("hoisted", "small"):
        cfg = ModelConfig(n_neurons=2048, n_real=64, dtype="float64",
                          root_tol=1e-12, evolve_window=512,
                          max_events=4096, replay_exp_mode=mode)
        F = jax.jit(make_residual_fn(cfg, params, key,
                                     evolve_backend="replay"))
        r = F(z)                                   # trace + compile, warm up
        delta = None if ref is None else \
            float(jnp.max(jnp.abs(r - ref)))
        if ref is None:
            ref = r
        ts = []
        for k in range(5):
            z_e = z + (k + 1) * 1e-7               # fresh solve, same program
            t0 = time.perf_counter()
            float(jnp.sum(F(z_e)))                  # host readback = real sync
            ts.append(time.perf_counter() - t0)
        out[mode] = (round(min(ts) * 1e3, 1), delta)
    return out


def bench_sweep_100pt(predict: bool = True):
    """BASELINE config 5: 100-point continuation sweep with per-step
    eigenspectrum — the reference's commented-out production loop
    (``/root/reference/Driver.cu:86-114``: ``beta += 0.1`` from 13.0589,
    solve, count unstable eigenvalues), run for real at the reference's
    driver scale (N=512 neurons, ~1k realisations, Newton tol 1e-4 / <= 10
    iterations, ``Driver.cu:28-31,69``).

    One jitted solve serves every step (``MapParams`` is traced, so the
    sweep never recompiles); the eigenspectrum reuses the solve's exported
    Jacobian (the reference's ``pJacobianExternal`` flow,
    ``NewtonSolver.cpp:153-159``) with the 3x3 eig on the host, exactly as
    the reference runs Armadillo's ``eig_gen`` beside the GPU.  Steps where
    the wave family has ended fail to converge and still pay their full
    iteration budget, as the reference's loop would.

    ``predict=True`` (the judged configuration, and the CLI driver's
    default) warm-starts each step with the secant extrapolation of the
    previous two converged solutions instead of the reference's plain
    previous solution — same solver, tolerance, and budget; measured on
    the v5e (2026-08-20, two A/B passes): 1.28-1.32 -> 0.78 s/step,
    iterations 777 -> 480, converged steps 61 -> 64, identical spectra.
    ``predict=False`` is the reference-style baseline (always recorded by
    the judged ``sweep_plain`` stage — ADVICE r4: the reference-semantics
    number must be present on every record).

    Host-work discipline (VERDICT r4 #3: in slow tunnel states per-step
    host round-trips, not the device solve, dominated s/step): each step
    performs exactly ONE readback — ``device_get`` of (converged,
    solution) together, needed on the host for the warm-start decision —
    while the 3x3 Jacobians stay on device and the eigenspectra are
    computed in one trailing host batch after the solve loop (the
    reference's loop semantics allow it: spectra never feed back into the
    continuation, ``Driver.cu:86-114``).  Both phases are timed; the
    reported s/step covers BOTH (same total work as the reference loop).
    """
    from armadillocudalinearinterpolation_tpu import (
        ModelConfig, MapParams, NewtonConfig, make_residual_fn,
        newton_solve, ProblemType)
    from armadillocudalinearinterpolation_tpu.analysis.stability import (
        compute_eigenvalues, count_unstable)

    cfg = ModelConfig(n_neurons=512, n_real=1024, dtype="float32",
                      evolve_window=128)
    ncfg = NewtonConfig(tolerance=1e-4, max_iterations=10, fd_epsilon=1e-2)
    key = jax.random.PRNGKey(0)
    Z = jnp.array([0.3310, 0.6914, 1.3557], jnp.float32)

    @jax.jit
    def solve_step(params, z0):
        return newton_solve(make_residual_fn(cfg, params, key), z0, ncfg)

    # warm the compile outside the timed region (a production sweep pays
    # this once; the metric is s/step at steady state)
    _ = solve_step(MapParams.create(13.0589, 0.1, dtype="float32"), Z)
    jax.block_until_ready(_.solution)

    n_steps = 100
    t0 = time.perf_counter()
    beta = 13.0589
    z = Z
    z_prev = None       # converged solution one step further back
    z_is_conv = False   # z is a converged solution (not the initial guess)
    n_conv = 0
    first_fail_beta = None
    jacs = []
    conv_flags = []
    for _i in range(n_steps):
        params = MapParams.create(beta, 0.1, dtype="float32")
        # secant pair = two consecutive CONVERGED solutions only — a
        # guess->solution pair is a Newton correction, not a branch
        # tangent (it extrapolated a small-R f64 sweep into the
        # coexisting fast family's basin; cli/driver.py has the same rule)
        guess = z + (z - z_prev) if (predict and z_prev is not None) else z
        res = solve_step(params, guess)
        # the ONE per-step readback: the warm-start logic needs these two
        conv, sol = jax.device_get((res.converged, res.solution))
        ok = bool(conv) and bool(np.isfinite(sol).all())
        jacs.append(res.jacobian)          # stays on device until the end
        conv_flags.append(ok)
        if ok:
            z_prev = z if z_is_conv else None
            z = res.solution   # warm-start the next step, as Driver.cu does
            z_is_conv = True
            n_conv += 1
        else:
            # the branch-END annotation (VERDICT r4 #8): the first failure
            # AFTER a converged step — the physical end of the walked
            # family.  Early cold-guess failures (step 0 at the Driver.cu
            # guess is outside every local basin at this R, verify skill)
            # don't qualify: recording THEM produced a misleading
            # first_fail_beta = 13.0589 in the round-5 shakeout run.
            if first_fail_beta is None and n_conv > 0:
                first_fail_beta = round(beta, 4)
            z_prev = None
            z_is_conv = False
        beta += 0.1
    t_solve = time.perf_counter() - t0

    # trailing spectra batch: one transfer for all 100 Jacobians, host eig
    t0 = time.perf_counter()
    jacs_h = np.asarray(jax.device_get(jnp.stack(jacs)))
    unstable = []
    for j in jacs_h:
        try:
            ev = compute_eigenvalues(None, None, ProblemType.EQUATION_FREE,
                                     jacobian=j)
            unstable.append(int(count_unstable(ev,
                                               ProblemType.EQUATION_FREE)))
        except Exception:
            unstable.append(-1)   # non-finite Jacobian past the branch end
    t_spectra = time.perf_counter() - t0
    t = t_solve + t_spectra
    return {"s_per_step": t / n_steps,
            "solve_s_per_step": t_solve / n_steps,
            "spectra_s": t_spectra,
            "n_conv": n_conv, "unstable": unstable,
            "conv_flags": conv_flags, "first_fail_beta": first_fail_beta}


def _backend_alive(timeout_s: float = 120.0) -> bool:
    """Probe the device backend in a subprocess with a hard timeout.

    The axon tunnel can be down for many hours at a stretch, and when it
    is, ``jax.devices()`` HANGS (no error) — observed 2026-08-17/18, 24+ h.
    It can ALSO be half-up: ``jax.devices()`` answers but the first real
    dispatch hangs forever (observed 2026-08-20 — a bench run wedged 30+
    min inside its first stage after a clean probe).  So the probe runs an
    actual tiny computation with a host readback, the only true liveness
    signal on this machine.  A dead tunnel must degrade this run to a
    fast, parseable error record, never an unbounded hang that leaves no
    bench output at all.
    """
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "print(float(jnp.arange(8.0).sum()))"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0
    except Exception:
        return False


def _json_safe(d):
    # a NaN metric (invalid timing, see profiling.chained_slope) must
    # not make the whole record unparseable: json.dumps would emit the
    # non-standard token NaN — serialise null for that field instead.
    # Recursive: nested dicts/lists (tunnel probes, cold-start program
    # breakdown, spread pairs) get the same treatment.
    import math

    def safe(v):
        if isinstance(v, float) and not math.isfinite(v):
            return None
        if isinstance(v, dict):
            return {k: safe(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [safe(x) for x in v]
        return v
    return {k: safe(v) for k, v in d.items()}


class _Record:
    """Cumulative bench record with incremental emission (VERDICT r3 #1).

    After EVERY stage the full record-so-far — the headline fields plus
    every extras key — is re-printed as one JSON line on stdout, so a
    driver timeout truncates *coverage* instead of zeroing the round: the
    last complete line always holds everything measured up to the kill.
    Stage markers and the same cumulative record go to stderr for humans.
    """

    def __init__(self):
        self.extras = {}
        self.headline = {"metric": "batched_2d_bilinear_interp",
                         "value": 0.0, "unit": "Mqueries/s",
                         "vs_baseline": 0.0}

    def emit(self):
        rec = dict(self.headline)
        rec.update(_json_safe(self.extras))
        print(json.dumps(rec), flush=True)

    def run_stage(self, name, fn, *, min_budget_s=0.0, judged=False):
        """Run one fail-soft stage and re-emit the cumulative record.

        Non-judged stages are skipped (and the skip recorded) when less
        than ``min_budget_s`` of the total budget remains; judged stages
        always run — they are ordered first in ``main`` so the budget is
        theirs to spend.
        """
        left = _remaining()
        if not judged and left < min_budget_s:
            self.extras[f"{name}_skipped"] = (
                f"budget: {left:.0f}s left < {min_budget_s:.0f}s needed")
            print(f"[bench] {name} SKIPPED ({left:.0f}s budget left)",
                  file=sys.stderr, flush=True)
            self.emit()
            return
        print(f"[bench] {name} ({left:.0f}s budget left)",
              file=sys.stderr, flush=True)
        t0 = time.monotonic()
        try:
            fn()
        except Exception as e:
            self.extras[f"{name}_error"] = str(e)[:300]
        self.extras.setdefault("stage_seconds", {})[name] = round(
            time.monotonic() - t0, 1)
        self.emit()


def main():
    if not _backend_alive():
        print("[bench] device backend unreachable (tunnel down?); "
              "emitting error record", file=sys.stderr, flush=True)
        print(json.dumps({
            "metric": "batched_2d_bilinear_interp", "value": 0.0,
            "unit": "Mqueries/s", "vs_baseline": 0.0,
            "error": "device backend unreachable: jax.devices() probe "
                     "timed out (axon tunnel down)"}))
        return

    rec = _Record()
    extras = rec.extras
    # The fully-f64 on-chip Newton stage needs x64 enabled before any trace;
    # every fp32 kernel (incl. Pallas, traced with 32-bit semantics pinned)
    # is x64-safe.
    jax.config.update("jax_enable_x64", True)

    # Variance control (VERDICT r4 #1a): judged metrics may be measured in
    # multiple passes (re-measure stages at the end of the run); the
    # recorded key is the BEST pass and ``<key>_spread`` = [min, max]
    # appears once a second pass lands, so a drifting tunnel is visible
    # in-record instead of silently degrading the round's number.
    passes = {}

    def _best_of(name, value, *, lower_is_better):
        if value == value and np.isfinite(value):
            passes.setdefault(name, []).append(float(value))
        vals = passes.get(name, [])
        if not vals:
            return None
        if len(vals) > 1:
            extras[f"{name}_spread"] = [min(vals), max(vals)]
        return min(vals) if lower_is_better else max(vals)

    # --- judged stages first (BASELINE.md configs 2, 4, 5, 3) -------------

    def st_tunnel_probe_start():
        extras["tunnel_probe_start"] = tunnel_probe()

    def st_tunnel_probe_end():
        extras["tunnel_probe_end"] = tunnel_probe()

    def _apply_bilinear(qps, s_pallas, s_xla):
        best_qps = _best_of("bilinear2d_qps", qps, lower_is_better=False)
        if best_qps is None:
            return
        if "bilinear2d_qps_spread" in extras:
            extras["bilinear2d_qps_spread"] = [
                round(v / 1e6, 1) for v in extras["bilinear2d_qps_spread"]]
        s_best = 64 * (1_048_576 // 64) / best_qps
        extras["bilinear2d_pallas_ms"] = round(s_best * 1e3, 3)
        if np.isfinite(s_xla):
            extras["bilinear2d_xla_ms"] = round(s_xla * 1e3, 3)
        # achieved-vs-peak on the MXU (v5e peak ~197 TFLOP/s bf16): the
        # tent-weight algorithm spends 3 matmuls of Hp x Wp MACs per query
        # in bf16x2 mode — makes rounds comparable on MFU (VERDICT r1 #4).
        flops_per_q = 3 * 2 * 256 * 256
        extras["bilinear2d_mfu_pct"] = round(
            100.0 * best_qps * flops_per_q / 197e12, 1)
        rec.headline["value"] = round(best_qps / 1e6, 1)
        if "bilinear2d_xla_ms" in extras:
            rec.headline["vs_baseline"] = round(
                extras["bilinear2d_xla_ms"] / (s_best * 1e3), 2)

    def st_bilinear2d():
        _apply_bilinear(*bench_bilinear2d())

    def st_bilinear2d_remeasure():
        _apply_bilinear(*bench_bilinear2d(measure_xla=False))

    newton_state = {}

    def st_newton_1e8():
        t_solve, t_cold, iters, norm, bd = bench_newton_1e8(newton_state)
        extras["newton_N4096_s"] = round(
            _best_of("newton_N4096_s", t_solve, lower_is_better=True), 2)
        extras["newton_N4096_cold_s"] = round(t_cold, 2)
        # the VERDICT r4 #4 breakdown: trace is serial Python, compile ran
        # in a parallel pool (wall < sum when the helper overlaps)
        extras["newton_cold_trace_s"] = bd["trace_total_s"]
        extras["newton_cold_compile_s"] = bd["compile_wall_s"]
        extras["newton_cold_first_solve_s"] = bd["first_solve_s"]
        extras["newton_cold_programs"] = bd["programs"]
        extras["newton_iters"] = iters
        extras["newton_final_norm"] = norm

    def st_newton_remeasure():
        if "staged_solve" not in newton_state:
            extras["newton_remeasure_skipped"] = "newton_1e8 did not run"
            return
        pass_no = len(passes.get("newton_N4096_s", []))
        t, norm = bench_newton_warm_pass(newton_state, pass_no)
        extras["newton_N4096_s"] = round(
            _best_of("newton_N4096_s", t, lower_is_better=True), 2)

    def st_replay_eval():
        extras["replay_eval_N4096_ms"] = round(
            bench_replay_eval(newton_state) * 1e3, 1)

    def st_replay_vs_emu():
        extras["replay_vs_f64emu_residual_delta"] = \
            bench_replay_vs_emu(newton_state)

    def st_newton_exact():
        t_f, norm_f = bench_newton_exact(newton_state)
        extras["newton_exact_N4096_s"] = round(t_f, 2)
        extras["newton_exact_final_norm"] = norm_f

    def st_jacfwd_modes():
        extras.update(bench_jacfwd_modes(newton_state))

    def _apply_sweep(prefix, r):
        best = _best_of(f"{prefix}_s_per_step", r["s_per_step"],
                        lower_is_better=True)
        extras[f"{prefix}_s_per_step"] = round(best, 3)
        extras[f"{prefix}_solve_s_per_step"] = round(
            r["solve_s_per_step"], 3)
        extras[f"{prefix}_spectra_s"] = round(r["spectra_s"], 2)
        extras[f"{prefix}_converged"] = r["n_conv"]
        # the branch-end annotation (VERDICT r4 #8): converged=64 is the
        # PHYSICAL end of the slow family (beta ~ 16.01, artifacts/
        # arclength_fold), not solver weakness — now visible in-record
        extras[f"{prefix}_first_fail_beta"] = r["first_fail_beta"]
        # spectra of the first/last CONVERGED steps (a failed step past
        # the branch end exports a meaningless Jacobian)
        idx = [i for i, c in enumerate(r["conv_flags"]) if c]
        extras[f"{prefix}_unstable_first_last_converged"] = (
            [r["unstable"][idx[0]], r["unstable"][idx[-1]]] if idx else None)

    def st_sweep_100pt():
        _apply_sweep("sweep_100pt", bench_sweep_100pt())

    def st_sweep_remeasure():
        r = bench_sweep_100pt()
        extras["sweep_100pt_s_per_step"] = round(
            _best_of("sweep_100pt_s_per_step", r["s_per_step"],
                     lower_is_better=True), 3)

    def st_sweep_plain():
        # reference-style plain warm start (Driver.cu:107-109 semantics) —
        # JUDGED since round 5 (ADVICE r4: the reference-style baseline
        # must be on every record beside the predictor configuration)
        _apply_sweep("sweep_plain", bench_sweep_100pt(predict=False))

    def st_map_eval():
        extras["map_eval_N1024_R1024_ms"] = round(bench_map_eval() * 1e3, 1)

    # --- optional stages (budget-gated) -----------------------------------

    def st_lerp1d():
        extras["lerp1d_qps"] = round(bench_lerp1d() / 1e9, 3)

    def st_lerp1d_64k():
        q64k, err64k = bench_lerp1d_64k()
        extras["lerp1d_64k_qps"] = round(q64k / 1e9, 3)
        extras["lerp1d_64k_maxerr"] = err64k

    def st_interp1d_nonuniform():
        qnu, errnu = bench_interp1d_nonuniform()
        extras["interp1d_nonuniform_qps"] = round(qnu / 1e9, 3)
        extras["interp1d_nonuniform_maxerr"] = errnu

    def st_bilinear2d_binned_1024():
        q1k, s1k, s1k_xla, err1k = bench_bilinear2d_binned_1024()
        extras["bilinear2d_1024_binned_qps"] = round(q1k / 1e6, 1)
        extras["bilinear2d_1024_binned_ms"] = round(s1k * 1e3, 3)
        extras["bilinear2d_1024_vs_xla"] = round(s1k_xla / s1k, 1)
        extras["bilinear2d_1024_maxerr"] = err1k

    def st_pallas_parity():
        d_px, d_wf, d_p64, d_x64 = bench_pallas_parity()
        extras["pallas_vs_xla_residual_delta"] = d_px
        extras["windowed_vs_full_residual_delta"] = d_wf
        # _n512 suffix (ADVICE r4): these two moved from N=1024 to N=512
        # in round 4 — the shape is now part of the key so cross-round
        # comparisons of identical names compare identical measurements
        extras["pallas_vs_f64_residual_delta_n512"] = d_p64
        extras["xla_f32_vs_f64_residual_delta_n512"] = d_x64

    def st_shard_map_pallas():
        extras["shard_map_pallas_residual_delta"] = bench_shard_map_pallas()

    def st_bilinear2d_f64():
        q64, err64, q64p, err64p = bench_bilinear2d_f64()
        extras["bilinear2d_f64_xla_qps"] = round(q64 / 1e6, 1)
        extras["bilinear2d_f64_xla_maxerr"] = err64
        extras["bilinear2d_f64_pallas_qps"] = round(q64p / 1e6, 1)
        extras["bilinear2d_f64_pallas_maxerr"] = err64p

    def st_replay_exp_modes():
        for mode, (t_ms, delta) in bench_replay_exp_modes().items():
            tag = mode.replace("-", "_")
            extras[f"replay_exp_{tag}_ms"] = t_ms
            if delta is not None:
                extras[f"replay_exp_{tag}_delta"] = delta

    # Judged stages: always run, most important first — the tunnel-health
    # probe, the headline (config 2), the judged Newton (config 4), the
    # sweep in BOTH configurations (config 5: predictor + the reference-
    # style plain baseline) and the map eval (config 3).  One emission up
    # front: a tunnel that wedges inside stage 1 (jax.devices() can answer
    # while the first dispatch hangs — seen 2026-08-20) still leaves a
    # parseable record.
    rec.emit()
    rec.run_stage("tunnel_probe_start", st_tunnel_probe_start, judged=True)
    rec.run_stage("bilinear2d", st_bilinear2d, judged=True)
    rec.run_stage("newton_1e8", st_newton_1e8, judged=True)
    if "jits" in newton_state:
        # derived measurement in its own stage so a timeout truncates
        # between them (the judged newton_N4096_s is already recorded)
        rec.run_stage("replay_eval", st_replay_eval, judged=True)
    else:
        extras["replay_eval_skipped"] = "newton_1e8 produced no programs"
        rec.emit()
    rec.run_stage("sweep_100pt", st_sweep_100pt, judged=True)
    rec.run_stage("sweep_plain", st_sweep_plain, judged=True)
    rec.run_stage("map_eval", st_map_eval, judged=True)
    # one early headline re-measure so the judged metric carries a spread
    # even if the optional stages exhaust the budget (r04 lesson: the
    # optional newton_exact ate a third of the run while the headline
    # stayed a single drift-exposed sample); the end-of-run passes below
    # still capture cross-run drift
    rec.run_stage("bilinear2d_p1b", st_bilinear2d_remeasure, judged=True)
    # Optional stages, cheapest-per-information first.  min_budget_s is a
    # rough worst-case (cold server compile cache) stage cost; a warm run
    # clears all of them with budget to spare.
    rec.run_stage("shard_map_pallas", st_shard_map_pallas, min_budget_s=60)
    rec.run_stage("lerp1d", st_lerp1d, min_budget_s=60)
    rec.run_stage("lerp1d_64k", st_lerp1d_64k, min_budget_s=90)
    rec.run_stage("interp1d_nonuniform", st_interp1d_nonuniform,
                  min_budget_s=90)
    rec.run_stage("bilinear2d_binned_1024", st_bilinear2d_binned_1024,
                  min_budget_s=120)
    rec.run_stage("bilinear2d_f64", st_bilinear2d_f64, min_budget_s=120)
    rec.run_stage("pallas_parity", st_pallas_parity, min_budget_s=300)
    if "jits" in newton_state:
        rec.run_stage("replay_vs_emu", st_replay_vs_emu, min_budget_s=300)
    else:
        extras["replay_vs_emu_skipped"] = "newton_1e8 produced no programs"
        rec.emit()
    # jacfwd_modes BEFORE newton_exact: it is the round-5 deliverable
    # (VERDICT r4 #5's A/B) and the cheaper of the two once the server
    # cache is warm — shakeout run 2 (driver-default budget) reached
    # newton_exact with 682 s left, spent ~250 there, and the 600-gated
    # jacfwd_modes skipped while the long-recorded replay_exp_modes ran
    rec.run_stage("jacfwd_modes", st_jacfwd_modes, min_budget_s=350)
    rec.run_stage("newton_exact", st_newton_exact, min_budget_s=400)
    rec.run_stage("replay_exp_modes", st_replay_exp_modes, min_budget_s=300)
    # Variance-control re-measures of the judged metrics (VERDICT r4 #1a):
    # spend leftover budget shrinking the spread of exactly the numbers
    # the round is judged on, most drift-sensitive first.
    rec.run_stage("bilinear2d_p2", st_bilinear2d_remeasure, min_budget_s=40)
    rec.run_stage("newton_warm_p2", st_newton_remeasure, min_budget_s=40)
    rec.run_stage("sweep_100pt_p2", st_sweep_remeasure, min_budget_s=150)
    rec.run_stage("bilinear2d_p3", st_bilinear2d_remeasure, min_budget_s=40)
    rec.run_stage("tunnel_probe_end", st_tunnel_probe_end, judged=True)

    extras["bench_total_s"] = round(time.monotonic() - _T0, 1)
    rec.emit()


if __name__ == "__main__":
    main()
