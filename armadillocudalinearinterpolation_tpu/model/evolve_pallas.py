"""Pallas TPU kernel for the event-driven evolve loop (the hot core).

The XLA ``vmap(while_loop)`` path (:mod:`.evolve`) pays per-iteration loop
overhead for every one of the ~400 events x ~8 inner Newton steps of a map
evaluation; at reference scale that overhead dominates the wall-clock.  This
kernel runs a block of realisations' *entire* event loop inside one
``pallas_call`` grid step with all state resident in VMEM — the TPU-native
analogue of the reference's one-block-per-realisation design
(``/root/reference/EventDrivenMap.cu:575-674``), where the whole loop lives
in one kernel launch with shared-memory state.

Design notes:
  * A grid step owns ``_r_block(N)`` realisations as ``(r_block, N)`` vregs;
    realisations in a block run lockstep under masks (small blocks keep the
    lockstep waste low; blocks exit independently like CUDA blocks).
  * Mutable state (``v``, ``s``, ``t`` and the packed bookkeeping row) lives
    in VMEM scratch refs / the output ref, mirroring the reference's shared
    memory; the event ``while_loop`` carries only scalars.  (Carrying the
    arrays functionally is *not* equivalent for Mosaic: replicated-layout
    initial values meet non-replicated loop updates at the back edge and the
    relayout is rejected.)
  * The coupling kick ``beta * w[|i-j|]`` is *recomputed analytically* per
    event (two ``exp`` per element) instead of gathered from the table —
    recompute-over-gather is the TPU way, and it reproduces the table values
    exactly (same formula, same f32 exp).
  * argmin-with-lowest-index is two lane reductions (min, then min of
    index-where-equal) — the Mosaic-friendly form of the reference's
    warp-shuffle min-with-argmin (``:843-881``).
  * With ``cfg.evolve_window > 0`` the per-event root-find runs on a
    W-lane cyclic window around the wave packet, certified exact per event
    by a closed-form lower bound on out-of-window crossing times with a
    ``lax.cond`` full-evaluation fallback — ~3.2x at reference scale,
    identical results (see ``select_event_windowed``).
  * The state arrays are kept *persistently rolled* so the window is always
    the static slice ``[0, W)``: re-rolling happens only when the wave has
    travelled ``_SLACK`` lanes past the window anchor (every ~50 events),
    not per event.  Measured per-event cost at N=1024, R=128/block was 34%
    dynamic rolls before this; the re-roll is predicated with ``pl.when``
    so off-events pay nothing.  The certificate logic is unchanged, so the
    windowed path stays certified-exact.

Packed output layout per realisation row (f32; indices exact below 2^24):
``[0:M] last_ind  [M:2M] last_t  [2M:3M] crossed_ind  [3M:4M] crossed_t
  [4M] accept  [4M+1] n_events  [4M+2:5M+2] crossed flags (scratch)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from .evolve import EvolveResult

_LANE = 128
# Elements per (r_block, N) block.  This bounds BOTH VMEM (128K f32 x 3
# state arrays = 1.5MB) and, critically, Mosaic compile time, which scales
# with the vreg count of every op in the unrolled kernel body — blocks much
# past ~128K elements push a fresh kernel compile beyond the remote
# compile-helper's time limit.
_BLOCK_ELEMENT_BUDGET = 128 * 1024
# Escape hatch for CI: run the kernel through the Pallas interpreter
# (plain XLA ops, any backend) instead of Mosaic.  Lets the kernel's
# logic — windowing, persistent roll, packed bookkeeping — be exercised
# off-TPU; tests/test_evolve_pallas.py flips it.
_INTERPRET = False


def _r_block(n_neurons: int, warm: bool = False) -> int:
    """Realisations per grid step, sized to the element budget.

    Measured on v5e at N=512, R=1024 (device time, RTT subtracted):
    8 -> 120ms, 32 -> 49ms, 128 -> 43ms, 256 -> 40ms — bigger blocks
    amortise per-event loop overhead; lockstep waste within a block is
    small because realisations have similar event counts.

    Warm start adds the (r_block, N) seed scratch plus the probe's live
    temporaries: at the full budget the kernel exceeded the 16M scoped
    VMEM stack by 1.23M (v5e, N=1024, r_block=128 — measured 2026-08-20),
    so the block shrinks by 1/4 under ``cfg.evolve_warm_start``.
    """
    budget = _BLOCK_ELEMENT_BUDGET * 3 // 4 if warm \
        else _BLOCK_ELEMENT_BUDGET
    if warm and 8 * n_neurons > budget:
        # The 8-row floor below would silently exceed the reduced warm
        # budget for n_neurons in (12288, 16384], re-creating the measured
        # 16M scoped-VMEM overflow the 3/4 shrink exists to prevent.  (The
        # cold budget only reaches its floor exactly at N=16384.)
        raise ValueError(
            f"evolve_warm_start needs 8*{n_neurons} <= {budget} VMEM-budget "
            "elements; disable warm start (or use the windowed/XLA backend) "
            f"for n_neurons > {budget // 8}")
    rb = budget // n_neurons
    return int(max(8, min(128, (rb // 8) * 8)))


def _evolve_kernel(cfg: ModelConfig, r_block: int, record: int, *refs):
    v0_ref, s0_ref, beta_ref, book0_ref = refs[:4]
    if record > 0:
        out_ref, sched_ref = refs[4], refs[5]
        scratch = refs[6:]
    else:
        out_ref, sched_ref = refs[4], None
        scratch = refs[5:]
    per_row = cfg.evolve_window_per_row
    warm = cfg.evolve_warm_start
    if warm:
        scratch, tw_s = scratch[:-1], scratch[-1]
    else:
        tw_s = None
    if 0 < cfg.evolve_window < cfg.n_neurons:
        if per_row:
            v_s, s_s, t_s, b_s, off_s = scratch
        else:
            (v_s, s_s, t_s, b_s), off_s = scratch, None
    else:
        (v_s, s_s, t_s), b_s, off_s = scratch, None, None
    N = cfg.n_neurons
    M = cfg.n_spikes
    T = jnp.float32(cfg.t_horizon)
    tol = jnp.float32(cfg.root_tol)
    drive = jnp.float32(cfg.drive)
    vth = jnp.float32(cfg.vth)
    dx = jnp.float32(cfg.dx)
    R = r_block

    W = int(cfg.evolve_window)
    use_window = 0 < W < N
    if per_row:
        # chunk-granular per-row anchors eat up to 127 lanes of the front
        # margin; budget a full chunk plus the usual margin, and trigger a
        # re-anchor only once the roll would actually move (>= 1 chunk)
        PAD_B = 192
        TRIGGER = 160
    else:
        PAD_B = min(64, W // 4) if use_window else 0
    # Re-roll hysteresis: state stays rolled until the trailing spike has
    # advanced SLACK lanes past the anchor, shrinking the window's front
    # margin by at most SLACK lanes between re-rolls (certificate-guarded).
    SLACK = (PAD_B // 2) if not per_row else 0

    lane_o = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1)
    out_ref[:] = jnp.broadcast_to(book0_ref[:], (R, _LANE))
    if record > 0:
        # firing-order log for the df64 schedule replay (model/replay.py):
        # every live row processes exactly one event per loop iteration, so
        # column k of the log IS event k for every row — the write is one
        # masked (R, E) select, no scatter (f32; indices < 2^24 are exact)
        lane_E = jax.lax.broadcasted_iota(jnp.int32, (R, record), 1)
        sched_ref[:] = jnp.zeros((R, record), jnp.float32)

    # ---- state init (VMEM refs; the reference's shared-memory load, :591-599)
    if use_window:
        # persistent rolled coordinates: rolled[i] = orig[(i + off) % N],
        # anchored so the root-find window is always the slice [0, W)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
        lo0 = jnp.min(jnp.where(lane1 < M, book0_ref[:],
                                jnp.float32(jnp.inf))).astype(jnp.int32)
        off0 = jnp.mod(lo0 - PAD_B, N)
        shift0 = jnp.mod(N - off0, N)
        v_s[:] = jnp.broadcast_to(pltpu.roll(v0_ref[:], shift0, 1), (R, N))
        s_s[:] = jnp.broadcast_to(pltpu.roll(s0_ref[:], shift0, 1), (R, N))
        b_s[:] = pltpu.roll(beta_ref[:], shift0, 1)
        if per_row:
            # every row starts from the same init indices -> same anchor
            off_s[:] = jnp.zeros((R, _LANE), jnp.int32) + off0
    else:
        off0 = jnp.int32(0)
        v_s[:] = jnp.broadcast_to(v0_ref[:], (R, N))
        s_s[:] = jnp.broadcast_to(s0_ref[:], (R, N))
    t_s[:] = jnp.zeros((R, N), jnp.float32)
    if warm:
        tw_s[:] = jnp.zeros((R, N), jnp.float32)
        MARGIN = jnp.float32(cfg.evolve_warm_margin)

    def b2f(pred):
        """bool -> f32 via select: Mosaic's bool convert helper recurses
        infinitely under jax_enable_x64 (bool routes through the 64-bit
        default int); a select never converts."""
        return jnp.where(pred, jnp.float32(1.0), jnp.float32(0.0))

    def _f_df(tt, vv, ss, bb):
        """Membrane residual and derivative from ONE (e^-t, e^{(1-b)t}) pair.

        The reference's separate ``fun``/``dfun`` (EventDrivenMap.cu:544-552)
        cost four transcendentals per Newton iteration; the shared form
        costs two — the inner loop is transcendental-bound.
        """
        emt = jnp.exp(-tt)
        ebt = jnp.exp((1.0 - bb) * tt)
        sc = ss * emt
        f = (vv * emt + drive * (1.0 - emt)
             + sc * (ebt - 1.0) / (1.0 - bb) - vth)
        df = (drive * emt - vv * emt + sc * ebt
              + sc * (ebt - 1.0) / (bb - 1.0))
        return f, df

    def event_time(vv, ss, bb, tw=None):
        # fire/no-fire decision (EventDrivenMap.cu:559); NaN compares false.
        base = ss / (vth - drive)
        q = jnp.power(base, 1.0 / bb)
        rhs = (vth * q + drive * (1.0 - q)
               - (vth - drive) / (bb - 1.0) * (base - q))
        decision = vv > rhs
        t0 = jnp.zeros_like(vv)
        # at t = 0 both exponentials are 1: closed forms, no transcendentals
        f0 = (vv - vth) * b2f(decision)
        df0 = drive - vv + ss
        if tw is not None:
            # Warm start (cfg.evolve_warm_start): probe the previous root
            # shifted left by the margin.  The guard f < 0 AND f' > 0 is a
            # certificate that the probe sits left of the FIRST crossing:
            # the inter-event trajectory is unimodal (v'' = -v' - beta*s,
            # so every critical point is a maximum) — past the first root
            # either f >= 0 (still above threshold) or v is descending.
            # Failing lanes fall back to the cold start above; the probe's
            # transcendental pair is their only cost.
            t_seed = jnp.maximum(tw - MARGIN, 0.0)
            f_w, df_w = _f_df(t_seed, vv, ss, bb)
            use_w = jnp.logical_and(jnp.logical_and(f_w < 0.0, df_w > 0.0),
                                    decision)
            t0 = jnp.where(use_w, t_seed, t0)
            f0 = jnp.where(use_w, f_w, f0)
            df0 = jnp.where(use_w, df_w, df0)

        def cond(c):
            tt, ff, dff, k = c
            # f32 max-reduction instead of jnp.any: Mosaic lowers a bool
            # reduction through the default float dtype, which is f64 under
            # jax_enable_x64 and unlowerable.
            unconv = jnp.max(b2f(jnp.abs(ff) > tol)) > 0.5
            return jnp.logical_and(unconv, k < cfg.counter_max)

        def body(c):
            # NOTE: pair-stepping (two masked updates per convergence
            # check) was measured to exceed the 16M scoped-VMEM stack at
            # r_block=128 x N=1024 — the duplicated _f_df body doubles the
            # live vector temporaries.  Keep one update per check.
            tt, ff, dff, k = c
            active = jnp.abs(ff) > tol
            tt = jnp.where(active, tt - ff / dff, tt)
            f_new, df_new = _f_df(tt, vv, ss, bb)
            ff = jnp.where(active, f_new, ff)
            dff = jnp.where(active, df_new, dff)
            return tt, ff, dff, k + 1

        tt, _, _, _ = jax.lax.while_loop(cond, body, (t0, f0, df0,
                                                      jnp.int32(0)))
        tabs = jnp.abs(tt)
        return tabs + 100.0 * (1.0 - b2f(decision)), tabs

    def live_rows():
        book = out_ref[:]
        flags = jnp.where((lane_o >= 4 * M + 2) & (lane_o < 5 * M + 2),
                          book, 1.0)
        all_crossed = jnp.min(flags, axis=1, keepdims=True) > 0.5
        t_row = t_s[:, 0:1]
        return jnp.logical_and(~all_crossed, t_row < 2.0 * T)   # (R, 1)

    def loop_cond(carry):
        return carry[0] > 0.5

    def select_event_full(v, s, beta, tw=None):
        """Exact next-event over all N lanes: (dt, j) as (R, 1) columns.

        ``j`` is a lane index into the arrays as given (rolled coordinates
        when the windowed path calls this as its fallback).  Under warm
        start a third element carries the per-lane roots for next-event
        seeding."""
        times, tabs = event_time(v, s, beta, tw)            # (R, N)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
        dtc = jnp.min(times, axis=1, keepdims=True)
        jc = jnp.min(jnp.where(times == dtc, lane_i, N), axis=1,
                     keepdims=True)                         # lowest-index min
        if warm:
            return dtc, jc, tabs
        return dtc, jc

    def select_event_windowed(v, s, beta, tw=None):
        """Windowed next-event with an exact certificate.

        The wave packet occupies a narrow index band (the spike trajectories
        sit within ~0.5 space units of each other and only lanes reached by
        recent synaptic kicks can fire soon), so the expensive per-lane
        Newton root-find runs on a W-lane window around the packet instead of
        all N lanes — the discrete-event optimisation VERDICT.md item #3 asks
        for, which the reference does NOT have (it pays all-threads cost,
        ``EventDrivenMap.cu:605-609``).

        The caller keeps ``v``/``s``/``beta`` persistently rolled so the
        window is the static slice ``[0, W)`` — no per-event data movement;
        the ring wrap-around is absorbed into the standing roll offset.

        Exactness: for every out-of-window lane a closed-form lower bound on
        its crossing time follows from the ODE comparison ``v' <= -v + I +
        max(s,0)`` (synapses only decay between kicks):

            t_lb = log((I + s+ - v) / (I + s+ - vth)),   +inf if I + s+ <= vth

        If the windowed minimum dt <= min(t_lb) over out lanes, the windowed
        event IS the global one; otherwise (rare: packet escaping the
        window) the block falls back to the full evaluation for this event
        via ``lax.cond`` — so results match the full kernel up to
        window-boundary ties.
        """
        times_w, tabs_w = event_time(v[:, :W], s[:, :W], beta[:, :W],
                                     tw[:, :W] if warm else None)
        dt_w = jnp.min(times_w, axis=1, keepdims=True)
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        j_w = jnp.min(jnp.where(times_w == dt_w, lane_w, W), axis=1,
                      keepdims=True)                        # rolled coords

        # certificate over the out-of-window remainder (one log per lane).
        # The bound needs the synapse to decay between kicks (beta > 0); a
        # non-positive heterogeneous draw voids it, so such lanes report
        # t_lb = 0 and force the exact full-evaluation fallback.
        vo = v[:, W:]
        cap = drive + jnp.maximum(s[:, W:], 0.0)
        denom = cap - vth
        lb = jnp.where(denom > 0.0,
                       jnp.log(jnp.maximum(cap - vo, 1e-30)
                               / jnp.maximum(denom, 1e-30)),
                       jnp.float32(1e9))
        lb = jnp.where(beta[:, W:] > 0.0, lb, 0.0)
        lb_row = jnp.min(lb, axis=1, keepdims=True)
        viol = jnp.max(b2f(jnp.logical_and(live_rows(), dt_w > lb_row)))
        if warm:
            # out-of-window lanes keep their standing seed (the caller
            # subtracts the elapsed dt uniformly afterwards)
            return jax.lax.cond(
                viol < 0.5,
                lambda _: (dt_w, j_w,
                           jnp.concatenate([tabs_w, tw[:, W:]], axis=1)),
                lambda _: select_event_full(v, s, beta, tw),
                0)
        return jax.lax.cond(viol < 0.5,
                            lambda _: (dt_w, j_w),
                            lambda _: select_event_full(v, s, beta),
                            0)

    def loop_body(carry):
        _, off, k = carry
        if use_window and per_row:
            # Per-row re-anchor (cfg.evolve_window_per_row): each row keeps
            # its own chunk-granular standing roll, so de-synchronised
            # realisations (large sigma) don't share one anchor that must
            # cover the whole block's spread.  The per-row roll is built
            # from n/128 ENUMERATED uniform rolls + per-row selects (Mosaic
            # has no per-row rotate); predicated, so between re-anchors it
            # costs nothing.
            book = out_ref[:]
            lo_r = jnp.min(jnp.where(lane_o < M, book,
                                     jnp.float32(jnp.inf)),
                           axis=1, keepdims=True).astype(jnp.int32)  # (R,1)
            off_col = off_s[:, 0:1]
            p_r = jnp.mod(lo_r - PAD_B - off_col, N)                 # (R,1)
            need = jnp.max(b2f(p_r > TRIGGER)) > 0.5

            @pl.when(need)
            def _reanchor_rows():
                delta = jax.lax.shift_right_logical(p_r, 7)  # chunks (R,1)
                vv, ss, bb = v_s[:], s_s[:], b_s[:]
                v_acc, s_acc, b_acc = vv, ss, bb
                tww = tw_s[:] if warm else None
                tw_acc = tww
                for s_ch in range(1, N // _LANE):
                    sh = N - s_ch * _LANE
                    m = delta == s_ch
                    v_acc = jnp.where(m, pltpu.roll(vv, sh, 1), v_acc)
                    s_acc = jnp.where(m, pltpu.roll(ss, sh, 1), s_acc)
                    b_acc = jnp.where(m, pltpu.roll(bb, sh, 1), b_acc)
                    if warm:
                        tw_acc = jnp.where(m, pltpu.roll(tww, sh, 1), tw_acc)
                v_s[:] = v_acc
                s_s[:] = s_acc
                b_s[:] = b_acc
                if warm:
                    tw_s[:] = tw_acc
                off_s[:] = jnp.broadcast_to(
                    jnp.mod(off_col + delta * _LANE, N), (R, _LANE))
        elif use_window:
            # Re-anchor the standing roll only when the trailing spike has
            # moved SLACK lanes past it (every ~3*SLACK events at reference
            # scale) — pl.when predication makes off-events free.
            book = out_ref[:]
            lo = jnp.min(jnp.where(lane_o < M, book,
                                   jnp.float32(jnp.inf))).astype(jnp.int32)
            # forward drift past SLACK or any backward wrap (p near N) both
            # re-anchor — matching the old per-event window placement to
            # within SLACK lanes in the forward direction only
            p = jnp.mod(lo - PAD_B - off, N)
            need = p > SLACK

            @pl.when(need)
            def _reroll():
                sh = N - p
                v_s[:] = pltpu.roll(v_s[:], sh, 1)
                s_s[:] = pltpu.roll(s_s[:], sh, 1)
                b_s[:] = pltpu.roll(b_s[:], sh, 1)
                if warm:
                    tw_s[:] = pltpu.roll(tw_s[:], sh, 1)

            off = jnp.where(need, jnp.mod(off + p, N), off)

        v = v_s[:]
        s = s_s[:]
        t = t_s[:]
        beta = b_s[:] if use_window else beta_ref[:]
        tw = tw_s[:] if warm else None
        live = jnp.broadcast_to(live_rows(), (R, N))

        if use_window:
            sel = select_event_windowed(v, s, beta, tw)
        else:
            sel = select_event_full(v, s, beta, tw)
        if warm:
            dt_col, j_col, tabs = sel
        else:
            dt_col, j_col = sel
        dt = jnp.broadcast_to(dt_col, (R, N))               # row-const
        j = jnp.broadcast_to(j_col, (R, N))
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)

        # analytic advance + reset of the firing site (:612-617).
        # e^{-dt} is row-constant: one exp per row column, broadcast wide;
        # e^{(1-beta)dt} = e^{dt} * e^{-beta dt} shares the per-lane exp
        # with the synapse decay — 1 per-lane exp instead of 3.
        edt_col = jnp.exp(-dt_col)                          # (R, 1)
        emt = jnp.broadcast_to(edt_col, (R, N))
        # guard: a no-fire row's sentinel dt (~100) underflows e^{-dt} to 0;
        # e^{(1-beta)dt} -> 0 there (beta > 1), so pin the reciprocal to 0
        # instead of inf (the row dies at t > 2T on this same event).
        edtp_col = jnp.where(edt_col > 0.0, 1.0 / edt_col, 0.0)
        edtp = jnp.broadcast_to(edtp_col, (R, N))           # e^{+dt}
        ebdt = jnp.exp(-beta * dt)                          # per-lane
        e1mb = edtp * ebdt                                  # e^{(1-beta)dt}
        v_new = (v * emt + drive * (1.0 - emt)
                 + s * emt / (1.0 - beta) * (e1mb - 1.0))
        v_new = jnp.where(lane_i == j, 0.0, v_new)
        # ring coupling kick recomputed analytically (see coupling.py)
        d = jnp.abs(lane_i - j)
        dist = jnp.minimum(d, N - d).astype(jnp.float32) * dx
        wrow = (jnp.float32(cfg.a1) * jnp.exp(jnp.float32(-cfg.b1) * dist)
                - jnp.float32(cfg.a2) * jnp.exp(jnp.float32(-cfg.b2) * dist)
                ) * dx
        s_new = s * ebdt + beta * wrow
        t_new = t + dt

        v_s[:] = jnp.where(live, v_new, v)
        s_s[:] = jnp.where(live, s_new, s)
        t_s[:] = jnp.where(live, t_new, t)
        if warm:
            # next-event seed: this event's per-lane roots shifted by the
            # elapsed dt.  The firing lane resets to 0 (its state reset
            # makes the old root meaningless; a 0 seed IS the cold start).
            tw_next = jnp.maximum(tabs - dt, 0.0)
            tw_next = jnp.where(lane_i == j, 0.0, tw_next)
            tw_s[:] = jnp.where(live, tw_next, tw)

        # ---- bookkeeping on the packed row (classification, :622-644)
        # last/crossed indices are recorded in ORIGINAL lane coordinates
        # (the restriction maps them to ring positions), so unroll j here
        book = out_ref[:]
        if use_window and per_row:
            j_orig = jnp.mod(j_col + off_s[:, 0:1], N)
        elif use_window:
            j_orig = jnp.mod(j_col + off, N)
        else:
            j_orig = j_col
        jf = j_orig.astype(jnp.float32)                     # (R, 1)
        if record > 0:
            # dead rows write garbage past their own n_events — the replay
            # masks by per-row event count, so no live mask is needed; an
            # overflowing k (>= record) matches no column and degrades
            # gracefully (detected downstream via n_events > record)
            sched_ref[:] = jnp.where(lane_E == k,
                                     jnp.broadcast_to(jf, (R, record)),
                                     sched_ref[:])
        jb = jnp.broadcast_to(jf, (R, _LANE))
        tb = jnp.broadcast_to(t_new[:, 0:1], (R, _LANE))
        liveb = jnp.broadcast_to(live[:, 0:1], (R, _LANE))

        is_last_ind = lane_o < M                            # col m
        last_ind_cols = jnp.where(is_last_ind, book, jnp.inf)
        distf = jnp.abs(jb - last_ind_cols)                 # |j - last_ind[m]|
        dmin = jnp.min(distf, axis=1, keepdims=True)
        # nearest trajectory id (lowest index on ties)
        mcol = jnp.min(jnp.where(distf == dmin, lane_o, M), axis=1,
                       keepdims=True)                       # (R, 1) int32
        mb = jnp.broadcast_to(mcol, (R, _LANE))

        # crossed flag of trajectory m
        flagcols = jnp.where((lane_o >= 4 * M + 2) & (lane_o < 5 * M + 2),
                             book, 0.0)
        m_flag = jnp.max(
            jnp.where(lane_o == mb + (4 * M + 2), flagcols, 0.0),
            axis=1, keepdims=True)                          # 1.0 if crossed
        fresh = m_flag < 0.5
        after = t_new[:, 0:1] > T
        upd_cross = jnp.broadcast_to(fresh & after, (R, _LANE)) & liveb
        upd_last = jnp.broadcast_to(fresh & ~after, (R, _LANE)) & liveb

        new_book = book
        new_book = jnp.where(upd_last & (lane_o == mb), jb, new_book)
        new_book = jnp.where(upd_last & (lane_o == mb + M), tb, new_book)
        new_book = jnp.where(upd_cross & (lane_o == mb + 2 * M), jb, new_book)
        new_book = jnp.where(upd_cross & (lane_o == mb + 3 * M), tb, new_book)
        new_book = jnp.where(upd_cross & (lane_o == mb + 4 * M + 2), 1.0,
                             new_book)
        # event counter
        new_book = jnp.where(liveb & (lane_o == 4 * M + 1), new_book + 1.0,
                             new_book)
        out_ref[:] = new_book

        # f32 count, not integer: under jax_enable_x64 an integer sum builds
        # an int64 accumulator, which Mosaic cannot lower.
        return jnp.sum(b2f(live_rows())), off, k + 1

    n0 = jnp.sum(b2f(live_rows()))
    jax.lax.while_loop(loop_cond, loop_body, (n0, off0, jnp.int32(0)))

    # finalize accept = all crossed flags set
    book = out_ref[:]
    flags = jnp.where((lane_o >= 4 * M + 2) & (lane_o < 5 * M + 2), book, 1.0)
    accept = jnp.min(flags, axis=1, keepdims=True) > 0.5
    out_ref[:] = jnp.where(lane_o == 4 * M,
                           jnp.broadcast_to(b2f(accept), (R, _LANE)),
                           book)


@functools.partial(jax.jit, static_argnames=("cfg", "record_schedule"))
def evolve_ensemble_pallas(cfg: ModelConfig, v0: jax.Array, s0: jax.Array,
                           beta: jax.Array, init_ind: jax.Array,
                           record_schedule: int = 0):
    """Drop-in replacement for :func:`.evolve.evolve_ensemble` (fp32, TPU).

    ``v0``/``s0`` are the shared ``(n_neurons,)`` lift; ``beta`` is
    ``(n_real, n_neurons)``.  ``n_neurons`` must be a multiple of 128.
    The coupling table argument is not needed (recomputed in-kernel).

    ``record_schedule`` (a multiple of 128 > 0) additionally returns the
    ``(n_real, record_schedule)`` int32 firing-order log consumed by the
    df64 schedule replay (:mod:`.replay`) — the in-kernel equivalent of
    ``evolve_ensemble_batched(record_schedule=...)`` at Pallas speed.
    """
    if cfg.n_neurons % _LANE:
        raise ValueError("n_neurons must be a multiple of 128 for the "
                         "Pallas evolve kernel")
    if record_schedule and record_schedule % _LANE:
        raise ValueError("record_schedule must be a multiple of 128")
    M = cfg.n_spikes
    if 5 * M + 2 > _LANE:
        raise ValueError("n_spikes too large for packed output vreg")
    R = cfg.n_real
    r_block = _r_block(cfg.n_neurons, cfg.evolve_warm_start)
    n_blocks = (R + r_block - 1) // r_block
    Rp = n_blocks * r_block
    beta32 = beta.astype(jnp.float32)
    if Rp != R:
        beta32 = jnp.concatenate(
            [beta32, jnp.broadcast_to(beta32[:1], (Rp - R, cfg.n_neurons))])

    # Initial packed bookkeeping row (built outside the kernel so the whole
    # input set is VMEM-blockable — and therefore vmap-batchable for the FD
    # Jacobian): last_ind/crossed_ind = initial indices, crossed_t = 2T.
    lane = jnp.arange(_LANE)
    ind_f = jnp.zeros((_LANE,), jnp.float32)
    ind_f = ind_f.at[0:M].set(init_ind.astype(jnp.float32))
    ind_f = ind_f.at[2 * M:3 * M].set(init_ind.astype(jnp.float32))
    book0 = jnp.where((lane >= 3 * M) & (lane < 4 * M),
                      jnp.float32(2.0 * cfg.t_horizon), ind_f)

    # Trace the kernel with 32-bit semantics pinned (see utils/x64.py).
    from ..utils.x64 import x64_safe_call
    out = x64_safe_call(lambda: _call_kernel(
        cfg, r_block, n_blocks, Rp, record_schedule,
        v0.astype(jnp.float32)[None, :],
        s0.astype(jnp.float32)[None, :],
        beta32, book0[None, :]))
    packed, sched = out if record_schedule else (out, None)

    packed = packed[:R]
    last_ind = packed[:, 0:M].astype(jnp.int32)
    last_t = packed[:, M:2 * M]
    crossed_ind = packed[:, 2 * M:3 * M].astype(jnp.int32)
    crossed_t = packed[:, 3 * M:4 * M]
    accept = packed[:, 4 * M] > 0.5
    n_events = packed[:, 4 * M + 1].astype(jnp.int32)
    result = EvolveResult(last_ind=last_ind, last_time=last_t,
                          crossed_ind=crossed_ind, crossed_time=crossed_t,
                          accept=accept, n_events=n_events)
    if record_schedule:
        return result, sched[:R].astype(jnp.int32)
    return result


def _call_kernel(cfg, r_block, n_blocks, Rp, record, v0, s0, beta32, book0):
    out_shape = jax.ShapeDtypeStruct((Rp, _LANE), jnp.float32)
    out_spec = pl.BlockSpec((r_block, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if record:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((Rp, record), jnp.float32))
        out_spec = (out_spec,
                    pl.BlockSpec((r_block, record), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_evolve_kernel, cfg, r_block, record),
        out_shape=out_shape,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, cfg.n_neurons), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.n_neurons), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_block, cfg.n_neurons), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=(
            [pltpu.VMEM((r_block, cfg.n_neurons), jnp.float32)
             for _ in range(4 if 0 < cfg.evolve_window < cfg.n_neurons
                            else 3)]
            + ([pltpu.VMEM((r_block, _LANE), jnp.int32)]   # per-row anchors
               if cfg.evolve_window_per_row else [])
            + ([pltpu.VMEM((r_block, cfg.n_neurons), jnp.float32)]  # warm
               if cfg.evolve_warm_start else [])
        ),
        interpret=_INTERPRET,
    )(v0, s0, beta32, book0)
