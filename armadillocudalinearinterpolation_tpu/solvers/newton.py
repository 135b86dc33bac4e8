"""Damped Newton fixed-point solver, fully on-device.

Reference: ``NewtonSolver`` (``/root/reference/NewtonSolver.cpp:40-245``).
Structural differences (the TPU-native wins, per SURVEY.md §7):

  * The whole solve is one ``lax.while_loop`` under ``jit`` — no host↔device
    traffic between iterations (the reference round-trips per residual).
  * The finite-difference Jacobian's ``n`` perturbed residual evaluations are
    batched with ``vmap`` into a single device launch, versus the reference's
    serial column loop (``NewtonSolver.cpp:181-195``).  For the event-driven
    map this multiplies the ensemble batch by ``n_spikes + 1`` — exactly the
    kind of width the TPU wants.
  * An analytic-Jacobian hook replaces ``AbstractNonlinearProblemJacobian``
    (``/root/reference/AbstractNonlinearProblemJacobian.hpp:11``).
  * The final Jacobian is always returned (the reference's optional
    ``pJacobianExternal`` export, ``NewtonSolver.cpp:153-159``) so stability
    analysis can reuse it without re-evaluating the map.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import NewtonConfig
from .criterion import Criterion, residual_norm_criterion
from .linalg import solve_dense


class NewtonResult(NamedTuple):
    """Outcome of :func:`newton_solve` (exit flag + history, cf.
    ``AbstractNonlinearSolver::ExitFlagType``,
    ``/root/reference/AbstractNonlinearSolver.hpp:16-19``)."""

    solution: jax.Array          # (n,) final iterate
    converged: jax.Array         # () bool exit flag
    iterations: jax.Array        # () int32 — iterations performed
    residual_norm: jax.Array     # () final ||r||
    residual_history: jax.Array  # (max_iterations + 1,), NaN-padded
    jacobian: jax.Array          # (n, n) last Jacobian (identity if 0 iters)
    residual: jax.Array          # (n,) final residual


def fd_jacobian(F: Callable[[jax.Array], jax.Array], x: jax.Array,
                f: jax.Array, epsilon: float) -> jax.Array:
    """Forward-difference Jacobian with all columns batched in one launch.

    ``jac[:, i] = (F(x + eps * e_i) - f) / eps`` (``NewtonSolver.cpp:164-197``),
    evaluated as ``vmap(F)`` over the ``n`` perturbed points.
    """
    n = x.shape[0]
    eps = jnp.asarray(epsilon, x.dtype)
    perturbed = x[None, :] + eps * jnp.eye(n, dtype=x.dtype)
    df = jax.vmap(F)(perturbed)                     # (n, n): row i = F(x + eps e_i)
    return (df - f[None, :]).T / eps


def central_fd_jacobian(F: Callable[[jax.Array], jax.Array], x: jax.Array,
                        epsilon: float) -> jax.Array:
    """Central-difference Jacobian, all ``2n`` evaluations in one launch.

    O(eps^2) truncation error vs forward's O(eps) — on the fp32 fast path
    the optimal epsilon is larger and the Newton floor correspondingly
    deeper (measured ~15x at N=4096).  (Beyond the reference, which only
    does forward differences.)  Caveat for the event-driven map: its
    residual has O(dx) staircase discontinuities (spike seeding quantises
    with c), and a symmetric stencil straddling a step produces a garbage
    slope — prefer forward differencing on coarse grids (N < ~2048).
    """
    n = x.shape[0]
    eps = jnp.asarray(epsilon, x.dtype)
    e = eps * jnp.eye(n, dtype=x.dtype)
    pts = jnp.concatenate([x[None, :] + e, x[None, :] - e])
    vals = jax.vmap(F)(pts)                         # (2n, n)
    return (vals[:n] - vals[n:]).T / (2.0 * eps)


def jacfwd_cols(F: Callable[..., jax.Array]) -> Callable[..., jax.Array]:
    """Column-wise forward-mode Jacobian: ``n`` sequential ``jax.jvp``
    calls in one trace instead of ``jax.jacfwd``'s vmap-of-jvp.

    Numerically identical to ``jax.jacfwd(F)`` (argnums=0; extra args pass
    through as constants).  Exists because vmapping tangents through the
    replay's sequential event loop is pathological on the TPU backend:
    measured (v5e, N=4096 R=64, cfg.replay_jvp="f32") one jvp = 79 ms but
    vmap over 3 tangents = 5.9 s — ~25x the 3-column cost — for BOTH the
    while-loop and scan forms of the loop, while three sequential jvp
    columns in one jit share the primal chain and run in 176 ms.  Every
    exact-mode Jacobian consumer in the package routes through this
    helper; callers composing ``jax.jacfwd`` directly over replay-backed
    residuals pay the vmap path.
    """
    def jac(x: jax.Array, *args) -> jax.Array:
        n = x.shape[0]
        eye = jnp.eye(n, dtype=x.dtype)
        cols = [jax.jvp(lambda xx: F(xx, *args), (x,), (eye[i],))[1]
                for i in range(n)]
        return jnp.stack(cols, axis=-1)
    return jac


def _print_header(max_iterations, tolerance):
    # AbstractNonlinearSolver::PrintHeader (AbstractNonlinearSolver.cpp:11-25)
    bar = "-" * 48
    print(bar)
    print(" Attempt to solve nonlinear problem with Newton Method")
    print(f" max number of iterations = {max_iterations}")
    print(f" tolerance = {tolerance}")
    print(bar)
    print(f"{'Iteration':>10}{'error estimate':>25}")


def _print_iteration(iteration, norm):
    # AbstractNonlinearSolver::PrintIteration (AbstractNonlinearSolver.cpp:75-95)
    print(f"{int(iteration):>10}{float(norm):>25.6e}")


def _print_footer(iterations, converged):
    # AbstractNonlinearSolver::PrintFooter (AbstractNonlinearSolver.cpp:28-72)
    print("-" * 48)
    verb = "converged" if bool(converged) else "failed to converge"
    print(f"The method {verb} after {int(iterations)} iterations")


def live_log_supported() -> bool:
    """Whether the active backend can run host callbacks mid-solve.

    The axon TPU PJRT implements no host send/recv, so live per-iteration
    logging (``AbstractNonlinearSolver.cpp:75-95``) is only possible on CPU;
    every other backend gets the post-solve replay
    (:func:`print_iteration_table`) instead.
    """
    return jax.default_backend() == "cpu"


def print_iteration_table(result: "NewtonResult", cfg: NewtonConfig) -> None:
    """Replay the solve's iteration log in the reference's table format.

    Host-side replay of ``residual_history`` for backends without host
    callbacks (``AbstractNonlinearSolver::PrintHeader/PrintIteration/
    PrintFooter``, ``/root/reference/AbstractNonlinearSolver.cpp:11-95``).
    Call after the solve's arrays have materialised.
    """
    import numpy as np
    _print_header(cfg.max_iterations, cfg.tolerance)
    hist = np.asarray(result.residual_history)
    for it in range(int(result.iterations) + 1):
        _print_iteration(it, hist[it])
    _print_footer(result.iterations, result.converged)


def _check_fd_mode(cfg: NewtonConfig) -> None:
    """Unknown modes must fail loudly: an unrecognised ``fd_mode`` would
    silently take the forward-FD branch — in particular ``"frozen"``, which
    only the map-aware entry points implement (``staged.newton_solve_frozen``
    / ``continuation.make_arclength_step_frozen``)."""
    if cfg.fd_mode not in ("forward", "central", "exact"):
        raise ValueError(
            f"fd_mode {cfg.fd_mode!r} is not supported by the generic "
            "Newton solvers (use 'forward', 'central' or 'exact'; "
            "'frozen'/'frozen-fwd' live in solvers.staged."
            "newton_solve_frozen and analysis.continuation."
            "make_arclength_step_frozen)")


def newton_solve(
    F: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    cfg: NewtonConfig,
    *,
    jacobian_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    criterion: Optional[Criterion] = None,
    jacobian0: Optional[jax.Array] = None,
) -> NewtonResult:
    """Solve ``F(x) = 0`` by damped Newton iteration (``NewtonSolver.cpp:40-161``).

    Args:
      F: residual oracle ``(n,) -> (n,)`` (must be JAX-traceable).
      x0: initial guess.
      cfg: solver parameters (tolerance / max_iterations / fd_epsilon /
        damping / print_output — the reference ``ParameterList``).
      jacobian_fn: optional analytic Jacobian ``x -> (n, n)``; finite
        differences otherwise.
      criterion: convergence test on the residual norm; defaults to the
        absolute norm test at ``cfg.tolerance``.
      jacobian0: optional warm-start Jacobian (quasi-Newton with
        refresh-on-failure — beyond the reference).  Each iteration first
        takes a step with the carried Jacobian at ONE map evaluation; the
        fresh Jacobian (FD batch / jacfwd / ``jacobian_fn``) is computed
        only when that step fails sufficient decrease (``|F| <= 0.9 |F|``),
        and the refreshed step replaces it.  Convergence is always tested
        on the true residual, so results are exactly as trustworthy as the
        plain iteration — only the launch count changes.  The exported
        ``result.jacobian`` is guaranteed to belong to THIS map: if every
        step accepted the carried (possibly foreign) Jacobian, a fresh
        one is computed at the final iterate before returning (stability
        analysis eigendecomposes the export).  ``None`` (default)
        preserves the exact reference iteration.
        Measured caveat (on-chip A/B, v5e 2026-08-20): on the reference
        continuation sweep (N=512, R=1024, sigma=0.1, tol 1e-4, 10-iter
        budget) this LOSES — accepted-but-slow quasi steps (norm ratio
        just under 0.9) exhaust the iteration budget, dropping converged
        steps from 61/100 to 28/100 for a 4% time win, so the sweep
        keeps the plain iteration.  Use it where iterations are cheap
        relative to Jacobians and budgets are loose (deep-tolerance
        smooth solves: CPU f64 probe converged to 1e-10 in 9
        one-eval iterations vs 4 four-eval ones).

    The solve is traceable: wrap in ``jax.jit`` for one fused device program.
    """
    test = criterion if criterion is not None else residual_norm_criterion(
        cfg.tolerance)
    _check_fd_mode(cfg)
    n = x0.shape[0]
    dt_ = x0.dtype

    # Live iteration logging needs host callbacks; backends without them
    # (the axon TPU PJRT) get the reference-format table via a post-solve
    # replay instead — call :func:`print_iteration_table` on the result
    # (the CLI driver does this automatically).
    log = cfg.print_output and live_log_supported()

    f0 = F(x0)
    norm0 = jnp.linalg.norm(f0)
    history0 = jnp.full((cfg.max_iterations + 1,), jnp.nan, dt_).at[0].set(norm0)

    if log:
        jax.debug.callback(_print_header, cfg.max_iterations, cfg.tolerance)
        jax.debug.callback(_print_iteration, jnp.int32(0), norm0)

    class Carry(NamedTuple):
        x: jax.Array
        f: jax.Array
        norm: jax.Array
        it: jax.Array
        converged: jax.Array
        history: jax.Array
        jacobian: jax.Array
        jac_stale: jax.Array     # quasi mode: carried J is not this map's

    init = Carry(x=x0, f=f0, norm=norm0, it=jnp.int32(0),
                 converged=test(norm0), history=history0,
                 jacobian=(jacobian0.astype(dt_) if jacobian0 is not None
                           else jnp.eye(n, dtype=dt_)),
                 jac_stale=jnp.asarray(jacobian0 is not None))

    def cond(c: Carry):
        keep = jnp.logical_and(c.it < cfg.max_iterations, ~c.converged)
        if cfg.divergence_factor != float("inf"):
            # early-divergence cutoff (see NewtonConfig): a runaway iterate
            # cannot converge within the budget; stop paying for it.  NaN
            # norms compare False and stop too.
            keep = jnp.logical_and(
                keep, c.norm <= cfg.divergence_factor * norm0)
        return keep

    def fresh_jacobian(x, f):
        if jacobian_fn is not None:
            return jacobian_fn(x)
        if cfg.fd_mode == "exact":
            # Exact forward-mode Jacobian: n tangents through the whole
            # map (the event-time root carries an implicit-function-
            # theorem custom JVP, events.py).  No FD epsilon, no
            # differencing noise; requires a differentiable evolve
            # backend (the Pallas kernel defines no JVP).  Column form,
            # not jax.jacfwd — see jacfwd_cols.
            return jacfwd_cols(F)(x)
        if cfg.fd_mode == "central":
            return central_fd_jacobian(F, x, cfg.fd_epsilon)
        return fd_jacobian(F, x, f, cfg.fd_epsilon)

    def body(c: Carry) -> Carry:
        if jacobian0 is None:
            jac = fresh_jacobian(c.x, c.f)
            # solve_dense, not jnp.linalg.solve: XLA's LU custom-call is
            # f32-only on TPU and would break the fully-f64 on-chip solve.
            direction = solve_dense(jac, -c.f)
            x = c.x + jnp.asarray(cfg.damping, dt_) * direction
            f = F(x)
            norm = jnp.linalg.norm(f)
            stale = c.jac_stale
        else:
            # Quasi-Newton with refresh-on-failure (see ``jacobian0``): try
            # the carried Jacobian at one evaluation; refresh only when the
            # step misses sufficient decrease.  NaN norms compare False on
            # the acceptance test, routing straight to the refresh branch.
            d_try = solve_dense(c.jacobian, -c.f)
            x_try = c.x + jnp.asarray(cfg.damping, dt_) * d_try
            f_try = F(x_try)
            n_try = jnp.linalg.norm(f_try)

            def accept(_):
                return x_try, f_try, n_try, c.jacobian, c.jac_stale

            def refresh(_):
                jac = fresh_jacobian(c.x, c.f)
                d2 = solve_dense(jac, -c.f)
                x2 = c.x + jnp.asarray(cfg.damping, dt_) * d2
                f2 = F(x2)
                return x2, f2, jnp.linalg.norm(f2), jac, jnp.asarray(False)

            x, f, norm, jac, stale = jax.lax.cond(
                n_try <= 0.9 * c.norm, accept, refresh, 0)
        it = c.it + 1
        if log:
            jax.debug.callback(_print_iteration, it, norm)
        return Carry(x=x, f=f, norm=norm, it=it, converged=test(norm),
                     history=c.history.at[it].set(norm), jacobian=jac,
                     jac_stale=stale)

    out = jax.lax.while_loop(cond, body, init)

    jac_out = out.jacobian
    if jacobian0 is not None:
        # Export contract: NewtonResult.jacobian must belong to THIS map
        # (stability analysis eigendecomposes it).  If every quasi step was
        # accepted, the carry still holds the caller's warm-start Jacobian —
        # possibly from a different parameter point; recompute at the final
        # iterate in that case (one Jacobian batch, only when stale).
        jac_out = jax.lax.cond(
            out.jac_stale,
            lambda: fresh_jacobian(out.x, out.f),
            lambda: out.jacobian)

    if log:
        jax.debug.callback(_print_footer, out.it, out.converged)

    return NewtonResult(solution=out.x, converged=out.converged,
                        iterations=out.it, residual_norm=out.norm,
                        residual_history=out.history, jacobian=jac_out,
                        residual=out.f)


def newton_solve_host(
    F: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    cfg: NewtonConfig,
    *,
    jacobian_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    criterion: Optional[Criterion] = None,
    serial_fd: bool = False,
    jit_cache: Optional[dict] = None,
    F_args: tuple = (),
) -> NewtonResult:
    """Host-driven Newton: same semantics as :func:`newton_solve`, but the
    outer loop runs in Python with one short device program per step.

    Two reasons to prefer this on the tunneled TPU:

      * **Bounded program duration.**  A fully-fused f64 solve at N=4096 is a
        single >10-minute device program, which the TPU worker behind the
        tunnel kills (observed crash).  Here no dispatch outlives one map
        evaluation (``serial_fd=True``) or one batched Jacobian.
      * **Live iteration logging on every backend** — the reference's
        per-iteration table (``AbstractNonlinearSolver.cpp:75-95``) prints in
        real time even where host callbacks are unimplemented, because the
        loop IS on the host.

    Args:
      serial_fd: evaluate finite-difference Jacobian columns as separate
        dispatches (n+1 short programs) instead of one ``vmap`` batch —
        trades throughput for the shortest possible device programs.
      jit_cache: optional dict reused across calls with the SAME ``F``
        *object* — keeps the jitted residual/Jacobian wrappers (and their
        trace caches) alive, so a second solve pays zero re-tracing (the
        replay map's trace alone is ~13 s at N=4096).
      F_args: extra *traced* arguments forwarded as ``F(x, *F_args)`` —
        pass sweep parameters (e.g. ``(params, key)``) here instead of
        closing over them, so a parameter sweep sharing ``jit_cache``
        re-traces nothing (closed-over arrays would be baked into the
        cached jaxpr as constants).
    """
    test = criterion if criterion is not None else residual_norm_criterion(
        cfg.tolerance)
    _check_fd_mode(cfg)
    n = x0.shape[0]
    dt_ = x0.dtype
    cache = jit_cache if jit_cache is not None else {}
    # identity guard, like every other cache-sharing entry point: the
    # cached "F"/"J" programs belong to ONE residual object — a cache
    # shared across different F objects would silently solve the first
    # call's map (sweep parameters belong in F_args, which are traced)
    if cache.setdefault("_F_identity", F) is not F:
        raise ValueError(
            "jit_cache was built for a different F object — its cached "
            "residual/Jacobian programs would silently solve that F.  "
            "Reuse the same F (vary sweep parameters via F_args) or use "
            "a fresh cache.")
    Fj_raw = cache.setdefault("F", jax.jit(F))
    Fj = (lambda x: Fj_raw(x, *F_args)) if F_args else Fj_raw
    # hoisted so exact mode traces/lowers the Jacobian program once, not
    # once per iteration (a fresh jax.jit wrapper has an empty trace cache).
    # column-wise over argnums=0: F_args are parameters, not unknowns.
    Jf_raw = (cache.setdefault("J", jax.jit(jacfwd_cols(F)))
              if cfg.fd_mode == "exact" else None)
    Jf = ((lambda x: Jf_raw(x, *F_args)) if F_args else Jf_raw) \
        if Jf_raw is not None else None
    eps = cfg.fd_epsilon

    if cfg.print_output:
        _print_header(cfg.max_iterations, cfg.tolerance)

    x = x0
    f = Fj(x)
    norm = jnp.linalg.norm(f)
    history = [float(norm)]
    if cfg.print_output:
        _print_iteration(0, norm)
    converged = bool(test(norm))
    jac = jnp.eye(n, dtype=dt_)
    it = 0

    while it < cfg.max_iterations and not converged:
        if jacobian_fn is not None:
            jac = jacobian_fn(x)
        elif cfg.fd_mode == "exact":
            jac = Jf(x)
        elif serial_fd:
            cols = []
            basis = jnp.eye(n, dtype=dt_)
            if cfg.fd_mode == "central":
                for i in range(n):
                    fp = Fj(x + eps * basis[i])
                    fm = Fj(x - eps * basis[i])
                    cols.append((fp - fm) / (2.0 * eps))
            else:
                for i in range(n):
                    cols.append((Fj(x + eps * basis[i]) - f) / eps)
            jac = jnp.stack(cols, axis=1)
        elif cfg.fd_mode == "central":
            jac = central_fd_jacobian(Fj, x, eps)
        else:
            jac = fd_jacobian(Fj, x, f, eps)
        direction = solve_dense(jac, -f)
        x = x + jnp.asarray(cfg.damping, dt_) * direction
        f = Fj(x)
        norm = jnp.linalg.norm(f)
        it += 1
        history.append(float(norm))
        if cfg.print_output:
            _print_iteration(it, norm)
        converged = bool(test(norm))

    if cfg.print_output:
        _print_footer(it, converged)

    hist = jnp.full((cfg.max_iterations + 1,), jnp.nan, dt_)
    hist = hist.at[:len(history)].set(jnp.asarray(history, dt_))
    return NewtonResult(solution=x, converged=jnp.asarray(converged),
                        iterations=jnp.int32(it), residual_norm=norm,
                        residual_history=hist, jacobian=jac, residual=f)


def frozen_jacobian_polish(
    F: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    jacobian: jax.Array,
    *,
    max_iterations: int = 8,
    tolerance: float = 0.0,
    jit_cache: Optional[dict] = None,
    F_args: tuple = (),
) -> NewtonResult:
    """Quasi-Newton polish with a frozen Jacobian, keeping the best iterate.

    Near a root of a *piecewise-smooth* residual the full Newton iteration
    stops contracting once ``|F|`` reaches the local discontinuity scale
    (for the event-driven map at N=4096 the event-reordering jumps sit at
    ~1e-8; VERDICT.md round 1, missing item #1) and starts bouncing around
    the jump landscape.  This polish reuses one Jacobian — the smooth-part
    slope, still accurate at that scale — so each step costs a single map
    evaluation, and returns the lowest-norm iterate visited, i.e. the
    deepest point of the landscape found.  The returned ``residual_norm``
    is a plain ``|F(solution)|`` — independently verifiable.
    """
    cache = jit_cache if jit_cache is not None else {}
    if cache.setdefault("_F_identity", F) is not F:
        raise ValueError(
            "jit_cache was built for a different F object — its cached "
            "residual program would silently polish on that F.  Reuse "
            "the same F (vary sweep parameters via F_args) or use a "
            "fresh cache.")
    Fj_raw = cache.setdefault("F", jax.jit(F))
    Fj = (lambda x: Fj_raw(x, *F_args)) if F_args else Fj_raw
    x = x0
    best_x, best_f, best_norm = x0, None, float("inf")
    # A frozen-Jacobian iteration on a jumpy landscape can lock into a
    # 2-cycle (observed at N=4096), revisiting the same two points forever;
    # stepping from the BEST iterate with a varied damping schedule keeps
    # every sample distinct and explores the neighbourhood at several
    # scales.  Deterministic (no RNG) so bench results are reproducible.
    dampings = (1.0, 0.5, 1.5, 0.75, 1.25, 0.35, 0.9, 1.1)
    it = 0
    for it in range(max_iterations + 1):
        f = Fj(x)
        norm = float(jnp.linalg.norm(f))
        # `or best_f is None`: a NaN first residual (caller handed a
        # diverged iterate) must still populate best_f, else the damped
        # step below negates None and crashes — with it, the polish
        # degrades to returning (x0, nan, converged=False)
        if norm < best_norm or best_f is None:
            best_x, best_f, best_norm = x, f, norm
        if norm <= tolerance or it == max_iterations:
            break
        damp = dampings[it % len(dampings)]
        x = best_x + damp * solve_dense(jacobian, -best_f)
    n = x0.shape[0]
    hist = jnp.full((max_iterations + 1,), jnp.nan, x0.dtype)
    # converged means the tolerance was actually met; with the default
    # tolerance=0.0 the polish is best-effort and reports not-converged
    # (callers gate acceptance on this flag).
    return NewtonResult(
        solution=best_x,
        converged=jnp.asarray(best_norm <= tolerance),
        iterations=jnp.int32(it), residual_norm=jnp.asarray(best_norm),
        residual_history=hist.at[0].set(best_norm), jacobian=jacobian,
        residual=best_f if best_f is not None else jnp.zeros((n,), x0.dtype))
