"""Two-parameter existence-boundary tracking (bifurcation-set mapping).

One-parameter continuation (``continuation.py``) finds where a wave family
*ends* along a single axis — e.g. the grazing-type boundary at
``beta* = 16.0144`` (sigma = 0) and ``sigma* = 1.7049`` (beta = 13.0589)
found in round 2 (``artifacts/README.md``).  Those are two points on ONE
curve in the ``(beta, sigma)`` plane: the existence boundary of the slow
3-spike wave family.  This module traces that curve.

Grazing-type ends are *non-smooth* (a membrane trajectory tangentially
loses its threshold crossing — the event count changes), so there is no
smooth augmented system to Newton on, and pseudo-arclength cannot round
them.  The robust primitive that detected them in one parameter — "the
damped solver converges inside, fails outside, and the adaptive step
collapses geometrically against the boundary" — generalises directly:
for each value of the second parameter, bisect the first parameter on
*solvability*, warm-starting every solve from the nearest converged
neighbour, and guard against silently converging onto a coexisting family
(the fast wave) with a wave-speed continuity check.

The reference has no two-parameter capability at all (its one-parameter
sweep is commented out, ``/root/reference/Driver.cu:86-114``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, MapParams, NewtonConfig
from ..model.emap import make_residual_fn
from ..solvers.newton import newton_solve


class BoundaryPoint(NamedTuple):
    """One point on the existence boundary ``beta*(sigma)``."""

    sigma: float
    beta_star: float          # deepest beta that still converges (inside)
    beta_fail: float          # shallowest probed beta that fails (outside)
    Z: np.ndarray             # converged solution at (beta_star, sigma)
    residual_norm: float


def _make_prober(cfg: ModelConfig, key: jax.Array, ncfg: NewtonConfig,
                 evolve_backend: str, family_guard: float):
    """One jitted solve, (beta, sigma, Z0) traced — compiled once."""
    solve = jax.jit(lambda p, z: newton_solve(
        make_residual_fn(cfg, p, key, evolve_backend=evolve_backend),
        z, ncfg))
    dt_ = cfg.jdtype

    def prober(beta: float, sigma: float, Z0, c_ref: float):
        res = solve(MapParams(beta=jnp.asarray(beta, dt_),
                              sigma=jnp.asarray(sigma, dt_)),
                    jnp.asarray(Z0, dt_))
        sol = np.asarray(res.solution)
        ok = (bool(res.converged) and np.all(np.isfinite(sol))
              # family continuity: reject a solve that tunnelled to a
              # coexisting wave family (the slow/fast speeds differ by
              # ~0.19 at overlap; default guard 0.08 splits them)
              and (c_ref is None or abs(float(sol[0]) - c_ref) < family_guard))
        return ok, sol, float(res.residual_norm)

    return prober


def track_existence_boundary(cfg: ModelConfig, key: jax.Array, Z0, beta0,
                             sigma_values: Sequence[float], *,
                             direction: float = +1.0,
                             bracket: float = 0.5,
                             bisect_tol: float = 2e-3,
                             backoff: float = 0.25,
                             family_guard: float = 0.08,
                             ncfg: Optional[NewtonConfig] = None,
                             evolve_backend: str = "auto",
                             max_expand: int = 12,
                             callback: Optional[Callable] = None
                             ) -> list[BoundaryPoint]:
    """Trace the existence boundary ``beta*(sigma)`` of one wave family.

    Args:
      Z0, beta0: a converged point well inside the family at
        ``sigma_values[0]`` (e.g. the ``Driver.cu:24`` fixed point).
      sigma_values: second-parameter values to visit, in walk order;
        each solve warm-starts from the previous boundary point, so
        neighbouring values should be close.
      direction: +1 tracks the upper boundary (largest beta), -1 the lower.
      bracket: outward march step — also the cap on how far any probe's
        warm start travels in beta (keep it near the natural sweep's basin
        scale, ~0.5 at the reference parameters).
      bisect_tol: terminal bracket width in beta.
      backoff: how far inside the previous boundary the next sigma's
        warm-start solve begins (absorbs the boundary's sigma-slope).
      family_guard: max allowed jump in wave speed ``c = Z[0]`` between
        accepted solves (see :func:`_make_prober`).
      max_expand: cap on outward bracket expansions (diverging boundary).
      callback: optional ``f(BoundaryPoint)`` per traced point.

    Returns:
      One :class:`BoundaryPoint` per sigma value successfully traced; the
      walk stops early if the family itself vanishes at some sigma (no
      interior convergence) — the returned prefix is still valid.
    """
    if ncfg is None:
        ncfg = NewtonConfig(tolerance=1e-9, max_iterations=12,
                            fd_mode="exact")
    sgn = 1.0 if direction >= 0 else -1.0
    probe = _make_prober(cfg, key, ncfg, evolve_backend, family_guard)

    Z_in = np.asarray(Z0, dtype=float)
    beta_in = float(beta0)
    c_ref = None          # established by the first interior solve
    out: list[BoundaryPoint] = []

    for sigma in sigma_values:
        sigma = float(sigma)
        # 1) interior re-convergence at this sigma (warm start)
        ok, sol, _ = probe(beta_in, sigma, Z_in, c_ref)
        if not ok:
            # one retry from deeper inside before declaring the family gone
            ok, sol, _ = probe(beta_in - sgn * backoff, sigma, Z_in, c_ref)
            if not ok:
                break
            beta_in = beta_in - sgn * backoff
        Z_in, c_ref = sol, float(sol[0])

        # 2+3) travel-limited adaptive march to the boundary: every probe
        # warm-starts from the current inside point at most `bracket` away
        # in beta (a plain bisection would warm-start across the whole
        # bracket and Newton can spuriously fail far from its basin — the
        # natural sweeps use steps ~0.1 for the same reason), halving the
        # step on failure and growing it while expanding.
        lo, z_lo = beta_in, Z_in
        step = bracket
        hi = None
        rnorm = None
        n_expand = 0
        while hi is None or abs(hi - lo) > bisect_tol:
            cand = lo + sgn * step
            if hi is not None:
                # stay inside the established bracket (midpoint rule), but
                # never probe farther from the inside point than `step`
                cand = sgn * min(sgn * cand, sgn * 0.5 * (lo + hi))
            ok, sol, rn = probe(cand, sigma, z_lo, c_ref)
            if ok:
                lo, z_lo, c_ref, rnorm = cand, sol, float(sol[0]), rn
                if hi is None:
                    step = min(step * 1.5, bracket)
            else:
                hi = cand
                step = max(step * 0.5, 0.25 * bisect_tol)
            if hi is None:
                n_expand += 1
                if n_expand > max_expand:
                    raise RuntimeError(
                        f"no boundary within {max_expand} expansions of "
                        f"beta={beta_in} at sigma={sigma}: family_guard may "
                        "be rejecting valid solves, or the boundary is "
                        "beyond the probed range")
        if rnorm is None:
            _, _, rnorm = probe(lo, sigma, z_lo, c_ref)

        pt = BoundaryPoint(sigma=sigma, beta_star=lo, beta_fail=hi,
                           Z=z_lo, residual_norm=rnorm)
        out.append(pt)
        if callback is not None:
            callback(pt)

        # 4) warm start the next sigma from just inside this boundary
        Z_in, beta_in = z_lo, lo - sgn * backoff
    return out
