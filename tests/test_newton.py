"""Newton solver tests: analytic problems with known roots, FD-vs-analytic
Jacobians, damping, exit flags, history — then the full-map regression."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from armadillocudalinearinterpolation_tpu import (
    NewtonConfig, newton_solve, make_residual_fn)
from armadillocudalinearinterpolation_tpu.solvers.newton import fd_jacobian
from armadillocudalinearinterpolation_tpu.solvers.criterion import (
    residual_norm_criterion, relative_criterion)


def quad(x):
    """F(x) = x^2 - a with roots sqrt(a)."""
    return x * x - jnp.array([4.0, 9.0])


def test_newton_solves_quadratic():
    cfg = NewtonConfig(tolerance=1e-12, max_iterations=30, fd_epsilon=1e-7)
    res = newton_solve(quad, jnp.array([1.0, 1.0]), cfg)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.solution), [2.0, 3.0], rtol=1e-10)
    # residual history is NaN-padded past the exit and ends below tolerance
    h = np.asarray(res.residual_history)
    it = int(res.iterations)
    assert np.isnan(h[it + 1:]).all()
    assert h[it] <= 1e-12
    assert h[0] > h[it]


def test_newton_analytic_jacobian_hook():
    cfg = NewtonConfig(tolerance=1e-12, max_iterations=30)
    jac = lambda x: jnp.diag(2.0 * x)
    res = newton_solve(quad, jnp.array([1.0, 1.0]), cfg, jacobian_fn=jac)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.solution), [2.0, 3.0], rtol=1e-10)
    # exported jacobian == the analytic one at the penultimate iterate
    assert res.jacobian.shape == (2, 2)


def test_fd_jacobian_matches_analytic():
    x = jnp.array([1.5, -2.0, 0.5])
    F = lambda u: jnp.array([u[0] * u[1], jnp.sin(u[2]), u[0] + u[2] ** 2])
    J_fd = fd_jacobian(F, x, F(x), 1e-7)
    J_an = jax.jacfwd(F)(x)
    np.testing.assert_allclose(np.asarray(J_fd), np.asarray(J_an), atol=1e-5)


def test_newton_nonconvergence_exit_flag():
    """No real root: exit flag notConverged after max_iterations
    (NewtonSolver.cpp:137-144)."""
    F = lambda x: x * x + jnp.ones(1)
    cfg = NewtonConfig(tolerance=1e-12, max_iterations=5)
    res = newton_solve(F, jnp.array([1.0]), cfg)
    assert not bool(res.converged)
    assert int(res.iterations) == 5


def test_newton_damping_slows_but_converges():
    cfg = NewtonConfig(tolerance=1e-10, max_iterations=60, damping=0.5)
    res = newton_solve(quad, jnp.array([1.0, 1.0]), cfg)
    assert bool(res.converged)
    assert int(res.iterations) > 5  # damped => more iterations than full step


def test_relative_criterion():
    crit = relative_criterion(1e-3, jnp.asarray(10.0))
    assert bool(crit(jnp.asarray(0.009)))
    assert not bool(crit(jnp.asarray(0.011)))


def test_newton_zero_iterations_when_converged_at_start():
    F = lambda x: jnp.zeros_like(x)
    cfg = NewtonConfig(tolerance=1e-8, max_iterations=10)
    res = newton_solve(F, jnp.array([1.0, 2.0]), cfg)
    assert bool(res.converged)
    assert int(res.iterations) == 0


@pytest.mark.slow
def test_newton_converges_on_event_driven_map(cfg, params, key, z_ref):
    """The headline regression: Newton-solve the map at beta=13.0589 from the
    reference's initial guess (Driver.cu:24-31) on the fp64 oracle path."""
    F = make_residual_fn(cfg, params, key)
    ncfg = NewtonConfig(tolerance=1e-10, max_iterations=15, fd_epsilon=1e-7)
    res = jax.jit(lambda z: newton_solve(F, z, ncfg))(z_ref)
    assert bool(res.converged)
    assert int(res.iterations) <= 8
    sol = np.asarray(res.solution)
    # fixed point lies near the reference guess (N=512 discretisation)
    np.testing.assert_allclose(sol, [0.331, 0.6914, 1.3557], atol=0.05)
    # quadratic convergence: final residual far below tolerance
    assert float(res.residual_norm) < 1e-11


def test_central_fd_jacobian_matches_analytic():
    from armadillocudalinearinterpolation_tpu.solvers.newton import (
        central_fd_jacobian)
    x = jnp.array([1.5, -2.0, 0.5])
    F = lambda u: jnp.array([u[0] * u[1], jnp.sin(u[2]), u[0] + u[2] ** 2])
    J_fd = central_fd_jacobian(F, x, 1e-5)
    J_an = jax.jacfwd(F)(x)
    # central: O(eps^2) truncation — much tighter than forward at same eps
    np.testing.assert_allclose(np.asarray(J_fd), np.asarray(J_an), atol=1e-9)


def test_newton_central_mode_solves():
    cfg = NewtonConfig(tolerance=1e-12, max_iterations=30, fd_epsilon=1e-5,
                       fd_mode="central")
    res = newton_solve(quad, jnp.array([1.0, 1.0]), cfg)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.solution), [2.0, 3.0],
                               rtol=1e-10)


def test_divergence_cutoff_stops_runaway():
    """divergence_factor abandons a runaway iterate early; the default
    (inf) preserves the reference's run-to-max_iterations behavior."""
    import jax

    from armadillocudalinearinterpolation_tpu import (NewtonConfig,
                                                      newton_solve)

    def F(x):  # x^2 + 1 = 0: no real root; Newton runs away fast
        return x * x + 1.0

    x0 = jnp.asarray([0.1])
    capped = NewtonConfig(tolerance=1e-9, max_iterations=25,
                          divergence_factor=10.0)
    res = jax.jit(lambda z: newton_solve(F, z, capped))(x0)
    assert not bool(res.converged)
    assert int(res.iterations) <= 3  # stopped at the first >10x overshoot

    free = NewtonConfig(tolerance=1e-9, max_iterations=25)
    res2 = jax.jit(lambda z: newton_solve(F, z, free))(x0)
    assert not bool(res2.converged)
    assert int(res2.iterations) == 25  # reference behavior: full budget


def test_host_solver_F_args_threading():
    """F_args are traced arguments of the cached programs: two solves at
    DIFFERENT parameters through the same jit_cache must each solve their
    own problem (closed-over params would bake step 0's values into the
    cached jaxpr as constants)."""
    from armadillocudalinearinterpolation_tpu import (NewtonConfig,
                                                      newton_solve_host)
    from armadillocudalinearinterpolation_tpu.solvers.newton import (
        frozen_jacobian_polish)

    def F(x, a):  # root at x = sqrt(a), component-wise
        return x * x - a

    cache = {}
    ncfg = NewtonConfig(tolerance=1e-12, max_iterations=30, fd_mode="exact")
    for a_val in (4.0, 9.0):
        a = jnp.asarray([a_val, a_val])
        res = newton_solve_host(F, jnp.asarray([1.0, 1.0]), ncfg,
                                jit_cache=cache, F_args=(a,))
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.solution),
                                   np.sqrt([a_val, a_val]), rtol=1e-10)

    # the polish threads F_args the same way (and through the same cache)
    a = jnp.asarray([16.0, 16.0])
    pol = frozen_jacobian_polish(
        F, jnp.asarray([4.1, 4.1]), jnp.eye(2) * 8.2,
        max_iterations=20, tolerance=1e-10, jit_cache=cache, F_args=(a,))
    assert bool(pol.converged)
    np.testing.assert_allclose(np.asarray(pol.solution), [4.0, 4.0],
                               rtol=1e-8)


def test_host_solver_F_args_fd_modes():
    """F_args threading through the finite-difference Jacobian paths
    (batched central, batched forward, and serial_fd), sharing one cache."""
    from armadillocudalinearinterpolation_tpu import (NewtonConfig,
                                                      newton_solve_host)

    def F(x, a):
        return x * x - a

    for mode, serial in (("central", False), ("forward", False),
                         ("central", True)):
        cache = {}
        ncfg = NewtonConfig(tolerance=1e-11, max_iterations=30,
                            fd_epsilon=1e-6, fd_mode=mode)
        for a_val in (4.0, 25.0):
            res = newton_solve_host(F, jnp.asarray([3.0, 3.0]), ncfg,
                                    jit_cache=cache, serial_fd=serial,
                                    F_args=(jnp.asarray([a_val, a_val]),))
            assert bool(res.converged), (mode, serial, a_val)
            np.testing.assert_allclose(np.asarray(res.solution),
                                       np.sqrt([a_val, a_val]), rtol=1e-8)


def test_warm_start_jacobian_quasi_mode(cfg, params, key, z_ref):
    """jacobian0 (quasi-Newton with refresh-on-failure) must reach the
    same root as the plain iteration, testing convergence on the true
    residual.  (The on-chip sweep A/B rejected it for the judged sweep —
    see the docstring — but the API contract stands.)"""
    from armadillocudalinearinterpolation_tpu import (
        make_residual_fn, newton_solve, NewtonConfig, MapParams)

    ncfg = NewtonConfig(tolerance=1e-9, max_iterations=20, fd_epsilon=1e-7)
    F = make_residual_fn(cfg, params, key)
    r0 = jax.jit(lambda z: newton_solve(F, z, ncfg))(z_ref)
    assert bool(r0.converged)
    F2 = make_residual_fn(
        cfg, MapParams.create(13.1589, 0.0, dtype="float64"), key)
    r_q = jax.jit(lambda z, j: newton_solve(F2, z, ncfg, jacobian0=j))(
        r0.solution, r0.jacobian)
    r_p = jax.jit(lambda z: newton_solve(F2, z, ncfg))(r0.solution)
    assert bool(r_q.converged) and bool(r_p.converged)
    np.testing.assert_allclose(np.asarray(r_q.solution),
                               np.asarray(r_p.solution), atol=1e-7)
