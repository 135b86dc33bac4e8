"""Interp op tests: parity with numpy.interp (arma::interp1 semantics) and
bilinear blend identities (BASELINE.md configs 1-2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from armadillocudalinearinterpolation_tpu.ops import interp


def test_interp1d_matches_numpy_interp():
    rng = np.random.default_rng(0)
    xp = np.sort(rng.uniform(-3, 3, 1000))
    xp[0], xp[-1] = -3.0, 3.0
    fp = np.sin(xp)
    xq = rng.uniform(-3.5, 3.5, 10000)  # includes out-of-range queries
    got = interp.interp1d(jnp.asarray(xq), jnp.asarray(xp), jnp.asarray(fp))
    want = np.interp(xq, xp, fp)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-12)


def test_lerp_uniform_matches_interp1d():
    n = 1000
    x0, dx = -3.0, 6.0 / (n - 1)
    xp = x0 + dx * np.arange(n)
    fp = np.sin(xp)
    xq = np.random.default_rng(1).uniform(-3.5, 3.5, 5000)
    got = interp.lerp_uniform(jnp.asarray(xq), jnp.asarray(fp), x0, dx)
    want = np.interp(xq, xp, fp)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-12)


def test_bilinear_exact_on_bilinear_function():
    # A function of the form a + b r + c q + d r q is reproduced exactly.
    h, w = 32, 48
    r, c = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    grid = 2.0 + 0.5 * r - 0.25 * c + 0.125 * r * c
    pts = np.random.default_rng(2).uniform([0, 0], [h - 1, w - 1], (500, 2))
    got = interp.bilinear(jnp.asarray(pts), jnp.asarray(grid))
    want = 2.0 + 0.5 * pts[:, 0] - 0.25 * pts[:, 1] + 0.125 * pts[:, 0] * pts[:, 1]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


def test_bilinear_clamps_at_border():
    grid = jnp.arange(12.0).reshape(3, 4)
    out = interp.bilinear(jnp.array([[-1.0, -5.0], [10.0, 10.0]]), grid)
    np.testing.assert_allclose(np.asarray(out), [0.0, 11.0])


def test_bilinear_batched_shapes_and_values():
    b, h, w, q = 3, 8, 8, 17
    rng = np.random.default_rng(3)
    grids = rng.normal(size=(b, h, w))
    pts = rng.uniform(0, 7, (b, q, 2))
    got = interp.bilinear_batched(jnp.asarray(pts), jnp.asarray(grids))
    assert got.shape == (b, q)
    for i in range(b):
        one = interp.bilinear(jnp.asarray(pts[i]), jnp.asarray(grids[i]))
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(one))


def test_interp_ops_are_jit_and_grad_safe():
    xp = jnp.linspace(-1, 1, 64)
    fp = jnp.sin(xp)
    g = jax.grad(lambda x: interp.interp1d(x, xp, fp))(jnp.asarray(0.3))
    # derivative of piecewise-linear interpolant ~ cos(0.3)
    assert abs(float(g) - np.cos(0.3)) < 1e-2
