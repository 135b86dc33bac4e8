"""Pallas interp kernels vs the XLA reference implementations.

Runs in Mosaic interpret mode so the CPU test mesh can execute the kernels;
the real-chip numbers live in ``bench.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from armadillocudalinearinterpolation_tpu.ops import interp, interp_pallas


@pytest.fixture(autouse=True)
def _interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_lerp1d_matches_reference():
    n = 1000
    fp = jnp.sin(jnp.linspace(-3, 3, n, dtype=jnp.float32))
    xq = jax.random.uniform(jax.random.PRNGKey(0), (9001,), jnp.float32,
                            -3.5, 3.5)  # odd size + out-of-range queries
    got = interp_pallas.lerp1d(xq, fp, -3.0, 6.0 / (n - 1))
    want = interp.lerp_uniform(xq, fp, -3.0, 6.0 / (n - 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    assert got.shape == xq.shape


def test_lerp1d_table_sizes():
    for n in [2, 100, 128, 129, 4096]:
        fp = jnp.arange(n, dtype=jnp.float32) ** 1.5
        xq = jax.random.uniform(jax.random.PRNGKey(n), (257,), jnp.float32,
                                -1.0, float(n))
        got = interp_pallas.lerp1d(xq, fp, 0.0, 1.0)
        want = interp.lerp_uniform(xq, fp, 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-5)


def test_lerp1d_rejects_oversized_table():
    with pytest.raises(ValueError, match="table too large"):
        interp_pallas.lerp1d(jnp.zeros(8), jnp.zeros(5000), 0.0, 1.0)


def test_bilinear_matches_reference_bf16x2():
    B, H, W, Q = 2, 64, 128, 1501
    grids = jax.random.normal(jax.random.PRNGKey(1), (B, H, W), jnp.float32)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (B, Q, 2), jnp.float32,
                             -3.0, float(H) + 3.0)
    got = interp_pallas.bilinear_batched(pts, grids)
    want = interp.bilinear_batched(pts, grids)
    # bf16x2 split: ~2^-17 relative on O(1) values
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_bilinear_bf16_mode_coarser():
    B, H, W, Q = 1, 64, 128, 1024
    grids = jax.random.normal(jax.random.PRNGKey(1), (B, H, W), jnp.float32)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (B, Q, 2), jnp.float32,
                             0.0, 63.0)
    got = interp_pallas.bilinear_batched(pts, grids, precision="bf16")
    want = interp.bilinear_batched(pts, grids)
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 0.05  # bf16-level


def test_bilinear_unaligned_grid_auto_padded():
    """Non-tiling-aligned grids are zero-padded internally — exact, because
    tent weights vanish on padded rows/cols (queries clip to the original
    extent)."""
    B, H, W, Q = 2, 100, 100, 333
    grids = jax.random.normal(jax.random.PRNGKey(5), (B, H, W), jnp.float32)
    pts = jax.random.uniform(jax.random.PRNGKey(6), (B, Q, 2), jnp.float32,
                             -2.0, float(H) + 2.0)  # incl. boundary/overflow
    got = interp_pallas.bilinear_batched(pts, grids)
    want = interp.bilinear_batched(pts, grids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
