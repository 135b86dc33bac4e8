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
    # tables up to 64k nodes are supported (rolled chunk sweep); beyond that
    # the kernel still refuses rather than silently spilling VMEM
    with pytest.raises(ValueError, match="table too large"):
        interp_pallas.lerp1d(jnp.zeros(8), jnp.zeros(interp_pallas.MAX_TABLE + 1),
                             0.0, 1.0)


def test_make_interp1d_rejects_bad_nodes():
    with pytest.raises(ValueError, match="strictly increasing"):
        interp_pallas.make_interp1d(jnp.array([0.0, 2.0, 1.0]),
                                    jnp.zeros(3))
    with pytest.raises(ValueError, match="at least 2"):
        interp_pallas.make_interp1d(jnp.array([0.0]), jnp.zeros(1))


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


def test_lerp1d_large_table_rolled_sweep():
    # > _UNROLL_CHUNKS chunks exercises the fori_loop chunk sweep
    n = 8192
    fp = jnp.cos(jnp.linspace(0, 20, n, dtype=jnp.float32))
    xq = jax.random.uniform(jax.random.PRNGKey(11), (513,), jnp.float32,
                            -1.0, 21.0)
    got = interp_pallas.lerp1d(xq, fp, 0.0, 20.0 / (n - 1))
    want = interp.lerp_uniform(xq, fp, 0.0, 20.0 / (n - 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_interp1d_nonuniform_matches_reference():
    key = jax.random.PRNGKey(12)
    n = 700
    gaps = 0.05 + jax.random.uniform(key, (n - 1,), jnp.float32)
    xp = jnp.concatenate([jnp.zeros(1), jnp.cumsum(gaps)])
    fp = jnp.sin(0.3 * xp) + 0.1 * xp
    xq = jax.random.uniform(jax.random.PRNGKey(13), (1025,), jnp.float32,
                            -2.0, float(xp[-1]) + 2.0)  # incl. extrapolation
    got = interp_pallas.interp1d(xq, xp, fp)
    want = interp.interp1d(xq, xp, fp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_interp1d_nonuniform_dense_cluster():
    # pathologically dense cluster -> large max-span S; must stay exact.
    # Compare at f32 (the kernel's precision): under the conftest's x64 an
    # f64 reference differs by ~ulp(x)/gap in t, which the 1e-4-wide cluster
    # amplifies to ~1e-3 in value — a precision mismatch, not a kernel bug.
    xp = jnp.concatenate([jnp.linspace(0.0, 1.0, 50),
                          1.0 + jnp.linspace(1e-4, 2e-2, 100),
                          jnp.linspace(1.1, 10.0, 30)]).astype(jnp.float32)
    fp = jnp.asarray(np.random.default_rng(0).standard_normal(xp.shape[0]),
                     jnp.float32)
    xq = jax.random.uniform(jax.random.PRNGKey(14), (777,), jnp.float32,
                            0.9, 1.2)
    got = interp_pallas.interp1d(xq, xp, fp)
    want = interp.interp1d(xq, xp, fp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_bilinear_binned_matches_reference():
    """2D-binned path (sort + per-bin 128x128 windows) vs the XLA oracle,
    including out-of-range queries and a grid that isn't a bin multiple."""
    B, H, W, Q = 2, 300, 260, 9000
    grids = jax.random.normal(jax.random.PRNGKey(31), (B, H, W), jnp.float32)
    pts = jax.random.uniform(jax.random.PRNGKey(32), (B, Q, 2), jnp.float32,
                             -3.0, float(H) + 3.0)
    got = interp_pallas.bilinear_batched(pts, grids, method="binned")
    want = interp.bilinear_batched(pts, grids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_bilinear_binned_adversarial_clustering():
    """All queries in ONE bin: the dynamic group loop (no static per-bin
    capacity) must stay exact — the failure mode of capacity-based binning."""
    B, H, W, Q = 1, 256, 256, 4096
    grids = jax.random.normal(jax.random.PRNGKey(33), (B, H, W), jnp.float32)
    pts = jax.random.uniform(jax.random.PRNGKey(34), (B, Q, 2), jnp.float32,
                             40.0, 41.0)
    got = interp_pallas.bilinear_batched(pts, grids, method="binned")
    want = interp.bilinear_batched(pts, grids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_bilinear_auto_dispatch_large_grid():
    """auto picks the binned path for grids past the full kernel's VMEM
    comfort zone; results match the oracle."""
    B, H, W, Q = 1, 700, 650, 5000
    grids = jax.random.normal(jax.random.PRNGKey(35), (B, H, W), jnp.float32)
    pts = jax.random.uniform(jax.random.PRNGKey(36), (B, Q, 2), jnp.float32,
                             0.0, float(H) - 1.0)
    got = interp_pallas.bilinear_batched(pts, grids)   # method='auto'
    want = interp.bilinear_batched(pts, grids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_bilinear_binned_single_bin_grid():
    """Grids smaller than one window (1x1 bins) still work via binned."""
    B, H, W, Q = 1, 64, 96, 2000
    grids = jax.random.normal(jax.random.PRNGKey(37), (B, H, W), jnp.float32)
    pts = jax.random.uniform(jax.random.PRNGKey(38), (B, Q, 2), jnp.float32,
                             -2.0, float(H) + 2.0)
    got = interp_pallas.bilinear_batched(pts, grids, method="binned")
    want = interp.bilinear_batched(pts, grids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_bilinear_f64_matches_host_double():
    B, H, W = 2, 64, 96
    grids = jax.random.normal(jax.random.PRNGKey(21), (B, H, W), jnp.float64)
    pts = jax.random.uniform(jax.random.PRNGKey(22), (B, 701, 2),
                             jnp.float64, -1.0, float(H) + 1.0)
    got = np.asarray(interp_pallas.bilinear_batched_f64(pts, grids))
    g = np.asarray(grids)
    p = np.asarray(pts)
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
    np.testing.assert_allclose(got, ref, atol=1e-13)


def test_bilinear_f64_rejects_oversized_grid():
    with pytest.raises(ValueError, match="grid too large"):
        interp_pallas.bilinear_batched_f64(
            jnp.zeros((1, 4, 2), jnp.float64),
            jnp.zeros((1, 512, 256), jnp.float64))


def test_lerp1d_binned_matches_reference():
    """Sort-for-locality large-table path: exact vs the XLA reference,
    including out-of-range queries, odd sizes, and a skewed distribution
    (skew widens per-group spans but must not change results)."""
    n = 16384
    fp = jnp.cos(jnp.linspace(0, 20, n, dtype=jnp.float32))
    dx = 20.0 / (n - 1)
    key = jax.random.PRNGKey(13)
    uni = jax.random.uniform(key, (70000,), jnp.float32, -1.0, 21.0)
    skew = jnp.concatenate([uni, jnp.full((3000,), 5.5, jnp.float32)])
    for xq, nb in ((uni, 16), (skew, 8), (uni[:2048], 2)):
        got = interp_pallas.lerp1d_binned(xq, fp, 0.0, dx, n_batches=nb)
        want = interp.lerp_uniform(xq, fp, 0.0, dx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        assert got.shape == xq.shape


def test_lerp1d_binned_exact_fit_no_pad():
    """Q dividing n_batches*group exactly takes the no-pad fast path (the
    bench/restrict shapes); results identical to the padded route."""
    n = 16384
    fp = jnp.cos(jnp.linspace(0, 20, n, dtype=jnp.float32))
    dx = 20.0 / (n - 1)
    xq = jax.random.uniform(jax.random.PRNGKey(17), (16 * 128 * 4,),
                            jnp.float32, -1.0, 21.0)
    got = interp_pallas.lerp1d_binned(xq, fp, 0.0, dx, n_batches=16)
    want = interp.lerp_uniform(xq, fp, 0.0, dx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_lerp1d_routing_large_table_pow2_batches():
    """lerp1d routes 64k-node tables to the binned path with a power-of-two
    batch count (non-pow2 rows are 4x slower through XLA's bitonic sort);
    exactness through the public entry at a routed shape."""
    n = 65536
    fp = jnp.sin(jnp.linspace(-3, 3, n, dtype=jnp.float32))
    dx = 6.0 / (n - 1)
    xq = jax.random.uniform(jax.random.PRNGKey(19), (200_000,), jnp.float32,
                            -3.2, 3.2)
    got = interp_pallas.lerp1d(xq, fp, -3.0, dx)
    want = interp.lerp_uniform(xq, fp, -3.0, dx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_lerp1d_routing_preserves_query_dtype():
    """The binned route must honor the caller dtype like the plain path
    (it used to return f32 unconditionally, so x64 pipelines silently
    changed dtype at the routing threshold)."""
    n = 16384
    fp = jnp.sin(jnp.linspace(-3, 3, n, dtype=jnp.float64))
    dx = 6.0 / (n - 1)
    xq = jax.random.uniform(jax.random.PRNGKey(21), (131072,), jnp.float64,
                            -3.0, 3.0)
    got = interp_pallas.lerp1d(xq, fp, -3.0, dx)
    assert got.dtype == jnp.float64
    want = interp.lerp_uniform(xq, fp, -3.0, dx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_interp1d_nonuniform_sorted_path():
    """Queries above the sorted-path threshold (262144) route through the
    batched-sort + dynamic-span kernel; must stay exact vs the XLA
    reference, including out-of-range queries and the padded tail."""
    key = jax.random.PRNGKey(14)
    n = 2048
    gaps = 0.05 + jax.random.uniform(key, (n - 1,), jnp.float32)
    xp = jnp.concatenate([jnp.zeros(1), jnp.cumsum(gaps)])
    fp = jnp.sin(0.07 * xp)
    f = interp_pallas.make_interp1d(xp, fp)
    xq = jax.random.uniform(jax.random.PRNGKey(15), (262150,), jnp.float32,
                            -1.0, float(xp[-1]) + 1.0)
    got = f(xq)
    want = interp.interp1d(xq, xp, fp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    assert got.shape == xq.shape


def test_auto_bilinear_routing_avoids_full_compile_envelope():
    """method='auto' must never route grids past the full kernel's
    measured compile envelope (fails at 384^2+, v5e 2026-08-20 —
    artifacts/bilinear_crossover.jsonl) to the full kernel."""
    from armadillocudalinearinterpolation_tpu.ops.interp_pallas import (
        _auto_bilinear_method)

    assert _auto_bilinear_method(256, 256) == "full"
    assert _auto_bilinear_method(128, 512) == "full"      # 4 tiles
    assert _auto_bilinear_method(384, 384) == "binned"
    assert _auto_bilinear_method(512, 512) == "binned"
    assert _auto_bilinear_method(256, 384) == "binned"    # 6 tiles
    assert _auto_bilinear_method(1024, 1024) == "binned"
