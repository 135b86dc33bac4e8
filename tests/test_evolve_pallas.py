"""Pallas evolve kernel vs the XLA evolve path.

The kernel is TPU-only (Mosaic while loops + in-vreg reductions); on the CPU
test mesh we check the wiring (backend selection, input validation) and run
the numerical comparison only when a real TPU is present (e.g. invoked
without the conftest platform override).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from armadillocudalinearinterpolation_tpu import (
    ModelConfig, MapParams, event_driven_map)
from armadillocudalinearinterpolation_tpu.model.evolve_pallas import (
    evolve_ensemble_pallas)

on_tpu = jax.default_backend() == "tpu"


def test_auto_backend_selects_xla_on_cpu(cfg, params, key, z_ref):
    """'auto' must not attempt the Mosaic kernel on the CPU mesh."""
    f = event_driven_map(
        ModelConfig(n_neurons=512, n_real=2, dtype="float32"),
        MapParams.create(13.0589, 0.0, dtype="float32"),
        key, z_ref.astype(jnp.float32), evolve_backend="auto")
    assert np.isfinite(np.asarray(f)).all()


def test_invalid_backend_rejected(cfg, params, key, z_ref):
    with pytest.raises(ValueError, match="evolve_backend"):
        event_driven_map(cfg, params, key, z_ref, evolve_backend="cuda")


def test_pallas_requires_lane_aligned_neurons():
    cfg = ModelConfig(n_neurons=500, n_real=2, dtype="float32")
    with pytest.raises(ValueError, match="multiple of 128"):
        evolve_ensemble_pallas(
            cfg, jnp.zeros(500), jnp.zeros(500),
            jnp.zeros((2, 500)), jnp.zeros(3, jnp.int32))


@pytest.mark.skipif(not on_tpu, reason="Mosaic kernel needs a TPU")
def test_pallas_matches_xla_on_tpu(z_ref):
    cfg = ModelConfig(n_neurons=512, n_real=16, dtype="float32")
    params = MapParams.create(13.0589, 0.1, dtype="float32")
    key = jax.random.PRNGKey(0)
    z = z_ref.astype(jnp.float32)
    fp = event_driven_map(cfg, params, key, z, evolve_backend="pallas")
    fx = event_driven_map(cfg, params, key, z, evolve_backend="xla")
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fx), atol=1e-5)


def test_evolve_window_validation():
    with pytest.raises(ValueError, match="evolve_window"):
        ModelConfig(n_neurons=512, n_real=2, evolve_window=100)
    with pytest.raises(ValueError, match="evolve_window"):
        ModelConfig(n_neurons=512, n_real=2, evolve_window=512)
    ModelConfig(n_neurons=512, n_real=2, evolve_window=256)  # ok


@pytest.fixture
def interpreted(monkeypatch):
    """Run the kernel through the Pallas interpreter (plain XLA, CPU-safe)
    with a small realisation block, clearing the jit cache around it."""
    import armadillocudalinearinterpolation_tpu.model.evolve_pallas as ep

    monkeypatch.setattr(ep, "_INTERPRET", True)
    monkeypatch.setattr(ep, "_BLOCK_ELEMENT_BUDGET", 8 * 512)
    ep.evolve_ensemble_pallas.clear_cache()
    yield ep
    ep.evolve_ensemble_pallas.clear_cache()


def test_pallas_interpret_matches_xla_on_cpu(interpreted, z_ref):
    """The kernel's full logic — event loop, packed bookkeeping, windowing
    with persistent roll + re-anchor, certificate fallback — exercised
    off-TPU via the Pallas interpreter and checked against the XLA evolve
    path (closes the round-1 gap of the kernel only ever being validated
    on a live TPU)."""
    params = MapParams.create(13.0589, 0.1, dtype="float32")
    key = jax.random.PRNGKey(0)
    z = z_ref.astype(jnp.float32)
    cfg_f = ModelConfig(n_neurons=256, n_real=4, dtype="float32")
    cfg_w = ModelConfig(n_neurons=256, n_real=4, dtype="float32",
                        evolve_window=128)
    fx = event_driven_map(cfg_f, params, key, z, evolve_backend="xla")
    ff = event_driven_map(cfg_f, params, key, z, evolve_backend="pallas")
    fw = event_driven_map(cfg_w, params, key, z, evolve_backend="pallas")
    np.testing.assert_allclose(np.asarray(ff), np.asarray(fx), atol=2e-5)
    # the certified window must reproduce the full kernel exactly
    np.testing.assert_array_equal(np.asarray(ff), np.asarray(fw))


@pytest.mark.skipif(not on_tpu, reason="Mosaic kernel needs a TPU")
def test_windowed_matches_full_kernel_on_tpu(z_ref):
    """The certified window must reproduce the full kernel exactly
    (same event sequence, same bookkeeping) — measured 0.0 delta."""
    params = MapParams.create(13.0589, 0.1, dtype="float32")
    key = jax.random.PRNGKey(0)
    z = z_ref.astype(jnp.float32)
    cfg_f = ModelConfig(n_neurons=512, n_real=32, dtype="float32")
    cfg_w = ModelConfig(n_neurons=512, n_real=32, dtype="float32",
                        evolve_window=128)
    ff = event_driven_map(cfg_f, params, key, z, evolve_backend="pallas")
    fw = event_driven_map(cfg_w, params, key, z, evolve_backend="pallas")
    np.testing.assert_array_equal(np.asarray(ff), np.asarray(fw))


def test_per_row_window_matches_full_interpret(interpreted, z_ref):
    """Per-row chunk-granular anchors (cfg.evolve_window_per_row): the
    certificate must keep results identical to the full kernel at both
    small and LARGE sigma (de-synchronised realisations — the regime the
    per-row anchors exist for)."""
    key = jax.random.PRNGKey(0)
    z = z_ref.astype(jnp.float32)
    for sigma in (0.1, 1.2):
        params = MapParams.create(13.0589, sigma, dtype="float32")
        cfg_f = ModelConfig(n_neurons=512, n_real=4, dtype="float32")
        cfg_p = ModelConfig(n_neurons=512, n_real=4, dtype="float32",
                            evolve_window=384, evolve_window_per_row=True)
        ff = event_driven_map(cfg_f, params, key, z, evolve_backend="pallas")
        fp_ = event_driven_map(cfg_p, params, key, z,
                               evolve_backend="pallas")
        np.testing.assert_array_equal(np.asarray(ff), np.asarray(fp_))


def test_per_row_window_config_validation():
    with pytest.raises(ValueError, match="per_row"):
        ModelConfig(n_neurons=512, n_real=2, evolve_window=128,
                    evolve_window_per_row=True)


def test_warm_start_interpret_matches_cold(interpreted, z_ref):
    """Warm-started event-time Newton (cfg.evolve_warm_start): the guarded
    seed may change the converged root only within root_tol, so the map
    value agrees with the cold kernel to f32 root-tol scale — and the
    windowed warm kernel likewise: out-of-window lanes carry stale seeds
    (decremented by dt) where the full kernel reseeds every lane, so
    windowed-vs-full under warm start is a root_tol-scale agreement, NOT
    the cold mode's bitwise guarantee (config.py documents this)."""
    params = MapParams.create(13.0589, 0.1, dtype="float32")
    key = jax.random.PRNGKey(0)
    z = z_ref.astype(jnp.float32)
    cfg_c = ModelConfig(n_neurons=256, n_real=4, dtype="float32")
    cfg_w = cfg_c.with_(evolve_warm_start=True)
    cfg_ww = cfg_w.with_(evolve_window=128)
    f_cold = event_driven_map(cfg_c, params, key, z, evolve_backend="pallas")
    f_warm = event_driven_map(cfg_w, params, key, z, evolve_backend="pallas")
    f_warm_win = event_driven_map(cfg_ww, params, key, z,
                                  evolve_backend="pallas")
    np.testing.assert_allclose(np.asarray(f_warm), np.asarray(f_cold),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(f_warm),
                               np.asarray(f_warm_win), atol=5e-5)


def test_warm_start_vmem_budget_guard():
    """ADVICE r4: for n_neurons in (12288, 16384] the 8-row floor would
    silently exceed the 3/4 warm VMEM budget (the measured 16M scoped-VMEM
    overflow the shrink exists to prevent) — it must raise instead."""
    from armadillocudalinearinterpolation_tpu.model.evolve_pallas import (
        _BLOCK_ELEMENT_BUDGET, _r_block)

    warm_budget = _BLOCK_ELEMENT_BUDGET * 3 // 4
    # largest warm-legal N: exactly 8 rows fit the reduced budget
    assert _r_block(warm_budget // 8, warm=True) == 8
    with pytest.raises(ValueError, match="warm"):
        _r_block(warm_budget // 8 + 128, warm=True)
    with pytest.raises(ValueError, match="warm"):
        _r_block(16384, warm=True)
    # the cold path reaches its floor exactly at N=16384 without overflow
    assert _r_block(16384, warm=False) == 8
