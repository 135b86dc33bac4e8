"""On-chip A/B for warm-started event-time Newton (VERDICT r3 #6).

Times the f32 windowed-Pallas map evaluation at the reference workload
shape (N=1024, R=1024 — bench config 3) with cfg.evolve_warm_start off/on
across margins, plus the windowed-vs-full and warm-vs-cold residual
deltas.  Decision rule (ROADMAP): keep the feature default-off unless the
win clears ~10%; either way the numbers land here and in ROADMAP.

    python artifacts/warm_start_ab.py

Appends JSON lines to artifacts/warm_start_ab.jsonl.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from armadillocudalinearinterpolation_tpu import (
    ModelConfig, MapParams, make_residual_fn)
from armadillocudalinearinterpolation_tpu.utils.cache import (
    enable_compilation_cache)
from armadillocudalinearinterpolation_tpu.utils.profiling import device_time


def time_map(cfg, params, key, Z0) -> float:
    F = make_residual_fn(cfg, params, key)

    @jax.jit
    def run_k(k):
        def body(_, z):
            return z + 0.0 * F(z)
        return jnp.sum(jax.lax.fori_loop(0, k, body, Z0))

    def make(K):
        return lambda: run_k(jnp.int32(K))

    from armadillocudalinearinterpolation_tpu.utils.profiling import (
        chained_slope)
    return chained_slope(make, k_lo=1, k_hi=3, reps=3, stat=np.min)


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    Z0 = jnp.array([0.3310, 0.6914, 1.3557], jnp.float32)
    params = MapParams.create(13.0589, 0.1, dtype="float32")
    base = dict(n_neurons=1024, n_real=1024, dtype="float32",
                evolve_window=128)

    recs = []
    variants = [("cold", {}),
                ("warm_m0.02", {"evolve_warm_start": True,
                                "evolve_warm_margin": 0.02}),
                ("warm_m0.05", {"evolve_warm_start": True,
                                "evolve_warm_margin": 0.05}),
                ("warm_m0.15", {"evolve_warm_start": True,
                                "evolve_warm_margin": 0.15})]
    vals = {}
    for tag, kw in variants:
        cfg = ModelConfig(**{**base, **kw})
        F = make_residual_fn(cfg, params, key)
        vals[tag] = np.asarray(F(Z0))
        s = time_map(cfg, params, key, Z0)
        rec = {"tag": tag, "map_eval_ms": round(s * 1e3, 2)}
        if tag != "cold":
            rec["delta_vs_cold"] = float(
                np.max(np.abs(vals[tag] - vals["cold"])))
            # windowed-vs-full within the warm setting
            cfg_full = ModelConfig(**{k: v for k, v in {**base, **kw}.items()
                                      if k != "evolve_window"})
            f_full = np.asarray(make_residual_fn(cfg_full, params, key)(Z0))
            rec["windowed_vs_full_delta"] = float(
                np.max(np.abs(vals[tag] - f_full)))
        rec["stamp"] = time.strftime("%Y-%m-%d %H:%M:%S")
        print(json.dumps(rec), flush=True)
        recs.append(rec)
    with open("artifacts/warm_start_ab.jsonl", "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
