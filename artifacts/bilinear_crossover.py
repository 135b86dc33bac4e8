"""2D bilinear full-vs-binned crossover at mid-size grids (VERDICT r3 #8).

The binned path's two bitonic sorts already run unstable (is_stable=False,
~6.4x cheaper than stable); this re-measures the full-kernel-vs-binned
crossover at 256/384/512-squared grids so the `auto` threshold in
``ops.interp_pallas.bilinear_batched`` reflects post-unstable-sort costs.

    python artifacts/bilinear_crossover.py

Appends JSON lines to artifacts/bilinear_crossover.jsonl.
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

from armadillocudalinearinterpolation_tpu.ops import interp_pallas
from armadillocudalinearinterpolation_tpu.utils.cache import (
    enable_compilation_cache)
from armadillocudalinearinterpolation_tpu.utils.profiling import chained_slope


def bench_method(B, H, W, Q, method) -> float:
    grids = jax.random.normal(jax.random.PRNGKey(0), (B, H, W), jnp.float32)
    pts0 = jax.random.uniform(jax.random.PRNGKey(1), (B, Q, 2), jnp.float32,
                              0.0, float(H) - 1.0)

    def make(K):
        @jax.jit
        def run():
            def body(_, pp):
                o = interp_pallas.bilinear_batched(pp, grids, method=method)
                rr = (o * 977.0) % (H - 1.0)
                return jnp.stack([rr, (rr * 1.7) % (W - 1.0)], axis=-1)
            return jnp.sum(jax.lax.fori_loop(0, K, body, pts0))
        return run

    return chained_slope(make, k_lo=1, k_hi=9, reps=5, stat=np.min)


def main():
    enable_compilation_cache()
    out = []
    total_q = 1_048_576
    for H in (256, 384, 512, 768):
        B = max(4, 64 * 256 * 256 // (H * H))   # keep grid bytes comparable
        Q = total_q // B
        rec = {"B": B, "H": H, "Q": Q}
        for method in ("full", "binned"):
            try:
                s = bench_method(B, H, H, Q, method)
                rec[f"{method}_ms"] = round(s * 1e3, 3)
                rec[f"{method}_qps_M"] = round(B * Q / s / 1e6, 1)
            except Exception as e:
                rec[f"{method}_error"] = str(e)[:160]
        rec["stamp"] = time.strftime("%Y-%m-%d %H:%M:%S")
        print(json.dumps(rec), flush=True)
        out.append(rec)
    with open("artifacts/bilinear_crossover.jsonl", "a") as f:
        for r in out:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
