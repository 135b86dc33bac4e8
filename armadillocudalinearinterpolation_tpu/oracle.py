"""ctypes bindings to the native fp64 oracle (``native/edmap_oracle.cpp``).

The oracle is an independent C++ implementation of the map (and of the
Newton solve) used to validate the JAX fp64/fp32 paths — the role the
Armadillo CPU stack plays for the reference.  The shared library is built on
demand with ``make`` and cached next to the source.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional

import numpy as np

from .config import ModelConfig, MapParams

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB: Optional[ctypes.CDLL] = None


class _CParams(ctypes.Structure):
    _fields_ = [
        ("n_neurons", ctypes.c_int),
        ("n_real", ctypes.c_int),
        ("n_spikes", ctypes.c_int),
        ("n_threads", ctypes.c_int),
        ("vth", ctypes.c_double),
        ("vr", ctypes.c_double),
        ("a1", ctypes.c_double),
        ("a2", ctypes.c_double),
        ("b1", ctypes.c_double),
        ("b2", ctypes.c_double),
        ("drive", ctypes.c_double),
        ("half_width", ctypes.c_double),
        ("t_horizon", ctypes.c_double),
        ("root_tol", ctypes.c_double),
        ("counter_max", ctypes.c_int),
        ("beta_mean", ctypes.c_double),
        ("beta_sigma", ctypes.c_double),
        ("seed", ctypes.c_uint64),
    ]


def _build() -> pathlib.Path:
    lib = _NATIVE_DIR / "libedmap_oracle.so"
    src = _NATIVE_DIR / "edmap_oracle.cpp"
    if not lib.exists() or lib.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    return lib


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        _LIB = ctypes.CDLL(str(_build()))
        _LIB.edmap_compute_f.restype = None
        _LIB.edmap_compute_f.argtypes = [
            ctypes.POINTER(_CParams),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        _LIB.edmap_newton_solve.restype = ctypes.c_int
        _LIB.edmap_newton_solve.argtypes = [
            ctypes.POINTER(_CParams),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_double, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.POINTER(ctypes.c_int),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
    return _LIB


def _params(cfg: ModelConfig, params: MapParams, seed: int,
            n_threads: int = 0) -> _CParams:
    return _CParams(
        n_neurons=cfg.n_neurons, n_real=cfg.n_real, n_spikes=cfg.n_spikes,
        n_threads=n_threads, vth=cfg.vth, vr=cfg.vr, a1=cfg.a1, a2=cfg.a2,
        b1=cfg.b1, b2=cfg.b2, drive=cfg.drive, half_width=cfg.half_width,
        t_horizon=cfg.t_horizon, root_tol=cfg.root_tol,
        counter_max=cfg.counter_max, beta_mean=float(params.beta),
        beta_sigma=float(params.sigma), seed=seed)


def compute_f(cfg: ModelConfig, params: MapParams, Z, *, seed: int = 0,
              n_threads: int = 0) -> np.ndarray:
    """Native fp64 residual ``F(Z)``."""
    lib = _load()
    p = _params(cfg, params, seed, n_threads)
    Z = np.ascontiguousarray(Z, np.float64)
    f = np.empty(cfg.n_spikes, np.float64)
    lib.edmap_compute_f(ctypes.byref(p), Z, f, None, None)
    return f


def newton_solve(cfg: ModelConfig, params: MapParams, z0, *, tol: float = 1e-10,
                 max_iterations: int = 15, fd_eps: float = 1e-7,
                 damping: float = 1.0, seed: int = 0, n_threads: int = 0):
    """Native fp64 damped Newton solve; returns a dict mirroring NewtonResult."""
    lib = _load()
    p = _params(cfg, params, seed, n_threads)
    n = cfg.n_spikes
    z0 = np.ascontiguousarray(z0, np.float64)
    z_out = np.empty(n, np.float64)
    hist = np.empty(max_iterations + 1, np.float64)
    jac = np.empty((n, n), np.float64)
    conv = ctypes.c_int(0)
    iters = lib.edmap_newton_solve(
        ctypes.byref(p), z0, tol, max_iterations, fd_eps, damping,
        z_out, hist, ctypes.byref(conv), jac)
    return {
        "solution": z_out,
        "iterations": int(iters),
        "converged": bool(conv.value),
        "residual_history": hist,
        "jacobian": jac,
    }
