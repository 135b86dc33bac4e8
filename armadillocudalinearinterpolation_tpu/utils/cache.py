"""Persistent XLA compilation cache.

First-touch Mosaic compiles of the Pallas evolve kernel cost minutes per
shape (ROADMAP.md); the persistent cache makes that a one-time cost per
machine instead of per process.  Wired into ``bench.py``, the CLI driver and
the test conftest — call :func:`enable_compilation_cache` before the first
compilation (it is harmless afterwards; already-compiled programs simply miss
the cache).
"""

from __future__ import annotations

import os
import pathlib

import jax

_DEFAULT_DIR = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_compilation_cache(path: str | os.PathLike | None = None) -> str:
    """Point JAX at a persistent on-disk compilation cache.

    Args:
      path: cache directory; defaults to ``<repo>/.jax_cache`` (gitignored)
        or the ``EDMAP_JAX_CACHE`` environment variable.

    Returns the directory used.
    """
    cache_dir = str(path or os.environ.get("EDMAP_JAX_CACHE", _DEFAULT_DIR))
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that took real compile time; tiny programs recompile
    # faster than they deserialise.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
