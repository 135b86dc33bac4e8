"""Pin 32-bit trace semantics around Pallas kernel invocations.

Under ``jax_enable_x64`` a handful of Python-literal promotions inside
kernel bodies become int64/f64 ops, which Mosaic cannot lower (its
64->32-bit convert helper recurses).  Every Pallas kernel in this package is
f32/int32 by construction, so tracing with x64 off is exact.  This is the
single home for the x64-scoping dependency: the public ``jax.enable_x64``
context manager (JAX >= 0.4.x), with the old private location as a fallback
for versions that predate the public export.
"""

from __future__ import annotations

from typing import Callable, TypeVar

import jax

if hasattr(jax, "enable_x64"):          # public API (present in jax 0.9.0)
    _enable_x64 = jax.enable_x64
else:                                    # pragma: no cover - legacy fallback
    from jax._src.config import enable_x64 as _enable_x64

T = TypeVar("T")


def x64_safe_call(call: Callable[[], T]) -> T:
    """Invoke ``call`` (typically a ``pallas_call`` application) with 32-bit
    trace semantics pinned."""
    with _enable_x64(False):
        return call()
