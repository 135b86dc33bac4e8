"""Pin 32-bit trace semantics around Pallas kernel invocations.

Under ``jax_enable_x64`` a handful of Python-literal promotions inside
kernel bodies become int64/f64 ops, which Mosaic cannot lower (its
64->32-bit convert helper recurses).  Every Pallas kernel in this package is
f32/int32 by construction, so tracing with x64 off is exact.  This is the
single home for the (private-API) ``jax._src.config.enable_x64`` dependency;
if a JAX upgrade moves it, fix it here.
"""

from __future__ import annotations

from typing import Callable, TypeVar

from jax._src.config import enable_x64 as _enable_x64

T = TypeVar("T")


def x64_safe_call(call: Callable[[], T]) -> T:
    """Invoke ``call`` (typically a ``pallas_call`` application) with 32-bit
    trace semantics pinned."""
    with _enable_x64(False):
        return call()
