"""Pallas TPU kernels for batched linear interpolation.

These are the performance paths behind :mod:`.interp` (the pure-XLA reference
implementations, which remain the correctness oracle).  Measured on one
v5e chip against the XLA gather lowering (chained-iteration timing, see
``bench.py``):

  * ``lerp1d``:   ~14 Gq/s  vs 0.07 Gq/s XLA   (~200x)
  * ``bilinear_batched``: ~0.34 Gq/s vs 0.016 Gq/s XLA (~20-38x run to run,
    bf16x2 mode — at the MXU-FLOP-bound ceiling of the algorithm:
    4 H*W MACs/query)

Design notes (the TPU-native reasoning, not a CUDA translation):

**1D lerp** — the VPU's ``dynamic_gather`` permutes lanes within a single
(8, 128) vreg, with indices of the same shape as the operand.  A lookup
table of up to ``MAX_TABLE`` nodes is therefore held as ``n/128`` lane
chunks; each (rows, 128) block of queries does one in-vreg gather per chunk
and a mask-select on the chunk id.  A *pre-shifted copy* of the table makes
the right-node value ``f[i0+1]`` reuse the same chunk/offset as ``f[i0]``
(no second index computation, no chunk-boundary special case).

**2D bilinear** — there is no 2D in-vreg gather, and a flat 256x256 table
would need 512 chunk-selects.  Instead both grid dimensions become *tent
weights*: ``relu(1 - |iota - coord|)`` is exactly the one-hot pair
``(1-t, t)`` at the bracketing indices — built arithmetically, no masks or
gathers.  The row weights ride the MXU (weight matrix times grid extracts
every query's row-blended vector); the column weights finish with one
multiply+lane-reduce.  To keep f32-level accuracy with bf16 MXU inputs both
the grid and the weights are split into high/low bf16 parts (three matmuls);
``precision='bf16'`` drops the low parts (one matmul, ~2.4x faster, ~1e-2
absolute error).  The high part is built by mantissa masking because
``--xla_allow_excess_precision`` folds ``x - bf16(x)`` to zero.

The reference's restriction lerp (``/root/reference/EventDrivenMap.cu:769-785``)
is tiny; these kernels serve the standalone batched-interpolation capability
(BASELINE.md configs 1-2).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interp as _ref

MAX_TABLE = 4096          # lane chunks per lookup <= 32
_LANE = 128
_ROWS = 256               # query rows per 1D grid step (32K queries/step)


def _pad_to(x: jax.Array, n: int, axis: int = 0) -> jax.Array:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad)


# --------------------------------------------------------------------- 1D

def _lerp1d_kernel(n: int, n_chunks: int, rows: int,
                   tab_ref, tab1_ref, q_ref, lim_ref, out_ref):
    """One grid step: (rows, 128) queries against the chunked table."""
    q = q_ref[:]
    x0 = lim_ref[0]
    inv_dx = lim_ref[1]
    u = (q - x0) * inv_dx
    i0 = jnp.clip(u.astype(jnp.int32), 0, n - 2)
    t = jnp.clip(u - i0.astype(q.dtype), 0.0, 1.0)
    chunk = jax.lax.shift_right_logical(i0, jnp.int32(7))
    off = jax.lax.bitwise_and(i0, jnp.int32(_LANE - 1))
    f0 = jnp.zeros_like(q)
    f1 = jnp.zeros_like(q)
    for c in range(n_chunks):
        m = chunk == c
        g0 = jnp.take_along_axis(
            jnp.broadcast_to(tab_ref[c:c + 1, :], (rows, _LANE)), off, axis=1)
        g1 = jnp.take_along_axis(
            jnp.broadcast_to(tab1_ref[c:c + 1, :], (rows, _LANE)), off, axis=1)
        f0 = jnp.where(m, g0, f0)
        f1 = jnp.where(m, g1, f1)
    out_ref[:] = f0 + t * (f1 - f0)


@functools.partial(jax.jit, static_argnames=("rows",))
def lerp1d(xq: jax.Array, fp: jax.Array, x0: float, dx: float,
           *, rows: int = _ROWS) -> jax.Array:
    """Uniform-grid 1D lerp (clamped), Pallas fast path.

    Semantics match :func:`..ops.interp.lerp_uniform` /(``numpy.interp`` on a
    uniform grid).  ``fp`` must have at most ``MAX_TABLE`` nodes; queries of
    any shape (flattened internally, padded to a whole number of blocks).
    """
    if fp.shape[0] > MAX_TABLE:
        raise ValueError(f"table too large for VMEM kernel: {fp.shape[0]}")
    shape = xq.shape
    q = xq.reshape(-1).astype(jnp.float32)
    n = fp.shape[0]
    n_pad = max(_LANE, ((n + _LANE - 1) // _LANE) * _LANE)
    n_chunks = n_pad // _LANE
    block = rows * _LANE
    Q = q.shape[0]
    nsteps = max(1, (Q + block - 1) // block)
    qp = _pad_to(q, nsteps * block).reshape(nsteps * rows, _LANE)

    fp32 = fp.astype(jnp.float32)
    tab = _pad_to(fp32, n_pad).reshape(n_chunks, _LANE)
    tab1 = _pad_to(fp32[1:], n_pad).reshape(n_chunks, _LANE)
    lims = jnp.array([x0, 1.0 / dx], jnp.float32)

    out = pl.pallas_call(
        functools.partial(_lerp1d_kernel, n, n_chunks, rows),
        out_shape=jax.ShapeDtypeStruct((nsteps * rows, _LANE), jnp.float32),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((n_chunks, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chunks, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, _LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(tab, tab1, qp, lims)
    return out.reshape(-1)[:Q].reshape(shape).astype(xq.dtype)


# --------------------------------------------------------------------- 2D

_SUB = 8  # query sub-tiles per grid step (each 128 queries along sublanes)


def _bilinear_kernel2(h: int, w: int, hp: int, wp: int, x2: bool,
                      gh_ref, gl_ref, rT_ref, cT_ref, out_ref):
    gh = gh_ref[0]
    gl = gl_ref[0]
    rT = rT_ref[0, 0]          # (128, _SUB) row coords, query-on-sublane
    cT = cT_ref[0, 0]
    iota_rf = jax.lax.broadcasted_iota(jnp.int32, (_LANE, hp), 1).astype(
        jnp.float32)
    iota_cf = jax.lax.broadcasted_iota(jnp.int32, (_LANE, wp), 1).astype(
        jnp.float32)
    cols = []
    for j in range(_SUB):
        r = jnp.clip(rT[:, j:j + 1], 0.0, h - 1.0)
        c = jnp.clip(cT[:, j:j + 1], 0.0, w - 1.0)
        # The bilinear weight IS the tent function: relu(1 - |i - coord|)
        # has exactly the one-hot pair (1-t, t) at floor/ceil of the
        # coordinate and zeros elsewhere — no masks, no gathers.
        wr = jnp.maximum(0.0, 1.0 - jnp.abs(iota_rf - r))    # (128, h)
        wc = jnp.maximum(0.0, 1.0 - jnp.abs(iota_cf - c))    # (128, w)
        wh = wr.astype(jnp.bfloat16)
        rows = jnp.dot(wh, gh, preferred_element_type=jnp.float32)
        if x2:
            wl = (wr - wh.astype(jnp.float32)).astype(jnp.bfloat16)
            rows = (rows
                    + jnp.dot(wl, gh, preferred_element_type=jnp.float32)
                    + jnp.dot(wh, gl, preferred_element_type=jnp.float32))
        # column stage: the tent weights select+blend in one mul-reduce
        cols.append(jnp.sum(rows * wc, axis=1, keepdims=True))
    out_ref[0, 0] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("precision",))
def bilinear_batched(pts: jax.Array, grids: jax.Array,
                     precision: Literal["bf16x2", "bf16"] = "bf16x2"
                     ) -> jax.Array:
    """Batched 2D bilinear lookup, Pallas MXU fast path.

    Args/semantics match :func:`..ops.interp.bilinear_batched`:
    ``pts (B, Q, 2)`` index-space queries (clamped), ``grids (B, H, W)`` of
    any shape (zero-padded to hardware tiling internally — exact, see the
    kernel comment).
    """
    B, Q, _ = pts.shape
    _, H, W = grids.shape
    # Zero-pad the grid to hardware tiling.  This is exact: query coords are
    # clipped to the ORIGINAL [0, H-1] x [0, W-1] inside the kernel, so tent
    # weights on padded rows/cols are identically zero (the weight at index
    # H is 1 - |H - (H-1)| = 0 even for boundary queries).
    Hp = ((H + 7) // 8) * 8
    Wp = ((W + _LANE - 1) // _LANE) * _LANE
    block = _SUB * _LANE
    S = max(1, (Q + block - 1) // block)
    # query-on-sublane layout: (B, S, 128, _SUB)
    p = _pad_to(pts.astype(jnp.float32), S * block, axis=1)
    p = p.reshape(B, S, _SUB, _LANE, 2)
    rT = jnp.swapaxes(p[..., 0], 2, 3)
    cT = jnp.swapaxes(p[..., 1], 2, 3)

    g32 = jnp.pad(grids.astype(jnp.float32),
                  ((0, 0), (0, Hp - H), (0, Wp - W)))
    # High/low bf16 split via mantissa masking.  A plain
    # ``g - bf16(g).astype(f32)`` is folded to zero by XLA under
    # ``--xla_allow_excess_precision`` (bf16 round-trips are treated as
    # identity), which silently degrades the kernel to bf16 accuracy; the
    # bit-level mask below cannot be folded.
    hi = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(g32, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32)
    gh = hi.astype(jnp.bfloat16)            # exact: low mantissa bits are zero
    x2 = precision == "bf16x2"
    # In 'bf16' mode the kernel never reads the low part: ship a tiny dummy
    # block instead of computing and streaming a second full grid.
    gl = ((g32 - hi).astype(jnp.bfloat16) if x2
          else jnp.zeros((B, 8, _LANE), jnp.bfloat16))
    gl_block = (1, Hp, Wp) if x2 else (1, 8, _LANE)

    out = pl.pallas_call(
        functools.partial(_bilinear_kernel2, H, W, Hp, Wp, x2),
        out_shape=jax.ShapeDtypeStruct((B, S, _LANE, _SUB), jnp.float32),
        grid=(B, S),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(gl_block, lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANE, _SUB), lambda b, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANE, _SUB), lambda b, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, _LANE, _SUB), lambda b, s: (b, s, 0, 0),
                               memory_space=pltpu.VMEM),
    )(gh, gl, rT, cT)
    out = jnp.swapaxes(out, 2, 3).reshape(B, S * block)[:, :Q]
    return out.astype(grids.dtype)
