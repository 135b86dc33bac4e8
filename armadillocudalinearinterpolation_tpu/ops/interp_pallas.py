"""Pallas TPU kernels for batched linear interpolation.

These are the performance paths behind :mod:`.interp` (the pure-XLA reference
implementations, which remain the correctness oracle).  Measured on one
v5e chip against the XLA gather lowering (chained-iteration timing, see
``bench.py``):

  * ``lerp1d``:   ~14 Gq/s vs 0.07 Gq/s XLA (1k nodes); at 64k nodes the
    sort-for-locality path (``lerp1d_binned``) reaches ~1.1-2.2 Gq/s
    (6-13x the round-2 rolled chunk sweep's 0.17 — batched UNSTABLE value
    sort + dynamic-span sweep; ``is_stable=False`` alone is ~6.4x on the
    sorts, and with cheap sorts the optimum moved to longer rows,
    Qb ~ 4096)
  * ``make_interp1d`` (non-uniform nodes): ~0.97 Gq/s at 4k nodes / 2M
    uniform-distributed queries, exact vs the XLA searchsorted semantics
  * ``bilinear_batched``: ~0.48 Gq/s vs 0.018 Gq/s XLA at 256x256 (full
    tent kernel, bf16x2 with adaptive query sub-tiling, ~95% MFU of the
    3-matmul algorithmic ceiling — BENCH_r02: 475 Mq/s at 94.8%);
    ~0.21 Gq/s at 1024x1024 via the 2D-binned path (13-25x XLA; the full
    kernel exceeds scoped VMEM past ~512x512), near-flat in grid size
  * ``bilinear_batched_f64``: ~5x the XLA emulated-f64 path at full f64
    accuracy (hi/lo-split corner gather + exact f64 blend)

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

**2D bilinear, large grids** (``method='binned'``) — the full kernel's MAC
count and VMEM footprint grow with H*W; past ~512x512 it stops compiling.
The binned path sorts queries into ~120x120 grid bins (ONE bitonic sort —
on TPU any per-element gather/scatter is ~11 ns/element serial, while sort
moves ~1 M elements/0.6 ms) and runs each bin's queries against its 128x128
window: full-K MXU tiles, cost per query independent of grid size.  A
second sort restores query order.  See :func:`_bilinear_binned_kernel`.

The reference's restriction lerp (``/root/reference/EventDrivenMap.cu:769-785``)
is tiny; these kernels serve the standalone batched-interpolation capability
(BASELINE.md configs 1-2).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.x64 import x64_safe_call as _x64_safe_call

MAX_TABLE = 65536         # tables beyond the unroll threshold use a rolled
_UNROLL_CHUNKS = 32       # chunk loop (cost linear in n/128 — the in-vreg
_LANE = 128               # gather unit permutes within 128 lanes, so chunk
_ROWS = 256               # sweep is the algorithmic floor for VMEM lookup)


def _pad_to(x: jax.Array, n: int, axis: int = 0) -> jax.Array:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad)


def _pow2_batches(Q: int, target_qb: int = 4096) -> int:
    """Batch count for the sort-for-locality paths: the largest power of
    two with row length >= ``target_qb``.

    Qb ~ 4096 measured best at 2M queries with UNSTABLE sorts (longer
    rows = more groups along the sorted direction = narrower chunk spans;
    Qb=4096 0.95 ms vs Qb=2048 2.4-3.4 ms vs Qb=8192 1.9 ms).  Power of
    two is mandatory: XLA's row bitonic pads non-pow2 rows (nb=640..896
    measured 4x slower)."""
    return max(8, min(512, 1 << max(0, (Q // target_qb).bit_length() - 1)))


def _sort_batches(q: jax.Array, n_batches: int, group: int = _LANE):
    """Pad ``q`` to ``(n_batches, Qb)`` and value-sort each row, carrying
    restore indices — the shared front half of every sort-for-locality
    path (:func:`lerp1d_binned`, the non-uniform ``_interp_sorted``).

    Pads sort to the end of the last batch (+f32max) with sentinel restore
    index ``Q`` that :func:`_restore_order` drops.  ``is_stable=False``
    throughout this module: XLA's stable TPU sort costs ~6.4x the unstable
    one (measured 0.89 vs 0.14 ms per (f32, i32) 1024x2048 batched sort),
    and no site needs stability — tied query keys produce identical
    interpolants, restore keys are distinct (or equal only among dropped
    pad sentinels).  Returns ``(q_sorted, idx_sorted, Qb, total)``.
    """
    Q = q.shape[0]
    Qb = -(-Q // (n_batches * group)) * group
    total = n_batches * Qb
    if total == Q:
        # exact fit (the common bench/restrict shapes): no pad materialise
        qp = q
        iq = jnp.arange(Q, dtype=jnp.int32)
    else:
        qp = jnp.full((total,), jnp.float32(jnp.finfo(jnp.float32).max))
        qp = qp.at[:Q].set(q)
        iq = jnp.full((total,), Q, jnp.int32).at[:Q].set(
            jnp.arange(Q, dtype=jnp.int32))
    q_s, iq_s = jax.lax.sort((qp.reshape(n_batches, Qb),
                              iq.reshape(n_batches, Qb)),
                             dimension=1, num_keys=1, is_stable=False)
    return q_s, iq_s, Qb, total


def _restore_order(iq_s: jax.Array, val: jax.Array, total: int,
                   Q: int) -> jax.Array:
    """Batched restore sort by original index (contiguous per batch —
    each forward batch is a contiguous range of original indices, so the
    restore batches identically with no cross-batch movement)."""
    _, out = jax.lax.sort((iq_s, val), dimension=1, num_keys=1,
                          is_stable=False)
    return out.reshape(total)[:Q]


# --------------------------------------------------------------------- 1D

def _lerp1d_sorted_kernel(n: int, nb: int, rows_g: int, tab_ref, tab1_ref,
                          q_ref, lim_ref, out_ref):
    """One grid step: the SAME group index across every sorted batch.

    Each batch row is value-sorted, so group ``g`` of every batch covers
    (roughly) the same quantile of the query distribution and therefore
    nearly the same few table chunks.  Processing all ``nb`` batches' group
    ``g`` together amortises the sweep's per-chunk fixed cost over
    ``nb * rows_g`` rows while the dynamic ``[c_lo, c_hi]`` span stays as
    narrow as one batch's (plus cross-batch quantile jitter, ~2 chunks at
    the bench shape).  Skewed query distributions widen the span — in the
    worst case to the plain full sweep's cost — but results stay exact.
    """
    R = nb * rows_g
    q = q_ref[:].reshape(R, _LANE)   # block layout (nb, rows_g * 128)
    x0 = lim_ref[0]
    inv_dx = lim_ref[1]
    u = (q - x0) * inv_dx
    i0 = jnp.clip(u.astype(jnp.int32), 0, n - 2)
    t = jnp.clip(u - i0.astype(q.dtype), 0.0, 1.0)
    chunk = jax.lax.shift_right_logical(i0, jnp.int32(7))
    off = jax.lax.bitwise_and(i0, jnp.int32(_LANE - 1))
    c_lo = jnp.min(chunk)
    c_hi = jnp.max(chunk)

    def sweep(c, carry):
        f0, f1 = carry
        m = chunk == c
        g0 = jnp.take_along_axis(
            jnp.broadcast_to(tab_ref[pl.ds(c, 1), :], (R, _LANE)), off,
            axis=1)
        g1 = jnp.take_along_axis(
            jnp.broadcast_to(tab1_ref[pl.ds(c, 1), :], (R, _LANE)), off,
            axis=1)
        return jnp.where(m, g0, f0), jnp.where(m, g1, f1)

    f0 = jnp.zeros_like(q)
    f1 = jnp.zeros_like(q)
    f0, f1 = jax.lax.fori_loop(c_lo, c_hi + 1, sweep, (f0, f1))
    out_ref[:] = (f0 + t * (f1 - f0)).reshape(nb, rows_g * _LANE)


@functools.partial(jax.jit, static_argnames=("n_batches", "rows_g"))
def lerp1d_binned(xq: jax.Array, fp: jax.Array, x0: float, dx: float,
                  *, n_batches: int = 512, rows_g: int = 1) -> jax.Array:
    """Large-table 1D lerp: sort-for-locality + dynamic-span chunk sweep.

    The plain :func:`lerp1d` sweeps every ``n/128`` table chunk for every
    query block — cost linear in table size (0.17 Gq/s at 64k nodes,
    BENCH_r02).  Here queries are first sorted BY VALUE (sorted order =
    table order), so each group of sorted queries touches only its own few
    chunks and the sweep cost per query is ~flat in table size; a second
    sort restores query order.  Both sorts are *batched* into
    ``n_batches`` independent slices — a batched bitonic sort is far
    cheaper than a flat one (fewer merge levels + row parallelism;
    measured ~4-9x at 2M on v5e) — and fine batching is free here because
    (a) the kernel processes the same group index across all batches in
    one grid step (see :func:`_lerp1d_sorted_kernel`), so batching does
    not multiply sweep iterations, and (b) each forward batch is a
    contiguous range of original query indices, so the restore sort
    batches identically with no cross-batch movement.

    Exact for any query distribution (the 2D binned path's capacity-free
    guarantee); skew only widens per-group spans, degrading smoothly
    toward the plain sweep's throughput.
    """
    n = fp.shape[0]
    shape = xq.shape
    q = xq.reshape(-1).astype(jnp.float32)
    Q = q.shape[0]
    q_s, iq_s, Qb, total = _sort_batches(q, n_batches, rows_g * _LANE)

    n_pad = max(_LANE, ((n + _LANE - 1) // _LANE) * _LANE)
    n_chunks = n_pad // _LANE
    fp32 = fp.astype(jnp.float32)
    tab = _pad_to(fp32, n_pad).reshape(n_chunks, _LANE)
    tab1 = _pad_to(fp32[1:], n_pad).reshape(n_chunks, _LANE)
    lims = jnp.array([x0, 1.0 / dx], jnp.float32)

    # the (nb, Qb) sorted array is blocked along COLUMNS (each block =
    # one group of sorted columns across every batch), so no transpose or
    # reshape is needed outside the kernel and the block's minor-2 dim is
    # the full batch count (satisfying the Mosaic block-shape rule)
    cols_g = rows_g * _LANE
    val = _x64_safe_call(lambda: pl.pallas_call(
        functools.partial(_lerp1d_sorted_kernel, n, n_batches, rows_g),
        out_shape=jax.ShapeDtypeStruct((n_batches, Qb), jnp.float32),
        grid=(Qb // cols_g,),
        in_specs=[
            pl.BlockSpec((n_chunks, _LANE), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chunks, _LANE), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_batches, cols_g), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((n_batches, cols_g), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
    )(tab, tab1, q_s, lims))

    # caller-dtype contract at the function boundary (compute is f32
    # either way): an x64 caller of this PUBLIC entry point must not get
    # a silent dtype change — the same contract lerp1d keeps at :338
    return _restore_order(iq_s, val, total, Q).reshape(shape) \
        .astype(xq.dtype)


def _lerp1d_kernel(n: int, n_chunks: int, rows: int,
                   tab_ref, tab1_ref, q_ref, lim_ref, out_ref):
    """One grid step: (rows, 128) queries against the chunked table.

    Small tables unroll the chunk sweep at trace time (no loop overhead,
    chunk rows become vreg constants); large tables (> _UNROLL_CHUNKS
    chunks) run a rolled ``fori_loop`` with dynamic sublane slices so
    Mosaic compile time stays flat up to MAX_TABLE = 64k nodes.
    """
    q = q_ref[:]
    x0 = lim_ref[0]
    inv_dx = lim_ref[1]
    u = (q - x0) * inv_dx
    i0 = jnp.clip(u.astype(jnp.int32), 0, n - 2)
    t = jnp.clip(u - i0.astype(q.dtype), 0.0, 1.0)
    chunk = jax.lax.shift_right_logical(i0, jnp.int32(7))
    off = jax.lax.bitwise_and(i0, jnp.int32(_LANE - 1))

    def sweep(c, carry):
        f0, f1 = carry
        m = chunk == c
        g0 = jnp.take_along_axis(
            jnp.broadcast_to(tab_ref[pl.ds(c, 1), :], (rows, _LANE)), off,
            axis=1)
        g1 = jnp.take_along_axis(
            jnp.broadcast_to(tab1_ref[pl.ds(c, 1), :], (rows, _LANE)), off,
            axis=1)
        return jnp.where(m, g0, f0), jnp.where(m, g1, f1)

    f0 = jnp.zeros_like(q)
    f1 = jnp.zeros_like(q)
    if n_chunks <= _UNROLL_CHUNKS:
        for c in range(n_chunks):
            f0, f1 = sweep(c, (f0, f1))
    else:
        f0, f1 = jax.lax.fori_loop(0, n_chunks, sweep, (f0, f1))
    out_ref[:] = f0 + t * (f1 - f0)


@functools.partial(jax.jit, static_argnames=("rows",))
def lerp1d(xq: jax.Array, fp: jax.Array, x0: float, dx: float,
           *, rows: int = _ROWS) -> jax.Array:
    """Uniform-grid 1D lerp (clamped), Pallas fast path.

    Semantics match :func:`..ops.interp.lerp_uniform` /(``numpy.interp`` on a
    uniform grid).  ``fp`` must have at most ``MAX_TABLE`` nodes; queries of
    any shape (flattened internally, padded to a whole number of blocks).

    Large tables with enough queries route to :func:`lerp1d_binned` (the
    chunk sweep is linear in table size; the sort-for-locality path is
    ~flat — crossover measured around 8k nodes at >= 128k queries).
    """
    if fp.shape[0] > MAX_TABLE:
        raise ValueError(f"table too large for VMEM kernel: {fp.shape[0]}")
    if fp.shape[0] > 8192 and xq.size >= 131072:
        # Batch count per _pow2_batches (Qb ~ 4096 measured best; see its
        # docstring).  NOTE when re-measuring: control the query
        # distribution — feeding an interpolant back as queries
        # concentrates them and flatters the sweep (see bench_lerp1d_64k).
        nb = _pow2_batches(xq.size)
        # lerp1d_binned keeps the caller-dtype contract itself
        return lerp1d_binned(xq, fp, x0, dx, n_batches=nb, rows_g=1)
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

    out = _x64_safe_call(lambda: pl.pallas_call(
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
    )(tab, tab1, qp, lims))
    return out.reshape(-1)[:Q].reshape(shape).astype(xq.dtype)


# ------------------------------------------------------- 1D, non-uniform

def _interp1d_kernel(n: int, m: int, n_chunks: int, m_chunks: int, S: int,
                     rows: int, xp1_ref, packed_ref, bucket_ref, q_ref,
                     lim_ref, out_ref):
    """Non-uniform nodes: uniform-bucket seed + S bounded advance steps.

    ``bucket[k]`` = index of the node at-or-left-of the k-th uniform bucket
    edge; the true bracket index for a query in bucket ``k`` lies within
    ``S`` = max nodes-per-bucket of that seed, so ``S`` compare-and-advance
    steps (each one chunked in-vreg gather of ``xp[lo+1]``) land it exactly.
    ``packed`` holds 4 gather targets interleaved by sublane —
    ``xp[lo], xp[lo+1], fp[lo], fp[lo+1]`` resolve in ONE chunk sweep.
    """
    q = q_ref[:].reshape(rows, _LANE)   # any block layout of rows*128 queries
    e0 = lim_ref[0]
    inv_du = lim_ref[1]
    xlo = lim_ref[2]
    xhi = lim_ref[3]
    qc = jnp.minimum(jnp.maximum(q, xlo), xhi)   # constant extrapolation

    k = jnp.clip(((qc - e0) * inv_du).astype(jnp.int32), 0, m - 1)

    def gather_chunked(ref, idx, chunks, scale=1, base=0):
        """Gather ref.reshape(-1)[scale*chunkrow + lane] at flat ``idx``.

        The sweep runs over the dynamic ``[min, max]`` chunk range of THIS
        call's indices: for arbitrary queries that is the whole table, but
        value-sorted query blocks (the sorted path below) span only a few
        chunks, making the per-query cost ~flat in table size — same
        locality idea as :func:`_lerp1d_sorted_kernel`.
        """
        chunk = jax.lax.shift_right_logical(idx, jnp.int32(7))
        off = jax.lax.bitwise_and(idx, jnp.int32(_LANE - 1))
        acc = jnp.zeros_like(qc)

        def body(c, acc):
            g = jnp.take_along_axis(
                jnp.broadcast_to(ref[pl.ds(scale * c + base, 1), :],
                                 (rows, _LANE)), off, axis=1)
            return jnp.where(chunk == c, g, acc)

        if chunks <= 8:
            for c in range(chunks):
                acc = body(c, acc)
        else:
            acc = jax.lax.fori_loop(jnp.min(chunk), jnp.max(chunk) + 1,
                                    body, acc)
        return acc

    lo_f = gather_chunked(bucket_ref, k, m_chunks)
    lo = jnp.clip(lo_f.astype(jnp.int32), 0, n - 2)
    # f32 rounding in (q - e0) * inv_du can overshoot the bucket index by
    # one near an edge; verify the seed node is at-or-left of the query and
    # step back a bucket if not (S is sized for the two-bucket span).
    xseed = gather_chunked(packed_ref, lo, n_chunks, scale=4, base=0)
    k = k - jnp.where(jnp.logical_and(xseed > qc, k > 0), 1, 0)
    lo_f = gather_chunked(bucket_ref, k, m_chunks)
    lo = jnp.clip(lo_f.astype(jnp.int32), 0, n - 2)

    # bounded advance: while xp[lo+1] <= q: lo += 1   (at most S times)
    for _ in range(S):
        xnext = gather_chunked(xp1_ref, lo, n_chunks)
        adv = jnp.logical_and(xnext <= qc, lo < n - 2)
        lo = lo + jnp.where(adv, 1, 0)

    # one sweep resolves all four interleaved tables at the same (chunk, off)
    x0 = gather_chunked(packed_ref, lo, n_chunks, scale=4, base=0)
    x1 = gather_chunked(packed_ref, lo, n_chunks, scale=4, base=1)
    f0 = gather_chunked(packed_ref, lo, n_chunks, scale=4, base=2)
    f1 = gather_chunked(packed_ref, lo, n_chunks, scale=4, base=3)
    t = jnp.clip((qc - x0) / (x1 - x0), 0.0, 1.0)
    out_ref[:] = (f0 + t * (f1 - f0)).reshape(out_ref.shape)


def make_interp1d(xp, fp, *, oversample: int = 4, rows: int = _ROWS):
    """Build a jittable Pallas interpolant for *non-uniform* nodes.

    Completes ``arma::interp1`` general-node parity at Pallas speed
    (VERDICT.md round 1, next-round item #6); the XLA
    :func:`..ops.interp.interp1d` stays the semantic oracle.  Node prep
    (uniform bucket map + max-span bound ``S``) runs once here on concrete
    arrays; the returned closure is safe under ``jit``/``vmap``.

    Args:
      xp: ``(n,)`` strictly increasing nodes (concrete, n <= MAX_TABLE).
      fp: ``(n,)`` values at nodes.
      oversample: uniform buckets per node (higher -> smaller ``S``).

    Returns:
      ``f(xq) -> interpolated values``, clamped at the table ends
      (``numpy.interp`` semantics, matching the XLA reference).
    """
    import numpy as np_  # host-side table prep (concrete arrays)
    xp = jnp.asarray(xp)
    fp = jnp.asarray(fp)
    n = xp.shape[0]
    if n > MAX_TABLE:
        raise ValueError(f"table too large: {n} > {MAX_TABLE}")
    if n < 2:
        raise ValueError("need at least 2 nodes")
    xp_h = np_.asarray(xp, dtype=np_.float64)
    if not (np_.diff(xp_h) > 0).all():
        raise ValueError("xp must be strictly increasing")

    m = max(_LANE, int(1 << (oversample * n - 1).bit_length()))
    m = min(m, MAX_TABLE * 4)
    edges = xp_h[0] + (xp_h[-1] - xp_h[0]) * np_.arange(m) / m
    bucket = np_.searchsorted(xp_h, edges, side="right") - 1
    bucket = np_.clip(bucket, 0, n - 2)
    # max nodes a query can advance past its (possibly stepped-back) bucket
    # seed: the two-bucket span, since the in-kernel seed check may move one
    # bucket left of the query's own bucket
    ext = np_.append(bucket, [n - 2, n - 2])
    S = int(np_.max(ext[2:] - bucket)) + 1

    n_pad = max(_LANE, ((n + _LANE - 1) // _LANE) * _LANE)
    n_chunks = n_pad // _LANE
    m_chunks = m // _LANE
    f32 = jnp.float32
    xp32 = _pad_to(xp.astype(f32), n_pad)
    # pad the shifted copy with +inf so the advance test never fires past
    # the final interval
    xp1 = jnp.concatenate([xp.astype(f32)[1:],
                           jnp.full((n_pad - n + 1,), jnp.inf, f32)])
    xp1_tab = xp1.reshape(n_chunks, _LANE)
    fp32 = _pad_to(fp.astype(f32), n_pad)
    fp1 = _pad_to(fp.astype(f32)[1:], n_pad)
    # interleave by chunk row: rows 4c..4c+3 = xp, xp1, fp, fp1 of chunk c
    packed = jnp.stack([xp32.reshape(n_chunks, _LANE),
                        xp1.reshape(n_chunks, _LANE),
                        fp32.reshape(n_chunks, _LANE),
                        fp1.reshape(n_chunks, _LANE)], axis=1
                       ).reshape(4 * n_chunks, _LANE)
    bucket_tab = jnp.asarray(bucket, f32).reshape(m_chunks, _LANE)
    lims = jnp.array([edges[0], m / (xp_h[-1] - xp_h[0]),
                      xp_h[0], xp_h[-1]], f32)

    def _interp_sorted(q: jax.Array) -> jax.Array:
        """Value-sorted query path: the same kernel, but every chunk sweep
        collapses to the block's own narrow dynamic range (see
        :func:`lerp1d_binned` for the batched-sort reasoning; each grid
        step here is one sorted 128-column group across all NB batches).
        Batch count targets Qb ~ 4096 like :func:`lerp1d` (with unstable
        sorts, longer rows = narrower per-group spans win)."""
        Q = q.shape[0]
        NB = _pow2_batches(Q)
        q_s, iq_s, Qb, total = _sort_batches(q, NB)
        val = _x64_safe_call(lambda: pl.pallas_call(
            functools.partial(_interp1d_kernel, n, m, n_chunks, m_chunks, S,
                              NB),
            out_shape=jax.ShapeDtypeStruct((NB, Qb), f32),
            grid=(Qb // _LANE,),
            in_specs=[
                pl.BlockSpec((n_chunks, _LANE), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * n_chunks, _LANE), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m_chunks, _LANE), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, _LANE), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((NB, _LANE), lambda g: (0, g),
                                   memory_space=pltpu.VMEM),
        )(xp1_tab, packed, bucket_tab, q_s, lims))
        return _restore_order(iq_s, val, total, Q)

    @jax.jit
    def interp(xq: jax.Array) -> jax.Array:
        shape = xq.shape
        q = xq.reshape(-1).astype(f32)
        block = rows * _LANE
        Q = q.shape[0]
        if Q >= 262144 and n_chunks > 8:
            return _interp_sorted(q).reshape(shape).astype(xq.dtype)
        nsteps = max(1, (Q + block - 1) // block)
        qp = _pad_to(q, nsteps * block).reshape(nsteps * rows, _LANE)
        out = _x64_safe_call(lambda: pl.pallas_call(
            functools.partial(_interp1d_kernel, n, m, n_chunks, m_chunks, S,
                              rows),
            out_shape=jax.ShapeDtypeStruct((nsteps * rows, _LANE), f32),
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((n_chunks, _LANE), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * n_chunks, _LANE), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m_chunks, _LANE), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, _LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((rows, _LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(xp1_tab, packed, bucket_tab, qp, lims))
        return out.reshape(-1)[:Q].reshape(shape).astype(xq.dtype)

    return interp


def interp1d(xq, xp, fp, **kw):
    """One-shot non-uniform interp (builds the table, then evaluates).

    ``xp``/``fp`` must be concrete (table prep inspects them); for repeated
    queries against one table use :func:`make_interp1d`.
    """
    return make_interp1d(xp, fp, **kw)(xq)


# ---------------------------------------------------------- 2D, fp64-grade

def _gather8_kernel(hw: int, n_chunks: int, rows: int,
                    tabs_ref, idx_ref, out_ref):
    """Gather 8 pre-shifted table copies at one flat index per query.

    ``tabs`` rows ``8c .. 8c+7`` hold chunk ``c`` of the four corner shifts
    (0, 1, W, W+1) of the hi then lo f32 halves of an f64 grid, so ONE
    chunk sweep resolves every value bilinear needs.  Output lane layout:
    8 consecutive sublane groups of ``rows`` each (corner-major).
    """
    idx = idx_ref[0, 0].astype(jnp.int32)
    chunk = jax.lax.shift_right_logical(idx, jnp.int32(7))
    off = jax.lax.bitwise_and(idx, jnp.int32(_LANE - 1))

    def sweep(c, acc):
        m = chunk == c
        outs = []
        for k in range(8):
            g = jnp.take_along_axis(
                jnp.broadcast_to(tabs_ref[0, pl.ds(8 * c + k, 1), :],
                                 (rows, _LANE)), off, axis=1)
            outs.append(jnp.where(m, g, acc[k]))
        return tuple(outs)

    acc = tuple(jnp.zeros((rows, _LANE), jnp.float32) for _ in range(8))
    acc = jax.lax.fori_loop(0, n_chunks, sweep, acc)
    out_ref[0, 0] = jnp.concatenate(acc, axis=0)


def bilinear_batched_f64(pts: jax.Array, grids: jax.Array,
                         *, rows: int = 64) -> jax.Array:
    """Batched 2D bilinear at full f64 accuracy, Pallas-accelerated.

    BASELINE.md config 2 lists fp32/fp64; this is the fp64 leg at speed
    (VERDICT.md round 1, next-round item #4).  The gather — the part XLA's
    emulated-f64 path is slow at — runs as an f32 Pallas chunk sweep over
    hi/lo split tables (exact: f64 = f32_hi + f32_lo); the 4-corner blend
    runs in genuine f64 on the XLA side (cheap: ~20 flops/query).  Matches
    the host-double oracle to ~1e-15.

    Args:
      pts: ``(B, Q, 2)`` f64 query coordinates in index space (clamped).
      grids: ``(B, H, W)`` f64 tables; ``H*W <= MAX_TABLE``.
    """
    f32 = jnp.float32
    B, Q, _ = pts.shape
    _, H, W = grids.shape
    hw = H * W
    if hw > MAX_TABLE:
        raise ValueError(f"grid too large for VMEM sweep: {H}x{W}")

    r = jnp.clip(pts[..., 0], 0.0, H - 1.0)
    c = jnp.clip(pts[..., 1], 0.0, W - 1.0)
    r0 = jnp.clip(jnp.floor(r).astype(jnp.int32), 0, H - 2)
    c0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, W - 2)
    tr = (r - r0).astype(jnp.float64)
    tc = (c - c0).astype(jnp.float64)
    flat = (r0 * W + c0).astype(f32)               # exact below 2^24

    # four corner shifts x (hi, lo): f64 = hi + lo exactly
    g64 = grids.astype(jnp.float64).reshape(B, hw)
    n_pad = ((hw + _LANE - 1) // _LANE) * _LANE
    n_chunks = n_pad // _LANE

    def shifted(sh):
        return _pad_to(g64[:, sh:], n_pad, axis=1)

    parts = []
    for sh in (0, 1, W, W + 1):
        g = shifted(sh)
        hi = g.astype(f32)
        lo = (g - hi.astype(jnp.float64)).astype(f32)
        parts.append(hi)
        parts.append(lo)
    # interleave by chunk: rows 8c..8c+7 = the 8 parts of chunk c
    tabs = jnp.stack([p.reshape(B, n_chunks, _LANE) for p in parts],
                     axis=2).reshape(B, 8 * n_chunks, _LANE)

    block = rows * _LANE
    S = max(1, (Q + block - 1) // block)
    idx = _pad_to(flat, S * block, axis=1).reshape(B, S, rows, _LANE)

    out = _x64_safe_call(lambda: pl.pallas_call(
        functools.partial(_gather8_kernel, hw, n_chunks, rows),
        out_shape=jax.ShapeDtypeStruct((B, S, 8 * rows, _LANE), f32),
        grid=(B, S),
        in_specs=[
            pl.BlockSpec((1, 8 * n_chunks, _LANE), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, _LANE), lambda b, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8 * rows, _LANE),
                               lambda b, s: (b, s, 0, 0),
                               memory_space=pltpu.VMEM),
    )(tabs, idx))

    # (B, S, 8, rows, LANE) -> corner values as f64, unpadded
    out = out.reshape(B, S, 8, rows, _LANE).reshape(B, S, 8, block)
    out = jnp.moveaxis(out, 2, 1).reshape(B, 8, S * block)[:, :, :Q]
    g00 = out[:, 0].astype(jnp.float64) + out[:, 1].astype(jnp.float64)
    g01 = out[:, 2].astype(jnp.float64) + out[:, 3].astype(jnp.float64)
    g10 = out[:, 4].astype(jnp.float64) + out[:, 5].astype(jnp.float64)
    g11 = out[:, 6].astype(jnp.float64) + out[:, 7].astype(jnp.float64)
    top = g00 + tc * (g01 - g00)
    bot = g10 + tc * (g11 - g10)
    return top + tr * (bot - top)


# ------------------------------------------------------------ 2D, binned

_BIN_WIN = 128       # window per bin = one full-K MXU tile per grid axis
_BIN_MAX_EDGE = 120  # max bin extent; +1 tent overlap fits the 128 window


def _bilinear_binned_kernel(q_count: int, bits: int, gmax: int, nbc: int,
                            be_r: int, be_c: int, x2: bool,
                            key_ref, r_ref, c_ref, offs_ref, gstart_ref,
                            ghT_ref, glT_ref, val_ref, qid_ref):
    """One grid step = one (batch, bin): the bin's queries vs its 128x128
    grid window.

    The bin's queries live at rows ``[offsets[bin], offsets[bin+1])`` of the
    bin-sorted arrays — extracted with dynamic sublane slices + lane rolls
    (measured on v5e: any XLA per-element gather/scatter runs ~11 ns/element
    serial, 100x too slow, so ALL data movement is sorts outside + in-VMEM
    shuffles here).  The group loop is a *dynamic* ``fori_loop`` over exactly
    ``ceil(count/128)`` groups — no static per-bin capacity, so ANY query
    distribution (including all queries in one bin) is handled exactly, with
    no fallback branch.  (A ``lax.cond`` fallback is not an option anyway:
    XLA on TPU flattens conditionals, executing both branches — measured
    11x the whole kernel.)  Each group writes to output rows
    ``gstart[bin] + i``, where ``gstart`` is the exclusive cumsum of
    per-bin group counts; bin 0 pre-fills the whole per-batch block with
    sentinel rows first (the TPU grid is sequential, so ordering is safe).

    Tent weights over the window make both grid axes MXU operands:
    ``rowsT (128c,128q) = gridT (128c,128r) @ wr (128r,128q)`` with K = 128
    — a full systolic tile, unlike a thin per-band slab.  Queries stay on
    lanes end-to-end: no transposes.
    """
    b = pl.program_id(0)
    k = pl.program_id(1)
    off = offs_ref[b, k]
    cnt = offs_ref[b, k + 1] - off
    gs = gstart_ref[b, k]
    rb = (k // nbc) * be_r
    cb = jnp.mod(k, nbc) * be_c
    ghT = ghT_ref[0, 0]
    glT = glT_ref[0, 0] if x2 else None
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0).astype(
        jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)

    @pl.when(k == 0)
    def _():
        # sentinel-fill the per-batch output block; rows a bin owns are
        # overwritten below, rows beyond the last group stay sentinels
        val_ref[:] = jnp.zeros((1, gmax, _LANE), jnp.float32)
        qid_ref[:] = jnp.full((1, gmax, _LANE), q_count, jnp.int32)

    def group(i, carry):
        base = off + i * _LANE
        row = jax.lax.shift_right_logical(base, 7)
        sh = jax.lax.bitwise_and(base, _LANE - 1)
        back = jnp.mod(_LANE - sh, _LANE)         # roll[i] = orig[(i+sh)%128]

        def extract(ref):
            two = ref[0, pl.ds(row, 2), :]
            a = pltpu.roll(two[0:1, :], back, 1)
            bb = pltpu.roll(two[1:2, :], back, 1)
            return jnp.where(lane < _LANE - sh, a, bb)

        key = extract(key_ref)
        r = extract(r_ref)                         # pre-clipped global coords
        c = extract(c_ref)
        valid = i * _LANE + lane < cnt
        iq = jax.lax.bitwise_and(key, (1 << bits) - 1)
        # invalid slots -> coord -2: tent weights identically zero
        r_loc = jnp.where(valid, r - rb, -2.0)
        c_loc = jnp.where(valid, c - cb, -2.0)
        wr = jnp.maximum(0.0, 1.0 - jnp.abs(iota_s - r_loc))  # (128r, 128q)
        wc = jnp.maximum(0.0, 1.0 - jnp.abs(iota_s - c_loc))  # (128c, 128q)
        wh = wr.astype(jnp.bfloat16)
        rowsT = jnp.dot(ghT, wh, preferred_element_type=jnp.float32)
        if x2:
            wl = (wr - wh.astype(jnp.float32)).astype(jnp.bfloat16)
            rowsT = (rowsT
                     + jnp.dot(glT, wh, preferred_element_type=jnp.float32)
                     + jnp.dot(ghT, wl, preferred_element_type=jnp.float32))
        orow = pl.ds(gs + i, 1)
        val_ref[0, orow, :] = jnp.sum(rowsT * wc, axis=0, keepdims=True)
        qid_ref[0, orow, :] = jnp.where(valid, iq, q_count)
        return carry

    n_groups = jax.lax.shift_right_logical(cnt + _LANE - 1, 7)
    jax.lax.fori_loop(0, n_groups, group, 0)


def _bilinear_binned(pts: jax.Array, grids: jax.Array, x2: bool
                     ) -> jax.Array:
    """2D-binned bilinear: sort queries into grid bins (~120x120), run each
    bin's queries against its 128x128 window (full-K MXU tiles).

    MACs/query = ``3 * 128 * 128`` independent of grid size — vs the full
    kernel's ``3 * Hp * Wp``, which exceeds this beyond 128x128 grids and
    runs out of VMEM beyond ~512x512.  Everything outside the kernel is
    sorts (bitonic, ~0.6 ms/M elements on v5e) — never per-element
    gathers/scatters (~11 ns/element serial on TPU).  Bin extents divide the
    grid evenly (max 120) so uniform queries load bins uniformly.
    """
    B, Q, _ = pts.shape
    _, H, W = grids.shape
    nbr = max(1, -(-max(H - 1, 1) // _BIN_MAX_EDGE))
    nbc = max(1, -(-max(W - 1, 1) // _BIN_MAX_EDGE))
    be_r = -(-max(H - 1, 1) // nbr)              # even spread, <= 120
    be_c = -(-max(W - 1, 1) // nbc)
    nbins = nbr * nbc
    bits = max(1, (Q - 1).bit_length())
    if (nbins << bits) >= 2 ** 31:
        raise ValueError(f"bin-key overflow: {nbins} bins x {Q} queries")
    # exact total group bound: Q/128 full groups + one partial per bin
    gmax = -(-Q // _LANE) + nbins

    r = jnp.clip(pts[..., 0].astype(jnp.float32), 0.0, H - 1.0)
    c = jnp.clip(pts[..., 1].astype(jnp.float32), 0.0, W - 1.0)
    r0 = jnp.clip(r.astype(jnp.int32), 0, H - 2)
    c0 = jnp.clip(c.astype(jnp.int32), 0, W - 2)
    bin_id = (jnp.minimum(r0 // be_r, nbr - 1) * nbc
              + jnp.minimum(c0 // be_c, nbc - 1))            # (B, Q)
    iq = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32), (B, Q))
    key = jax.lax.shift_left(bin_id, jnp.int32(bits)) | iq
    key_s, r_s, c_s = jax.lax.sort((key, r, c), dimension=1, num_keys=1,
                                   is_stable=False)

    edges = jax.lax.shift_left(jnp.arange(nbins + 1, dtype=jnp.int32),
                               jnp.int32(bits))
    offsets = jax.vmap(
        lambda row: jnp.searchsorted(row, edges, side="left"))(
            key_s).astype(jnp.int32)                         # (B, nbins+1)
    counts = offsets[:, 1:] - offsets[:, :-1]
    ngrp = -(-counts // _LANE)                               # ceil
    gstart = (jnp.cumsum(ngrp, axis=1) - ngrp).astype(jnp.int32)

    # pad the sorted arrays so every dynamic 2-row read is in bounds
    rows_in = -(-Q // _LANE) + 2
    key_p = _pad_to(key_s, rows_in * _LANE, axis=1).reshape(B, rows_in, _LANE)
    r_p = _pad_to(r_s, rows_in * _LANE, axis=1).reshape(B, rows_in, _LANE)
    c_p = _pad_to(c_s, rows_in * _LANE, axis=1).reshape(B, rows_in, _LANE)

    # 128x128 grid windows, transposed to (cols, rows), hi/lo bf16 split.
    # Built from full-row/-col slabs (static slices + one transpose — no
    # element gathers).
    Hp = (nbr - 1) * be_r + _BIN_WIN
    Wp = (nbc - 1) * be_c + _BIN_WIN
    g32 = jnp.pad(grids.astype(jnp.float32),
                  ((0, 0), (0, Hp - H), (0, Wp - W)))
    rws = jnp.stack([g32[:, k * be_r:k * be_r + _BIN_WIN, :]
                     for k in range(nbr)], axis=1)           # (B,nbr,128,Wp)
    gT = jnp.swapaxes(rws, 2, 3)                             # (B,nbr,Wp,128)
    win = jnp.stack([gT[:, :, k * be_c:k * be_c + _BIN_WIN, :]
                     for k in range(nbc)], axis=2)    # (B,nbr,nbc,128c,128r)
    win = win.reshape(B, nbins, _BIN_WIN, _BIN_WIN)
    hi = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(win, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32)
    ghT = hi.astype(jnp.bfloat16)
    glT = ((win - hi).astype(jnp.bfloat16) if x2
           else jnp.zeros((B, nbins, 8, _LANE), jnp.bfloat16))
    glT_block = (1, 1, _BIN_WIN, _BIN_WIN) if x2 else (1, 1, 8, _LANE)

    val, qid = _x64_safe_call(lambda: pl.pallas_call(
        functools.partial(_bilinear_binned_kernel, Q, bits, gmax, nbc,
                          be_r, be_c, x2),
        out_shape=(
            jax.ShapeDtypeStruct((B, gmax, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((B, gmax, _LANE), jnp.int32),
        ),
        grid=(B, nbins),
        in_specs=[
            pl.BlockSpec((1, rows_in, _LANE), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_in, _LANE), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_in, _LANE), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # offsets, whole array
            pl.BlockSpec(memory_space=pltpu.SMEM),   # gstart, whole array
            pl.BlockSpec((1, 1, _BIN_WIN, _BIN_WIN), lambda b, k: (b, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(glT_block, lambda b, k: (b, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, gmax, _LANE), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gmax, _LANE), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(key_p, r_p, c_p, offsets, gstart,
      ghT, glT.reshape((B, nbins) + glT.shape[-2:])))

    # unbin: ONE bitonic sort by original query index; sentinels (q_count)
    # sort past the tail we keep
    _, out_sorted = jax.lax.sort(
        (qid.reshape(B, -1), val.reshape(B, -1)), dimension=1, num_keys=1,
        is_stable=False)
    return out_sorted[:, :Q]


# --------------------------------------------------------------------- 2D

_SUB = 8       # min query sub-tiles per grid step (128 queries each)
_SUB_MAX = 128  # cap: VMEM for the (128, sub) query/output blocks


def _bilinear_kernel2(h: int, w: int, hp: int, wp: int, x2: bool, sub: int,
                      gh_ref, gl_ref, rT_ref, cT_ref, out_ref):
    gh = gh_ref[0]
    gl = gl_ref[0]
    rT = rT_ref[0, 0]          # (128, sub) row coords, query-on-sublane
    cT = cT_ref[0, 0]
    iota_rf = jax.lax.broadcasted_iota(jnp.int32, (_LANE, hp), 1).astype(
        jnp.float32)
    iota_cf = jax.lax.broadcasted_iota(jnp.int32, (_LANE, wp), 1).astype(
        jnp.float32)
    cols = []
    for j in range(sub):
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


def _auto_bilinear_method(h: int, w: int) -> str:
    """Full-vs-binned routing for ``method='auto'``.

    Crossover measured on v5e 2026-08-20 (artifacts/bilinear_crossover.py,
    1M queries, grid bytes held comparable):

    ======== ========= ============== ==============
    grid     128-tiles full           binned
    ======== ========= ============== ==============
    256^2    4         377 Mq/s       230 Mq/s
    384^2    9         FAILS compile  196 Mq/s
    512^2    16        FAILS compile  225 Mq/s
    768^2    36        —              178 Mq/s
    ======== ========= ============== ==============

    full's MAC count passes binned's fixed 3*128*128/query at ~180^2 and
    its compile envelope (Mosaic/VMEM at the adaptive sub-tiling) ends
    right past 256^2, so the switch is at >4 grid tiles — the earlier
    >16 threshold routed 384-512^2 grids to a kernel that cannot compile
    there.
    """
    return "binned" if (h + 127) // 128 * ((w + 127) // 128) > 4 else "full"


@functools.partial(jax.jit, static_argnames=("precision", "method"))
def bilinear_batched(pts: jax.Array, grids: jax.Array,
                     precision: Literal["bf16x2", "bf16"] = "bf16x2",
                     method: Literal["auto", "full", "binned"] = "auto"
                     ) -> jax.Array:
    """Batched 2D bilinear lookup, Pallas MXU fast path.

    Args/semantics match :func:`..ops.interp.bilinear_batched`:
    ``pts (B, Q, 2)`` index-space queries (clamped), ``grids (B, H, W)`` of
    any shape (zero-padded to hardware tiling internally — exact, see the
    kernel comment).

    ``method='full'`` runs every query against the whole grid (tent-weight
    MXU matmuls, ~95% MFU with adaptive query sub-tiling — BENCH_r02
    measured 475 Mq/s / 94.8% at 256x256x64) — optimal up to ~256x256, VMEM-bound beyond
    ~512x512.  ``method='binned'`` sorts queries into 120x120 bins and runs
    128x128 windows (:func:`_bilinear_binned`) — flat cost in grid size.
    ``'auto'`` picks by grid area.
    """
    B, Q, _ = pts.shape
    _, H, W = grids.shape
    if method == "auto":
        method = _auto_bilinear_method(H, W)
    if method == "binned":
        return _bilinear_binned(pts, grids, precision == "bf16x2"
                                ).astype(grids.dtype)
    return _bilinear_full(pts, grids, precision == "bf16x2"
                          ).astype(grids.dtype)


def _bilinear_full(pts: jax.Array, grids: jax.Array, x2: bool) -> jax.Array:
    B, Q, _ = pts.shape
    _, H, W = grids.shape
    # Zero-pad the grid to hardware tiling.  This is exact: query coords are
    # clipped to the ORIGINAL [0, H-1] x [0, W-1] inside the kernel, so tent
    # weights on padded rows/cols are identically zero (the weight at index
    # H is 1 - |H - (H-1)| = 0 even for boundary queries).
    Hp = ((H + 7) // 8) * 8
    Wp = ((W + _LANE - 1) // _LANE) * _LANE
    # Subtiles per grid step: per-step overhead is ~1.4 us on v5e, so pack
    # as many 128-query subtiles into a step as the query count fills
    # (measured at 64x256x256x16k: _SUB 8 -> 3.18 ms, 128 -> 2.18 ms, ~90%
    # of the 3-matmul MXU floor).  Next-pow2 sizing bounds padding waste.
    n128 = max(1, -(-Q // _LANE))
    sub = min(_SUB_MAX, max(_SUB, 1 << (n128 - 1).bit_length()))
    block = sub * _LANE
    S = max(1, (Q + block - 1) // block)
    # query-on-sublane layout: (B, S, 128, sub)
    p = _pad_to(pts.astype(jnp.float32), S * block, axis=1)
    p = p.reshape(B, S, sub, _LANE, 2)
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
    # In 'bf16' mode the kernel never reads the low part: ship a tiny dummy
    # block instead of computing and streaming a second full grid.
    gl = ((g32 - hi).astype(jnp.bfloat16) if x2
          else jnp.zeros((B, 8, _LANE), jnp.bfloat16))
    gl_block = (1, Hp, Wp) if x2 else (1, 8, _LANE)

    out = _x64_safe_call(lambda: pl.pallas_call(
        functools.partial(_bilinear_kernel2, H, W, Hp, Wp, x2, sub),
        out_shape=jax.ShapeDtypeStruct((B, S, _LANE, sub), jnp.float32),
        grid=(B, S),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(gl_block, lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANE, sub), lambda b, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANE, sub), lambda b, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, _LANE, sub), lambda b, s: (b, s, 0, 0),
                               memory_space=pltpu.VMEM),
    )(gh, gl, rT, cT))
    return jnp.swapaxes(out, 2, 3).reshape(B, S * block)[:, :Q]
