"""Exact-product sliced GEMM — f64-quality matmuls on the bf16 MXU.

The emulated-f64 matmul on TPU runs at ~20 GFLOP/s (measured: a
(157k x 110)^T (157k x 10) Gram pair costs ~29 ms, vs 1.5 ms in f32) — it
is the dominant cost of GCG's orthogonalization and Rayleigh-Ritz phases.
Plain f32/bf16 GEMMs cannot replace it: their ~1e-7 ABSOLUTE error floors
the solver (measured convergence stalls; see ``solvers.orth``).

This module implements the Ozaki-scheme alternative: slice each f64 operand
into ``S`` bf16 planes of ``BITS``-bit fixed-point mantissa slices (relative
to a per-column power-of-2 scale), so that

* every slice is EXACTLY representable in bf16 (``|s_k / u_k| < 2^BITS``
  with ``u_k = 2^(-BITS*(k+1))``, an integer in grid units);
* every product of two slices is EXACT in f32 (``2*BITS <= 24`` bits);
* every in-chunk MXU accumulation of ``CHUNK`` such products is EXACT in
  the f32 accumulator (``2*BITS + log2(CHUNK) <= 24``).

The only roundings left are the cross-chunk combination — carried in a
compensated double-f32 accumulator (Knuth two-sum, exact) — and the final
recombination, giving ~2^-46 * sigma_a * sigma_b absolute accuracy per
element: the same class as this runtime's own double-float f64 arithmetic
and the df64 Pallas SpMM (``ops.spmm_pallas``).

Reference being replaced: the BLAS ``dgemm``/``dsymm`` calls behind the
reference's ``DenseMatQtAP``/``MultiVecLinearComb``
(``/root/reference/app/app_lapack.c:24-227,463-534``) — re-engineered for a
machine whose fast matmul unit has no f64.

Layers:

* :func:`slice_planes` — f64 -> (S, n, p) bf16 slices + per-column scales
  (f32/bf16 arithmetic only; the f64 input is touched twice).
* :func:`os_gram` — tall contraction ``a^T @ b`` ((n,p),(n,q) -> (p,q)).
* :func:`os_expand` — short contraction ``a @ c`` ((n,k),(k,q) -> (n,q)),
  where k <= 512 so even unchunked f32 accumulation of exact products is
  exact.

The XLA formulation here is the correctness reference; on TPU the
chunk-batched einsum is inefficient (measured 4 ms per slice pair), so
``os_gram`` routes through a Pallas kernel (``osgemm_pallas``) when
available and falls back to the XLA path (still exact) elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BITS = 7                      # mantissa bits per slice (bf16-exact: <= 8)
SLICES = 7                    # 7 x 7 = 49 bits ~ f64-emulation quality
CHUNK = 256                   # 2*BITS + log2(CHUNK) = 22 <= 24: exact accum
_PAIRS = tuple((i, j) for i in range(SLICES) for j in range(SLICES)
               if i + j < SLICES)        # 28 pairs, coverage 2^-49


def _pow2_col_scale(a):
    """Per-column power-of-2 scale sigma_p >= max|a[:, p]| (f64 in, f32 out).

    Powers of two make the descaling exact (multiplication by 2^-e commutes
    with the fixed-point grid).  Zero columns get scale 1.
    """
    m = jnp.max(jnp.abs(a), axis=0)
    e = jnp.ceil(jnp.log2(jnp.where(m > 0, m, 1.0)))
    # stay in f32-normal range (the scheme targets ~unit-scale numerical
    # linear algebra data; columns beyond +-2^100 would need f64 scales)
    e = jnp.clip(e, -100.0, 100.0)
    return jnp.exp2(e).astype(jnp.float32), m


def slice_planes(a):
    """Split f64 ``a`` (n, p) into bf16 slice planes.

    Returns ``(slices, sigma)``: ``slices[k]`` holds the k-th BITS-bit
    fixed-point slice of ``a / sigma`` (grid ``u_k = 2^(-BITS*(k+1))``),
    ``sigma`` the per-column f32 power-of-2 scales, with

        a / sigma = sum_k slices[k]  +  O(2^(-BITS*SLICES - 24-ish))

    Slicing arithmetic: the f64 value is split once into exact f32
    ``hi + lo`` planes (2 f64 ops per element — the only f64 arithmetic
    here); the first 3 slices are peeled from ``hi`` by the
    round-to-fixed-point-grid trick in f32 (exact Sterbenz subtractions),
    the remaining slices from ``hi_rest + lo`` (one f32 rounding at
    ~2^-46 relative to sigma — at the scheme's accuracy floor).
    """
    sigma, _ = _pow2_col_scale(a)
    inv = (1.0 / sigma).astype(jnp.float64)
    ab = a * inv[None, :]                     # exact (power-of-2 scaling)
    hi = ab.astype(jnp.float32)
    lo = (ab - hi.astype(jnp.float64)).astype(jnp.float32)

    out = []

    def peel(r, k):
        # round r to the grid u_k = 2^(-BITS*(k+1)): scale by the exact
        # power-of-2 inverse, round to integer, scale back — all exact in
        # f32.  (NOT the classic fl((r+c)-c) magic-constant trick: XLA's
        # algebraic simplifier cancels that to `r` when this function is
        # inlined into a jitted graph — measured as a silent 1e-3-level
        # accuracy collapse.)
        u = jnp.float32(2.0 ** (-BITS * (k + 1)))
        inv_u = jnp.float32(2.0 ** (BITS * (k + 1)))
        s = jnp.round(r * inv_u) * u
        return s, r - s                        # both exact in f32

    r = hi
    for k in range(3):
        s, r = peel(r, k)
        out.append(s)
    # merge the f32 tail of hi with lo EXACTLY (two-sum), deferring the
    # small part so the only rounding left is ~2^-52-level
    r, r_lo = _two_sum(r, lo)
    for k in range(3, SLICES):
        s, r = peel(r, k)
        if k == 4:
            r = r + r_lo          # |r| ~ 2^-28 here: rounding ~ 2^-52
        out.append(s)
    return jnp.stack([s.astype(jnp.bfloat16) for s in out]), sigma


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


@jax.jit
def os_gram_xla(a, b):
    """Reference XLA formulation of ``a^T @ b`` via exact-product slices.

    Chunk-batched einsums keep every accumulation exact; the cross-chunk
    combine runs compensated in f32 pairs and converts to f64 once.  On TPU
    prefer the Pallas kernel (this path's batched einsum is ~6x slower than
    an unchunked matmul of the same flops); off-TPU this is the accuracy
    oracle for tests.
    """
    n, p = a.shape
    q = b.shape[1]
    sa_sl, sa = slice_planes(a)
    sb_sl, sb = slice_planes(b)
    n_pad = -(-n // CHUNK) * CHUNK
    pad = ((0, 0), (0, n_pad - n), (0, 0))
    sa_sl = jnp.pad(sa_sl, pad).reshape(SLICES, n_pad // CHUNK, CHUNK, p)
    sb_sl = jnp.pad(sb_sl, pad).reshape(SLICES, n_pad // CHUNK, CHUNK, q)
    hi = jnp.zeros((p, q), jnp.float32)
    lo = jnp.zeros((p, q), jnp.float32)
    lo2 = jnp.zeros((p, q), jnp.float32)
    for i, j in _PAIRS:
        # slice values carry their grid scale (s_k = int * u_k exactly), so
        # chunk dots are exact f32 multiples of u_i*u_j — no rescaling
        cpq = jnp.einsum("ckp,ckq->cpq", sa_sl[i], sb_sl[j],
                         preferred_element_type=jnp.float32)

        # doubly-compensated cross-chunk accumulation: chunk values are
        # exact; hi's add errors go through a SECOND two-sum so even lo's
        # own rounding (the ~1e-11-relative noise of single compensation
        # over ~1e4 adds) is captured
        def body(c, st):
            hi, lo, lo2 = st
            hi, err = _two_sum(hi, cpq[c])
            lo, err2 = _two_sum(lo, err)
            return hi, lo, lo2 + err2
        hi, lo, lo2 = jax.lax.fori_loop(0, cpq.shape[0], body, (hi, lo, lo2))
    out = (hi.astype(jnp.float64) + lo.astype(jnp.float64)
           + lo2.astype(jnp.float64))
    return out * sa.astype(jnp.float64)[:, None] * sb.astype(jnp.float64)[None, :]


@jax.jit
def os_gram(a, b):
    """Production ``a^T @ b`` via exact-product slices — one fat einsum.

    Identical arithmetic to :func:`os_gram_xla`, but all 49 slice-pair
    chunk-products come from a SINGLE batched matmul over the concatenated
    slice planes ``(n, S*p) x (n, S*q)`` — fat enough for the MXU (the
    28 thin per-pair einsums of the reference path measure ~4 ms EACH on
    TPU; this shape amortizes).  The doubly-compensated cross-chunk reduce
    then consumes the 28 in-coverage pair blocks per chunk.
    """
    n, p = a.shape
    q = b.shape[1]
    sa_sl, sa = slice_planes(a)
    sb_sl, sb = slice_planes(b)
    # (S, n, p) -> (n, S*p) concatenation along columns (no transpose of n)
    a_cat = jnp.concatenate([sa_sl[k] for k in range(SLICES)], axis=1)
    b_cat = jnp.concatenate([sb_sl[k] for k in range(SLICES)], axis=1)
    n_pad = -(-n // CHUNK) * CHUNK
    a_cat = jnp.pad(a_cat, ((0, n_pad - n), (0, 0))) \
        .reshape(n_pad // CHUNK, CHUNK, SLICES * p)
    b_cat = jnp.pad(b_cat, ((0, n_pad - n), (0, 0))) \
        .reshape(n_pad // CHUNK, CHUNK, SLICES * q)
    slabs = jnp.einsum("ckp,ckq->cpq", a_cat, b_cat,
                       preferred_element_type=jnp.float32)  # (C, S*p, S*q)

    def body(c, st):
        hi, lo, lo2 = st
        slab = slabs[c]
        for i, j in _PAIRS:
            blk = jax.lax.slice(slab, (i * p, j * q),
                                ((i + 1) * p, (j + 1) * q))
            hi, err = _two_sum(hi, blk)
            lo, err2 = _two_sum(lo, err)
            lo2 = lo2 + err2
        return hi, lo, lo2

    z = jnp.zeros((p, q), jnp.float32)
    hi, lo, lo2 = jax.lax.fori_loop(0, slabs.shape[0], body, (z, z, z))
    out = (hi.astype(jnp.float64) + lo.astype(jnp.float64)
           + lo2.astype(jnp.float64))
    return out * sa.astype(jnp.float64)[:, None] * sb.astype(jnp.float64)[None, :]


@jax.jit
def os_expand(a, c):
    """Production ``a @ c`` (short contraction, k <= 1024): 7 bf16 dots.

    Each slice of ``a`` is contracted against the full concatenated slice
    planes of ``c`` in one MXU dot (the in-dot f32 accumulation over
    k <= 2^(24-2*BITS) exact products is exact); the 28 in-coverage pair
    blocks are then combined with compensation where it matters — blocks
    with i+j <= 4 (their magnitudes reach ``k * 2^(-BITS*(i+j+2))``, i.e.
    ~2^-7 of the result scale already at i+j=2); the i+j = 5,6 tail is
    <= k * 2^-49 * scale and a plain f32 tree keeps its rounding far below
    the scheme floor.
    """
    n, k = a.shape
    q = c.shape[1]
    assert k <= 1 << (24 - 2 * BITS), "contraction too long for os_expand"
    sa_sl, sa = slice_planes(a.T)              # (S, k, n); scales per row of a
    sc_sl, sc = slice_planes(c)                # (S, k, q); scales per col of c
    c_cat = jnp.concatenate([sc_sl[j] for j in range(SLICES)], axis=1)

    # dots[i] : (n, S*q), block j = pair (i, j)
    hi = jnp.zeros((n, q), jnp.float32)
    lo = jnp.zeros((n, q), jnp.float32)
    small = jnp.zeros((n, q), jnp.float32)
    for i in range(SLICES):
        di = jax.lax.dot(sa_sl[i].T, c_cat,
                         preferred_element_type=jnp.float32)
        for j in range(SLICES - i):
            blk = jax.lax.slice(di, (0, j * q), (n, (j + 1) * q))
            if i + j <= 4:
                hi, err = _two_sum(hi, blk)
                lo = lo + err
            else:
                small = small + blk
        del di
    lo = lo + small
    out = hi.astype(jnp.float64) + lo.astype(jnp.float64)
    return out * sa.astype(jnp.float64)[:, None] * sc.astype(jnp.float64)[None, :]


@jax.jit
def os_expand_xla(a, c):
    """``a @ c`` for SHORT contractions (k <= 512), exact-product slices.

    With k <= 2^(24 - 2*BITS) * ... = 1024-safe at 7-bit slices even a
    single unchunked f32 accumulation of the exact products is exact, so
    each of the 28 pair products is one plain bf16 matmul — MXU-shaped
    (tall output) with no batching.
    """
    k = a.shape[1]
    # sums of k exact 2*BITS-bit products stay exact while k*2^(2*BITS)
    # < 2^24
    assert k <= 1 << (24 - 2 * BITS), "contraction too long for os_expand"
    sa_sl, sa = slice_planes(a.T)              # scales per ROW of a
    sc_sl, sc = slice_planes(c)                # scales per COLUMN of c
    # contraction pairing: a[i, k] c[k, j] — scaled a rows x scaled c cols
    # means the contraction index k is UNSCALED only if sigma is per-(i, j):
    # slice_planes scaled per column of a.T = per row of a?  No: we need the
    # scaling on the NON-contracted index.  a.T has shape (k, n): columns of
    # a.T are rows of... columns of a.T index n — correct (non-contracted).
    hi = None
    lo = None
    for i, j in _PAIRS:
        # slice values carry their grid scale — the dot is exact as-is
        term = jax.lax.dot(
            sa_sl[i].T, sc_sl[j], preferred_element_type=jnp.float32)
        if hi is None:
            hi, lo = term, jnp.zeros_like(term)
        else:
            hi, err = _two_sum(hi, term)
            lo = lo + err
    out = hi.astype(jnp.float64) + lo.astype(jnp.float64)
    return out * sa.astype(jnp.float64)[:, None] * sc.astype(jnp.float64)[None, :]
