"""Pallas TPU kernels for the exact-product sliced GEMM (``ops.osgemm``).

The XLA formulation of ``os_gram``/``os_expand`` materializes the bf16
slice planes (1.75x the f64 bytes), the padded chunk views, and — for the
Gram — the per-chunk (S*p, S*q) product slabs, then re-reads all of them:
~5-6x the minimal HBM traffic.  These kernels fuse the whole pipeline per
block while it is resident in VMEM:

  load f64-as-(hi, lo) f32 pair -> scale by the power-of-2 scales (exact)
  -> peel the 7 bf16 fixed-point slices (exact f32 VPU ops) -> MXU dots on
  the stacked slice planes -> doubly-compensated f32 accumulation across
  blocks (Gram) or compensated pair-block combination (expand), in VMEM.

Layout (learned the hard way — the first, natural-layout version measured
13x SLOWER than the XLA path): everything runs TRANSPOSED, with the long
axis n on the 128-wide lanes and the slice planes stacked along SUBLANES
at 16-aligned offsets, so

* every slice store/slice read in VMEM is tile-aligned (a lane-offset
  slice at a non-128 multiple forces a Mosaic relayout per touch);
* the Gram contraction runs over the LANE axis (``A B^T`` form) and the
  expand contraction is a plain ``(M, K) @ (K, N)`` — both native MXU
  shapes (the natural layout needed a sublane-contraction, i.e. an
  implicit transpose, per step).

The f64 <-> (hi, lo) split, the operand transposes, and the final
recombination run in XLA around the kernel (Mosaic has no f64, like the
df64 SpMM kernel in ``ops.spmm_pallas``).  Outputs are chunked so no
single pallas_call result exceeds ~12 MB — this runtime's XLA places
custom-call results in scoped VMEM when it can and hard-fails past 16 MB
(same workaround as the DIA kernels).

Arithmetic is IDENTICAL to ``ops.osgemm`` (same slices, same exactness
arguments, same compensation order), so ``os_gram_xla`` remains the
accuracy oracle; every in-chunk MXU accumulation of NR <= 1024 exact
14-bit products stays below 2^24 (exact in f32).

Reference being replaced: the BLAS ``dgemm``/``dsymm`` behind
``DenseMatQtAP``/``MultiVecLinearComb``
(``/root/reference/app/app_lapack.c:24-227,463-534``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcge_tpu.ops.spmm_pallas import _VMEM_LIMIT

from gcge_tpu.ops.osgemm import BITS, SLICES, _PAIRS


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# lanes (rows of the original operands) per grid step: the MXU accumulates
# NR exact (2*BITS)-bit products per output element; NR * 2^(2*BITS) < 2^24
# keeps the f32 accumulator exact.
_NR_MAX = 1 << (24 - 2 * BITS)          # 1024 at BITS=7


def _pow2_scale_1d(m):
    """Power-of-2 scales >= the true column maxima, from f32 hi-plane
    maxima (the hi plane underestimates |x| by at most 2^-24 relative; the
    (1 + 3e-7) inflation absorbs that before the ceil)."""
    e = jnp.ceil(jnp.log2(jnp.where(m > 0, m * jnp.float32(1 + 3e-7), 1.0)))
    e = jnp.clip(e, -100.0, 100.0)
    # exp2 must run in f64: the f32 lowering (exp(x*ln2)) returns 8192.004
    # for e=13 — not a power of two, which silently breaks every exactness
    # invariant of the scheme (measured as a 2e-9 accuracy collapse)
    return jnp.exp2(e.astype(jnp.float64)).astype(jnp.float32)


def _split_scaled_t(x64, axis_scale: int):
    """f64 (n, w) -> pow2 scales along ``axis_scale`` + exact (hi, lo) f32
    planes of the TRANSPOSED scaled array (w, n).

    Everything after the one elementwise hi/lo split runs in f32 — on
    emulated-f64 runtimes an f64 transpose moves 4x the bytes (measured as
    the entire 380 ms cost of the first version of these wrappers).
    Power-of-2 scaling commutes with the hi/lo rounding (``fl(x)*s =
    fl(x*s)`` for pow2 ``s``), so scaling the split planes equals
    splitting the scaled array."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    sigma = _pow2_scale_1d(jnp.max(jnp.abs(hi), axis=1 - axis_scale,
                                   keepdims=True))  # max over the other axis
    inv = 1.0 / sigma
    hi_t = (hi * inv).T
    lo_t = (lo * inv).T
    return sigma.reshape(-1), hi_t, lo_t


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _peel_stack(hi, lo, cat_ref, height: int):
    """Peel the SLICES bf16 fixed-point planes of ``hi + lo`` (shape
    (height, nr), rows = original columns) into ``cat_ref`` sublane bands
    ``[k*height, (k+1)*height)``.  ``height`` must be a multiple of 16 so
    every bf16 store is tile-aligned.  Same arithmetic as
    ``osgemm.slice_planes``: exact f32 round-to-grid peels, the lo plane
    merged by an exact two-sum."""
    r = hi
    for k in range(3):
        u = jnp.float32(2.0 ** (-BITS * (k + 1)))
        inv_u = jnp.float32(2.0 ** (BITS * (k + 1)))
        s = jnp.round(r * inv_u) * u
        r = r - s
        cat_ref[k * height:(k + 1) * height, :] = s.astype(jnp.bfloat16)
    r, r_lo = _two_sum(r, lo)
    for k in range(3, SLICES):
        u = jnp.float32(2.0 ** (-BITS * (k + 1)))
        inv_u = jnp.float32(2.0 ** (BITS * (k + 1)))
        s = jnp.round(r * inv_u) * u
        r = r - s
        if k == 4:
            r = r + r_lo
        cat_ref[k * height:(k + 1) * height, :] = s.astype(jnp.bfloat16)


# --------------------------------------------------------------------------
# os_gram: a^T b, both operands transposed to (p, n) / (q, n)
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("nr", "pb", "interpret"))
def _os_gram_kernel_call(ahi_t, alo_t, bhi_t, blo_t, nr: int, pb: int,
                         interpret: bool):
    """``a^T b`` from transposed (hi, lo) planes ``(p, n)`` / ``(q, n)``:
    returns a doubly-compensated (hi, lo, lo2) f32 triple of shape
    (p_pad, qp).

    The 28 in-coverage slice-pair blocks are combined INSIDE the kernel,
    per n-chunk, with a two-sum chain: each pair dot is an EXACT f32
    value (the NR_MAX bound), so the only rounding is the compensated
    combine itself (~2^-48 relative per chunk).  An earlier version
    accumulated the full (S*pb, S*qp) slab triple in scratch and returned
    it — that frame (3 slab scratches + slab-sized staged results) scales
    as S^2*pb*qp and blew the 16 MB scoped-VMEM stack at the nev=200
    W-orth Gram (p=512, q=48: 17.58 M measured)."""
    p, n = ahi_t.shape
    q = bhi_t.shape[0]
    qp = _round_up(q, 16)
    n_pad = _round_up(n, nr)
    pblocks = -(-p // pb)
    p_pad = pblocks * pb
    grid_c = n_pad // nr

    def pad2(x, h, w):
        return jnp.zeros((h, w), x.dtype).at[:x.shape[0], :x.shape[1]].set(x)

    ahi_p, alo_p = pad2(ahi_t, p_pad, n_pad), pad2(alo_t, p_pad, n_pad)
    bhi_p, blo_p = pad2(bhi_t, qp, n_pad), pad2(blo_t, qp, n_pad)

    sp, sq = SLICES * pb, SLICES * qp

    def kernel(ahi_ref, alo_ref, bhi_ref, blo_ref,
               ohi_ref, olo_ref, olo2_ref, acat_ref, bcat_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _init():
            ohi_ref[:] = jnp.zeros((pb, qp), jnp.float32)
            olo_ref[:] = jnp.zeros((pb, qp), jnp.float32)
            olo2_ref[:] = jnp.zeros((pb, qp), jnp.float32)

        _peel_stack(ahi_ref[:], alo_ref[:], acat_ref, pb)
        _peel_stack(bhi_ref[:], blo_ref[:], bcat_ref, qp)
        # contraction over the LANE axis: acat (S*pb, nr) x bcat (S*qp, nr)
        # -> (S*pb, S*qp), the MXU's "A B^T" form
        slab = jax.lax.dot_general(
            acat_ref[:], bcat_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # per-chunk pair combine: exact terms, compensated sum
        s_hi = jnp.zeros((pb, qp), jnp.float32)
        s_lo = jnp.zeros((pb, qp), jnp.float32)
        for i, j in _PAIRS:
            s_hi, e = _two_sum(s_hi,
                               slab[i * pb:(i + 1) * pb,
                                    j * qp:(j + 1) * qp])
            s_lo = s_lo + e
        # merge into the cross-chunk accumulator triple (held in the
        # output refs — their block index is constant in c, so they stay
        # VMEM-resident across the whole contraction)
        hi, e1 = _two_sum(ohi_ref[:], s_hi)
        lo, e2 = _two_sum(olo_ref[:], e1 + s_lo)
        ohi_ref[:] = hi
        olo_ref[:] = lo
        olo2_ref[:] = olo2_ref[:] + e2

    a_spec = pl.BlockSpec((pb, nr), lambda pi, c: (pi, c),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((qp, nr), lambda pi, c: (pi * 0, c),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((pb, qp), lambda pi, c: (pi, c * 0),
                          memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((p_pad, qp), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape, out_shape),
        grid=(pblocks, grid_c),
        in_specs=[a_spec, a_spec, b_spec, b_spec],
        out_specs=(o_spec, o_spec, o_spec),
        scratch_shapes=[pltpu.VMEM((sp, nr), jnp.bfloat16),
                        pltpu.VMEM((sq, nr), jnp.bfloat16)],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=2 * SLICES * SLICES * n_pad * p_pad * qp,
            bytes_accessed=8 * n_pad * (p_pad + qp * pblocks),
            transcendentals=0,
        ),
    )(ahi_p, alo_p, bhi_p, blo_p)


def os_gram_pallas(a, b, interpret: bool | None = None):
    """Fused-kernel ``a^T @ b`` ((n, p), (n, q) f64 -> (p, q) f64) via
    exact-product bf16 slices; drop-in for :func:`osgemm.os_gram`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _os_gram_pallas_jit(a, b, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _os_gram_pallas_jit(a, b, interpret: bool):
    # standalone callers must not pay one remote dispatch per prologue op
    # (~25 ms each on tunneled TPUs — measured 430 ms for the un-jitted
    # wrapper vs ~7 ms for the same math under jit)
    n, p = a.shape
    q = b.shape[1]
    sa, ahi_t, alo_t = _split_scaled_t(a, 1)   # per-column scales
    sb, bhi_t, blo_t = _split_scaled_t(b, 1)
    # block p inside the kernel grid; chunk WIDE q outside it (each q-chunk
    # re-reads the a planes; q is wide only in square within-block Grams,
    # where that doubles traffic at worst).  Explicit per-grid-step VMEM
    # model — the scoped-VMEM stack hard-fails at 16 MB and the failure
    # only appears at compile time on hardware, so stay conservative:
    #   bf16 cat scratch   2*S*(pb+qb)*nr
    #   f32 input blocks   16*(pb+qb)*nr   (2 operands, double-buffered)
    #   peel temporaries  ~12*(pb+qb)*nr
    #   slab + dot temp    2*4*S^2*pb*qb
    pb = _round_up(p, 16) if p <= 128 else 128
    qb = _round_up(q, 16) if q <= 64 else 64

    def vmem(pb_, qb_, nr_):
        return ((2 * SLICES + 28) * (pb_ + qb_) * nr_
                + 8 * SLICES * SLICES * pb_ * qb_)

    nr = _NR_MAX
    while nr > 256 and vmem(pb, qb, nr) > 11 * 2**20:
        nr //= 2
    while vmem(pb, qb, nr) > 11 * 2**20 and pb > 32:
        pb //= 2

    def gram_cols(bhi_c, blo_c):
        hi, lo, lo2 = _os_gram_kernel_call(ahi_t, alo_t, bhi_c, blo_c, nr,
                                           pb, interpret)
        # final combine of the compensated triple in f64 (3 adds of
        # ~2^-48-accurate terms — rounding far below the floor)
        out = (hi.astype(jnp.float64) + lo.astype(jnp.float64)
               + lo2.astype(jnp.float64))
        return out[:p]

    if q <= qb:
        out = gram_cols(bhi_t, blo_t)[:, :q]
    else:
        parts = [gram_cols(bhi_t[c0:c0 + qb], blo_t[c0:c0 + qb])
                 [:, :min(qb, q - c0)]
                 for c0 in range(0, q, qb)]
        out = jnp.concatenate(parts, axis=1)
    return out * sa.astype(jnp.float64)[:, None] * sb.astype(jnp.float64)[None, :]


# --------------------------------------------------------------------------
# os_expand: a @ c, computed transposed as (c^T)(a^T) with a^T = (k, n)
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("nr", "q", "interpret"))
def _os_expand_kernel_call(ahi_t, alo_t, ccat, nr: int, q: int,
                           interpret: bool):
    """Transposed expand: a^T planes (k, n), resident c slice stack
    ``ccat`` (S*qp, k).  Per lane block: peel a's slices (k, nr) one at a
    time, one MXU dot against the full c stack, pair blocks combined with
    compensation (i+j <= 4) / plain adds (tail) exactly as in
    ``osgemm.os_expand``.  Returns (hi, lo) f32 of shape (qp, n_pad)."""
    k, n = ahi_t.shape
    sqp = ccat.shape[0]
    qp = sqp // SLICES
    n_pad = _round_up(n, nr)

    def padn(x):
        return jnp.zeros((k, n_pad), x.dtype).at[:, :n].set(x)

    ahi_p, alo_p = padn(ahi_t), padn(alo_t)

    def kernel(ahi_ref, alo_ref, ccat_ref, ohi_ref, olo_ref):
        hi = jnp.zeros((qp, nr), jnp.float32)
        lo = jnp.zeros((qp, nr), jnp.float32)
        small = jnp.zeros((qp, nr), jnp.float32)
        r = ahi_ref[:]
        lo_in = alo_ref[:]
        r_lo = None
        for i in range(SLICES):
            u = jnp.float32(2.0 ** (-BITS * (i + 1)))
            inv_u = jnp.float32(2.0 ** (BITS * (i + 1)))
            s = jnp.round(r * inv_u) * u
            r = r - s
            if i == 2:
                r, r_lo = _two_sum(r, lo_in)
            if i == 4:
                r = r + r_lo
            # (S*qp, k) @ (k, nr) -> (S*qp, nr): block j = pair (i, j)
            di = jax.lax.dot_general(
                ccat_ref[:], s.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for j in range(SLICES - i):
                blk = di[j * qp:(j + 1) * qp, :]
                if i + j <= 4:
                    hi, err = _two_sum(hi, blk)
                    lo = lo + err
                else:
                    small = small + blk
        ohi_ref[:] = hi
        olo_ref[:] = lo + small

    a_spec = pl.BlockSpec((k, nr), lambda c: (c * 0, c),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((sqp, k), lambda c: (c * 0, c * 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((qp, nr), lambda c: (c * 0, c),
                          memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((qp, n_pad), jnp.float32)
    ohi, olo = pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape),
        grid=(n_pad // nr,),
        in_specs=[a_spec, a_spec, c_spec],
        out_specs=(o_spec, o_spec),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=2 * SLICES * SLICES * n_pad * k * qp,
            bytes_accessed=8 * n_pad * k + 8 * n_pad * qp,
            transcendentals=0,
        ),
    )(ahi_p, alo_p, ccat)
    return ohi, olo


def os_expand_pallas(a, c, interpret: bool | None = None):
    """Fused-kernel ``a @ c`` ((n, k) f64, k <= 1024, (k, q) f64 ->
    (n, q) f64); drop-in for :func:`osgemm.os_expand`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _os_expand_pallas_jit(a, c, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _os_expand_pallas_jit(a, c, interpret: bool):
    n, k = a.shape
    q = c.shape[1]
    assert k <= _NR_MAX, "contraction too long for os_expand"
    # per-ROW scales of a (the non-contracted index)
    sa_r, ahi_t, alo_t = _split_scaled_t(a, 0)
    # c is small: slice in XLA (osgemm.slice_planes)
    from gcge_tpu.ops.osgemm import slice_planes

    sc_sl, sc = slice_planes(c)                       # (S, k, q) bf16

    def expand_cols(j0, qc):
        """One q-chunk: stack c^T planes on qp-aligned sublane bands, run
        the lane-blocked kernel, return the (qc, n) f32 (hi, lo) pair."""
        qp = _round_up(qc, 16)
        ccat = jnp.zeros((SLICES * qp, k), jnp.bfloat16)
        for j in range(SLICES):
            ccat = ccat.at[j * qp:j * qp + qc, :].set(
                sc_sl[j, :, j0:j0 + qc].T)
        nr = _NR_MAX
        # per-step VMEM, conservative (the scoped stack hard-fails at
        # 16 MB, compile-time-only on hardware): double-buffered f32 in
        # blocks + peel temporaries ~28*k, the (S*qp, nr) dot result +
        # double-buffered outputs + accumulators ~56*qp, + resident ccat
        while nr > 256 and nr * (28 * k + 56 * qp) \
                + 2 * SLICES * qp * k > 8 * 2**20:
            nr //= 2
        # chunk lanes so no single kernel's (hi, lo) result exceeds ~6 MB
        # (this runtime's XLA stages custom-call results in scoped VMEM
        # when it can — the stage and the kernel frame share the budget)
        ncols = max((6 * 2**20 // (2 * 4 * qp)) // nr * nr, nr)
        outs = []
        for c0 in range(0, n, ncols):
            ohi, olo = _os_expand_kernel_call(
                ahi_t[:, c0:c0 + ncols], alo_t[:, c0:c0 + ncols], ccat, nr,
                qc, interpret)
            w = min(ncols, n - c0)
            outs.append((ohi[:qc, :w], olo[:qc, :w]))
        if len(outs) == 1:
            return outs[0]
        return (jnp.concatenate([o[0] for o in outs], axis=1),
                jnp.concatenate([o[1] for o in outs], axis=1))

    # chunk WIDE q: the (S*qp, nr) in-kernel dot result scales with qp and
    # blows scoped VMEM past qp ~ 150 (measured OOM at the nev=200 Ritz
    # recombination, q = 400)
    qchunk = 128
    parts = [expand_cols(j0, min(qchunk, q - j0))
             for j0 in range(0, q, qchunk)]
    hi = jnp.concatenate([p[0] for p in parts], axis=0) if len(parts) > 1 \
        else parts[0][0]
    lo = jnp.concatenate([p[1] for p in parts], axis=0) if len(parts) > 1 \
        else parts[0][1]
    # transpose the f32 planes BEFORE the f64 combine (an f64 transpose on
    # emulated-f64 runtimes moves 4x the bytes)
    out = hi.T.astype(jnp.float64) + lo.T.astype(jnp.float64)
    return out * sa_r.astype(jnp.float64)[:, None] * sc.astype(jnp.float64)[None, :]
