"""Pallas TPU kernel: DIA-format SpMM (sparse matrix x multivector).

Design (see /opt/skills/guides/pallas_guide.md):

* Mosaic has no in-kernel gather, so the classic CSR/ELL gather-SpMM cannot be
  a Pallas kernel.  The gather-free formulation is DIA: for each stored
  diagonal ``d`` with static offset ``off_d``, ``y[i] += vals[d, i] *
  x[i + off_d]`` — a lane *shift* plus an FMA.
* Layout: the multivector is processed **transposed** ``(m, n)`` so the row
  index lives on the 128-wide lane dimension.  Shifting rows = shifting lanes
  by a static offset, which the VPU does natively; the m block columns sit on
  sublanes (padded to 8).  A row-major ``(n, m)`` tile with m ~ 10 would waste
  >10x HBM bandwidth on lane padding.
* Grid over lane tiles of TN rows.  Each tile needs the x window
  ``[i*TN - TN, i*TN + 2*TN)``; x is zero-padded by TN lanes on both ends and
  passed through THREE BlockSpecs (blocks i, i+1, i+2 of the padded array),
  giving the overlapping window without dynamic indexing.  The three pieces
  are assembled into one VMEM scratch; each diagonal is then a static slice
  ``scratch[:, TN+off : 2*TN+off]``.
* Per-nnz HBM traffic ~ (m_pad + ndiag + 2*m_pad/ndiag...) * 4 / ndiag bytes —
  bandwidth-bound at a few Gnnz/s per 100 GB/s; orders of magnitude above a
  gather SpMM on this hardware.

Reference being replaced: the CCS scalar SpMM loop / MKL path
(``/root/reference/app/app_ccs.c:50-139``) — but re-designed for a machine
with no scatter/gather units.  f64 falls back to the XLA shift formulation in
:class:`gcge_tpu.ops.operators.DiaOperator` (XLA emulates f64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# XLA:TPU may place a pallas call's whole operand/result buffers on the
# scoped-VMEM stack (program-context dependent: the same shapes compile
# standalone and fail inside a fused loop, or vice versa), and the DEFAULT
# scoped limit is 16 MB — far below the v5e's 128 MB of physical VMEM.
# Medium-n shapes whose padded in+out frames land in the 16..40 MB window
# then fail to compile ("Ran out of memory in memory space vmem ...
# allocating on stack"; observed at n=46656, 64-row chunks — the nev=400
# production case).  Raising the per-kernel limit makes the whole window
# compile (verified bit-exact vs the XLA path); 72 MB covers the largest
# frame the row-chunk guards below allow (~38 MB for df64) with 2x margin
# while staying well under physical VMEM.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=72 * 2**20)

# Result-plane budget for the row-chunk guard below.  Round-1 used a
# conservative 12 MB; with the 72 MB scoped-VMEM limit above, larger result
# frames compile fine, and avoiding a row-chunk avoids RE-READING the value
# planes per chunk (measured: the bs=10 df64 case ran 2 chunks and sat at
# ~29 Gnnz/s, ~2x off its own traffic model).  Overridable for A/B sweeps.
_RESULT_BUDGET = 28 * 2**20


@functools.partial(jax.jit,
                   static_argnames=("offsets", "tn", "interpret", "hl"))
def _dia_spmm_t(values, offsets: tuple[int, ...], xt, tn: int, interpret: bool,
                hl: int = 0):
    """y_t = A @ x, transposed layout.

    values: (ndiag, n) diagonal storage, values[d, i] = A[i, i + offsets[d]]
    xt:     (m, n + hl + hr) transposed multivector; ``hl``/``hr`` extra
            lanes are HALO data so that ``y[i] = sum_d values[d, i] *
            xt[:, hl + i + off_d]`` — the local window of a row-sharded
            matvec (``hr`` is implied by the shapes).  ``hl = 0`` with
            ``xt`` of width n is the plain square matvec (out-of-range
            reads hit the kernel's zero padding).
    returns (m, n)
    """
    ndiag, n = values.shape
    m, nw = xt.shape
    assert max(abs(o) for o in offsets) <= tn, "diagonal offset exceeds tile"
    assert 0 <= hl <= tn and 0 <= nw - n - hl <= tn, "halo exceeds tile"
    sub = 8 if xt.dtype == jnp.float32 else 16
    m_pad = _round_up(max(m, sub), sub)
    n_pad = _round_up(n, tn)
    grid = n_pad // tn

    vals_p = jnp.zeros((ndiag, n_pad), values.dtype).at[:, :n].set(values)
    # x padded by one tile of zeros on each lane end; halo lanes land in the
    # padding region so diagonal slices read real neighbor data there
    xt_p = jnp.zeros((m_pad, n_pad + 2 * tn), xt.dtype) \
        .at[:m, tn - hl:tn - hl + nw].set(xt)

    def kernel(x0_ref, x1_ref, x2_ref, vals_ref, out_ref, win_ref):
        win_ref[:, :tn] = x0_ref[:]
        win_ref[:, tn:2 * tn] = x1_ref[:]
        win_ref[:, 2 * tn:] = x2_ref[:]
        acc = jnp.zeros((m_pad, tn), jnp.float32)
        for d, off in enumerate(offsets):
            xs = win_ref[:, tn + off: 2 * tn + off]
            acc = acc + vals_ref[d:d + 1, :].astype(jnp.float32) * xs.astype(jnp.float32)
        out_ref[:] = acc.astype(out_ref.dtype)

    # index maps must return one consistent integer type: with x64 enabled a
    # python literal 0 traces as i64 while program ids are i32, and Mosaic
    # rejects the mixed-type return — derive the zero from i instead.
    x_spec = lambda k: pl.BlockSpec(
        (m_pad, tn), lambda i, k=k: (i * 0, i + k), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), xt.dtype),
        grid=(grid,),
        in_specs=[
            x_spec(0),
            x_spec(1),
            x_spec(2),
            pl.BlockSpec((ndiag, tn), lambda i: (i * 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, tn), lambda i: (i * 0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m_pad, 3 * tn), xt.dtype)],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * n_pad * m_pad,
            bytes_accessed=(ndiag * n_pad + 2 * m_pad * n_pad) * xt.dtype.itemsize,
            transcendentals=0,
        ),
    )(xt_p, xt_p, xt_p, vals_p)
    return out[:m, :n]


def dia_spmm_pallas(values, offsets: tuple[int, ...], x,
                    tn: int = 4096, interpret: bool | None = None):
    """Row-major wrapper: ``y = A @ x`` with x of shape (n, m).

    Transposes in/out around the transposed-layout kernel; callers holding
    multivectors in (m, n) layout (e.g. a transposed CG loop) should use
    :func:`dia_spmm_pallas_t` directly and skip both transposes.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    span = max(abs(o) for o in offsets)
    tn = max(tn, _round_up(span, 512) if span else 512)
    yt = _dia_spmm_t(values, tuple(offsets), x.T, tn, interpret)
    return yt.T


# --------------------------------------------------------------------------
# double-f32 (df64) DIA kernel — the f64 fast path.
#
# TPUs have no f64 hardware; XLA emulates it, and the emulated-f64 XLA shift
# formulation runs the SpMM at ~15 Gnnz/s vs ~55 for the f32 Pallas kernel
# (PERFORMANCE.md).  Mosaic cannot take f64 operands at all, so the Pallas
# f64 path represents every number as an UNEVALUATED SUM of two f32s
# (hi + lo, "double-f32": 48-bit effective mantissa) and carries the rounding
# errors explicitly with error-free transformations:
#
#   * Dekker two-product (split each factor at 12 bits; partial products are
#     then EXACT in f32) for vals * x,
#   * Knuth branch-free two-sum for the accumulation.
#
# HBM traffic is identical to the true-f64 path (8 B per value as hi+lo f32
# pairs), so the kernel inherits the f32 kernel's bandwidth efficiency at
# ~20 VPU flops per FMA — still far under the VPU roof at the bandwidth
# limit.  Accuracy: |result - exact| ~ 2^-48 per product plus the value
# representation error 2^-48*|A| — measured ~1e-14 relative, well below the
# 1e-8 residual targets (and the same error class XLA's own emulation has).
# This replaces the reference's f64 BLAS/MKL SpMM (app_ccs.c:58-131) at
# full f64 quality without leaving the TPU-native kernel path.
# --------------------------------------------------------------------------


def split_df32(x64):
    """Split an f64 array into an unevaluated f32 (hi, lo) pair."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _two_sum(a, b):
    """Knuth branch-free two-sum: a + b = s + err exactly (f32)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _two_prod(a, b):
    """Dekker two-product: a * b = p + err exactly (f32, split at 12 bits)."""
    p = a * b
    c = jnp.float32(4097.0) * a          # 2^12 + 1
    a_hi = c - (c - a)
    a_lo = a - a_hi
    c = jnp.float32(4097.0) * b
    b_hi = c - (c - b)
    b_lo = b - b_hi
    err = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, err


@functools.partial(jax.jit,
                   static_argnames=("offsets", "tn", "interpret", "hl", "n",
                                    "hoist"))
def _dia_spmm_t_df64(vhi, vlo, offsets: tuple[int, ...], xhi, xlo,
                     tn: int, interpret: bool, hl: int = 0,
                     n: int | None = None, hoist: bool = False):
    """df64 transposed DIA SpMM: returns (y_hi, y_lo) f32 with
    ``y_hi + y_lo ~ (A @ x)^T`` to ~2^-48 relative.  ``hl`` as in
    :func:`_dia_spmm_t`: x may carry halo lanes on both ends.  ``n`` is the
    logical row count when the value planes arrive PRE-PADDED to the tile
    grid (``DiaDF64Operator`` caches padded planes at construction: the
    per-call pad is a full copy of the values — measured 0.64 -> 0.52 ms
    per matvec at the bench shapes once removed)."""
    ndiag = vhi.shape[0]
    if n is None:
        n = vhi.shape[1]
    m, nw = xhi.shape
    assert max(abs(o) for o in offsets) <= tn, "diagonal offset exceeds tile"
    assert 0 <= hl <= tn and 0 <= nw - n - hl <= tn, "halo exceeds tile"
    m_pad = _round_up(max(m, 8), 8)
    n_pad = _round_up(n, tn)
    grid = n_pad // tn

    def padv(v):
        if v.shape[1] == n_pad:
            return v                     # pre-padded at operator build
        return jnp.zeros((ndiag, n_pad), v.dtype).at[:, :n].set(v[:, :n])

    def padx(x):
        return jnp.zeros((m_pad, n_pad + 2 * tn), x.dtype) \
            .at[:m, tn - hl:tn - hl + nw].set(x)

    vhi_p, vlo_p = padv(vhi), padv(vlo)
    xhi_p, xlo_p = padx(xhi), padx(xlo)

    def kernel(xh0, xh1, xh2, xl0, xl1, xl2, vh_ref, vl_ref,
               ohi_ref, olo_ref, wh_ref, wl_ref, *hoist_refs):
        wh_ref[:, :tn] = xh0[:]
        wh_ref[:, tn:2 * tn] = xh1[:]
        wh_ref[:, 2 * tn:] = xh2[:]
        wl_ref[:, :tn] = xl0[:]
        wl_ref[:, tn:2 * tn] = xl1[:]
        wl_ref[:, 2 * tn:] = xl2[:]
        if hoist:
            # Dekker-split the x window ONCE per tile instead of once per
            # diagonal inside _two_prod: the split is elementwise, so
            # slicing the split planes at each diagonal offset is exact.
            # Saves ~4 of the ~26 VPU ops/nnz (the x-operand split); the
            # per-diagonal v split stays — v rows are (1, tn) broadcasts,
            # already ~1/m_pad of the cost.
            wsh_ref, wsl_ref = hoist_refs
            c = jnp.float32(4097.0) * wh_ref[:]
            a_hi = c - (c - wh_ref[:])
            wsh_ref[:] = a_hi
            wsl_ref[:] = wh_ref[:] - a_hi
        acc_hi = jnp.zeros((m_pad, tn), jnp.float32)
        acc_lo = jnp.zeros((m_pad, tn), jnp.float32)
        for d, off in enumerate(offsets):
            vh = vh_ref[d:d + 1, :]
            vl = vl_ref[d:d + 1, :]
            xh = wh_ref[:, tn + off: 2 * tn + off]
            xl = wl_ref[:, tn + off: 2 * tn + off]
            if hoist:
                p = vh * xh
                c = jnp.float32(4097.0) * vh
                vh_hi = c - (c - vh)
                vh_lo = vh - vh_hi
                xh_hi = wsh_ref[:, tn + off: 2 * tn + off]
                xh_lo = wsl_ref[:, tn + off: 2 * tn + off]
                e = ((vh_hi * xh_hi - p) + vh_hi * xh_lo + vh_lo * xh_hi) \
                    + vh_lo * xh_lo
            else:
                p, e = _two_prod(vh, xh)
            e = e + vh * xl + vl * xh
            acc_hi, err = _two_sum(acc_hi, p)
            acc_lo = acc_lo + (err + e)
        # renormalize so |lo| <= ulp(hi)
        s = acc_hi + acc_lo
        olo_ref[:] = acc_lo - (s - acc_hi)
        ohi_ref[:] = s

    x_spec = lambda k: pl.BlockSpec(
        (m_pad, tn), lambda i, k=k: (i * 0, i + k), memory_space=pltpu.VMEM
    )
    v_spec = pl.BlockSpec((ndiag, tn), lambda i: (i * 0, i),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((m_pad, tn), lambda i: (i * 0, i),
                          memory_space=pltpu.VMEM)
    ohi, olo = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32)),
        grid=(grid,),
        in_specs=[x_spec(0), x_spec(1), x_spec(2),
                  x_spec(0), x_spec(1), x_spec(2),
                  v_spec, v_spec],
        out_specs=(o_spec, o_spec),
        scratch_shapes=[pltpu.VMEM((m_pad, 3 * tn), jnp.float32)] * 2
        + ([pltpu.VMEM((m_pad, 3 * tn), jnp.float32)] * 2 if hoist else []),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=40 * ndiag * n_pad * m_pad,
            bytes_accessed=(2 * ndiag * n_pad + 6 * m_pad * n_pad) * 4,
            transcendentals=0,
        ),
    )(xhi_p, xhi_p, xhi_p, xlo_p, xlo_p, xlo_p, vhi_p, vlo_p)
    return ohi[:m, :n], olo[:m, :n]


def _window_matvec_t(v64, offsets: tuple[int, ...], xw_t, hl: int):
    """XLA windowed shift-FMA: ``y[:, i] = sum_d v64[d, i] * xw_t[:, hl + i
    + off_d]`` — the halo-aware fallback (boundary data comes from the halo
    lanes of ``xw_t``, not from zero padding)."""
    n = v64.shape[1]
    y = jnp.zeros((xw_t.shape[0], n), xw_t.dtype)
    for d, off in enumerate(offsets):
        xs = jax.lax.slice_in_dim(xw_t, hl + off, hl + off + n, axis=1)
        y = y + v64[d][None, :] * xs
    return y


def dia_spmm_pallas_t_df64(vhi, vlo, offsets: tuple[int, ...], xt,
                           tn: int = 4096, interpret: bool | None = None,
                           halo: tuple[int, int] = (0, 0),
                           hoist: bool | None = None):
    """f64 transposed-layout DIA SpMM through the df64 Pallas kernel.

    ``vhi/vlo`` are the pre-split f32 value planes (:func:`split_df32` —
    split ONCE at operator construction; splitting per call would double the
    value traffic).  ``xt`` is f64 ``(m, n + sum(halo))``; the x split
    happens per call (x changes every call).  Returns f64 ``(m, n)``.
    ``halo=(hl, hr)`` marks leading/trailing lanes of ``xt`` as neighbor
    halo data (row-sharded matvec windows); the result row ``i`` then reads
    ``xt[:, hl + i + off]``.  Falls back to the XLA shift path for results
    past the scoped-VMEM guard, like :func:`dia_spmm_pallas_t`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hl, hr = halo
    m, nw = xt.shape
    n = nw - hl - hr
    # scoped-VMEM guard: the two f32 result planes must fit ~12 MB.  Wider
    # multivectors are column-chunked (each chunk re-reads the values — still
    # a clear win over the XLA path for up to a few chunks); beyond that the
    # value re-reads eat the advantage and the XLA shift path takes over.
    # The row count is ALSO capped at 96 sublanes: at small n the byte
    # budget admits 200+ rows, and the unrolled per-diagonal kernel body
    # then blows the 128 MB scoped-VMEM ceiling on register-allocator spill
    # slots (observed: m_pad=264, n=13.8k -> 177 MB of spills, compile
    # error).  Production shapes sit at <= 40 rows and are unaffected.
    max_rows = max(min((_RESULT_BUDGET // (2 * 4 * n)) // 8 * 8, 96), 0)
    if max_rows < 8 or -(-m // max_rows) > 4:
        from gcge_tpu.ops.operators import DiaOperator

        v64 = (vhi.astype(jnp.float64) + vlo.astype(jnp.float64))[:, :n]
        if hl or hr:
            return _window_matvec_t(v64, tuple(offsets), xt, hl)
        return DiaOperator(v64, offsets, n).matvec_t(xt)
    span = max(abs(o) for o in offsets)
    tn = max(tn, _round_up(max(span, hl, hr), 512) if span else 512)

    if hoist is None:
        import os
        hoist = os.environ.get("GCGE_DIA_DF64_HOIST", "0") == "1"

    def run(xc):
        hi, lo = split_df32(xc)
        yhi, ylo = _dia_spmm_t_df64(vhi, vlo, tuple(offsets), hi, lo,
                                    tn, interpret, hl, n, hoist)
        return yhi.astype(jnp.float64) + ylo.astype(jnp.float64)

    if m <= max_rows:
        return run(xt)
    parts = [run(xt[i:i + max_rows]) for i in range(0, m, max_rows)]
    return jnp.concatenate(parts, axis=0)


def dia_spmm_pallas_t(values, offsets: tuple[int, ...], xt,
                      tn: int = 4096, interpret: bool | None = None,
                      halo: tuple[int, int] = (0, 0)):
    """Transposed-layout entry: xt of shape (m, n + sum(halo)) -> (m, n).

    ``halo`` as in :func:`dia_spmm_pallas_t_df64`.  The kernel result must
    fit ~12 MB of scoped VMEM (XLA places it there
    when it can; past that the 16 MB scoped limit blows — observed at m=40,
    n=157k inside the fused GCG loop).  Wider multivectors are column-chunked
    over up to 4 kernel calls (each re-reads the values); beyond that the
    XLA shift formulation (~1.5x slower, unconstrained) takes over."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hl, hr = halo
    m, nw = xt.shape
    n = nw - hl - hr
    sub = 8 if xt.dtype == jnp.float32 else 16
    # same 128-sublane-class spill cap as the df64 path (96 rows)
    max_rows = max(min(
        (_RESULT_BUDGET // (xt.dtype.itemsize * n)) // sub * sub, 96), 0)
    if max_rows < sub or -(-m // max_rows) > 4:
        from gcge_tpu.ops.operators import DiaOperator

        if hl or hr:
            return _window_matvec_t(values, tuple(offsets), xt, hl)
        return DiaOperator(values, offsets, n).matvec_t(xt)
    span = max(abs(o) for o in offsets)
    tn = max(tn, _round_up(max(span, hl, hr), 512) if span else 512)
    if m <= max_rows:
        return _dia_spmm_t(values, tuple(offsets), xt, tn, interpret, hl)
    parts = [_dia_spmm_t(values, tuple(offsets), xt[i:i + max_rows], tn,
                         interpret, hl) for i in range(0, m, max_rows)]
    return jnp.concatenate(parts, axis=0)
