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


@functools.partial(jax.jit, static_argnames=("offsets", "tn", "interpret"))
def _dia_spmm_t(values, offsets: tuple[int, ...], xt, tn: int, interpret: bool):
    """y_t = A @ x, transposed layout.

    values: (ndiag, n) diagonal storage, values[d, i] = A[i, i + offsets[d]]
    xt:     (m, n) transposed multivector
    returns (m, n)
    """
    ndiag, n = values.shape
    m = xt.shape[0]
    assert max(abs(o) for o in offsets) <= tn, "diagonal offset exceeds tile"
    sub = 8 if xt.dtype == jnp.float32 else 16
    m_pad = _round_up(max(m, sub), sub)
    n_pad = _round_up(n, tn)
    grid = n_pad // tn

    vals_p = jnp.zeros((ndiag, n_pad), values.dtype).at[:, :n].set(values)
    # x padded by one full tile of zeros on each lane end
    xt_p = jnp.zeros((m_pad, n_pad + 2 * tn), xt.dtype).at[:m, tn:tn + n].set(xt)

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


def dia_spmm_pallas_t(values, offsets: tuple[int, ...], xt,
                      tn: int = 4096, interpret: bool | None = None):
    """Transposed-layout entry: xt of shape (m, n) -> (m, n).

    Wide multivectors fall back to the XLA shift formulation: XLA places the
    kernel result in scoped VMEM when it can, and past ~12 MB that blows the
    16 MB scoped limit (observed at m=40, n=157k inside the fused GCG loop).
    The XLA path is ~1.5x slower but unconstrained."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, n = xt.shape
    sub = 8 if xt.dtype == jnp.float32 else 16
    m_pad = _round_up(max(m, sub), sub)
    if m_pad * n * xt.dtype.itemsize > 12 * 2**20:
        from gcge_tpu.ops.operators import DiaOperator

        return DiaOperator(values, offsets, n).matvec_t(xt)
    span = max(abs(o) for o in offsets)
    tn = max(tn, _round_up(span, 512) if span else 512)
    return _dia_spmm_t(values, tuple(offsets), xt, tn, interpret)
