"""Pallas DIA SpMM kernel vs the XLA DiaOperator reference (interpret mode on
CPU; the same kernel compiles with Mosaic on real TPU — exercised by bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcge_tpu.ops.operators import DiaOperator
from gcge_tpu.ops.spmm_pallas import dia_spmm_pallas, dia_spmm_pallas_t
from tests.conftest import laplacian_1d


def _close(a, b):
    """f32 comparison scaled by the result magnitude."""
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.abs(b).max(), 1.0)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=2e-6 * scale)


def _dia_problem(n, rng):
    a, _ = laplacian_1d(n)
    rows, cols = np.nonzero(a)
    return DiaOperator.from_coo(rows, cols, a[rows, cols], a.shape, dtype=jnp.float32)


def test_dia_pallas_matches_xla(rng):
    n, m = 1000, 10
    dia = _dia_problem(n, rng)
    x = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    y_ref = dia.matvec(x)
    y = dia_spmm_pallas(dia.values, dia.offsets, x, tn=512, interpret=True)
    _close(y, y_ref)


def test_dia_pallas_transposed_entry(rng):
    n, m = 700, 6
    dia = _dia_problem(n, rng)
    x = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    yt = dia_spmm_pallas_t(dia.values, dia.offsets, x.T, tn=512, interpret=True)
    _close(yt.T, dia.matvec(x))


def test_dia_pallas_halo_window(rng):
    """Halo entry: result row i reads xw[:, hl + i + off] — the local window
    of a row-sharded matvec (boundary data from neighbors, not zero pad)."""
    from gcge_tpu.ops.spmm_pallas import (dia_spmm_pallas_t_df64, split_df32)

    n, m, hl, hr = 300, 4, 7, 5
    offs = (-7, -1, 0, 2, 5)
    vals = rng.standard_normal((len(offs), n))
    xw = rng.standard_normal((m, n + hl + hr))
    y_ref = np.zeros((m, n))
    for d, off in enumerate(offs):
        y_ref += vals[d][None, :] * xw[:, hl + off:hl + off + n]

    yt = dia_spmm_pallas_t(
        jnp.asarray(vals, jnp.float32), offs,
        jnp.asarray(xw, jnp.float32), tn=512, interpret=True, halo=(hl, hr))
    _close(yt, y_ref)

    hi, lo = split_df32(jnp.asarray(vals))
    yt64 = dia_spmm_pallas_t_df64(
        hi, lo, offs, jnp.asarray(xw), tn=512, interpret=True, halo=(hl, hr))
    # df64 carries ~2^-48 per product; cancellation in the random sums puts
    # the worst relative error ~1e-11
    np.testing.assert_allclose(np.asarray(yt64), y_ref, rtol=1e-9, atol=1e-12)


def test_dia_pallas_large_offsets(rng):
    """Offsets larger than the default alignment (3D-stencil-like)."""
    n, m, k = 3000, 4, 700
    rows = np.concatenate([np.arange(n), np.arange(n - k), np.arange(k, n)])
    cols = np.concatenate([np.arange(n), np.arange(k, n), np.arange(n - k)])
    vals = np.concatenate([np.full(n, 4.0), np.full(n - k, -1.0), np.full(n - k, -1.0)])
    dia = DiaOperator.from_coo(rows, cols, vals, (n, n), dtype=jnp.float32)
    assert dia.offsets == (-k, 0, k)
    x = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    y = dia_spmm_pallas(dia.values, dia.offsets, x, tn=1024, interpret=True)
    _close(y, dia.matvec(x))
