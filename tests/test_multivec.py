"""Conformance tests for the block multivector ops.

The asserting re-make of the reference's golden-eye ``TestMultiVec``
(``/root/reference/test/test_multi_vec.c:19-228``): inner products in
'D'/'S'/'N' modes, axpby, linear_comb with per-column beta, qtap.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gcge_tpu.ops.multivec import axpby, block_inner, linear_comb, qtap
from gcge_tpu.ops.operators import (
    DenseOperator,
    DiagOperator,
    IdentityOperator,
    ShiftedOperator,
    SparseOperator,
)


@pytest.fixture
def xy(rng):
    x = jnp.asarray(rng.standard_normal((50, 6)))
    y = jnp.asarray(rng.standard_normal((50, 4)))
    return x, y


def test_block_inner_modes(xy):
    x, y = xy
    g = block_inner(x, y, "N")
    np.testing.assert_allclose(np.asarray(g), np.asarray(x).T @ np.asarray(y), rtol=1e-13)

    d = block_inner(x, x, "D")
    np.testing.assert_allclose(np.asarray(d), (np.asarray(x) ** 2).sum(0), rtol=1e-13)

    s = block_inner(x, x, "S")
    np.testing.assert_allclose(np.asarray(s), np.asarray(s).T, rtol=0, atol=0)


def test_axpby(xy):
    x, _ = xy
    y = 2.0 * x + 1.0
    r = axpby(3.0, x, -1.0, y)
    np.testing.assert_allclose(np.asarray(r), 3 * np.asarray(x) - np.asarray(y), rtol=1e-13)
    # per-column alpha/beta
    alpha = jnp.arange(1.0, 7.0)
    r = axpby(alpha, x, 0.0, y)
    np.testing.assert_allclose(np.asarray(r), np.asarray(x) * np.arange(1.0, 7.0), rtol=1e-13)
    # x=None pure scale
    r = axpby(0.0, None, 0.5, y)
    np.testing.assert_allclose(np.asarray(r), 0.5 * np.asarray(y), rtol=1e-13)


def test_linear_comb(xy, rng):
    x, y = xy
    coef = jnp.asarray(rng.standard_normal((6, 4)))
    beta = jnp.arange(1.0, 5.0)
    r = linear_comb(x, coef, y, beta)
    expect = np.asarray(x) @ np.asarray(coef) + np.asarray(y) * np.arange(1.0, 5.0)
    np.testing.assert_allclose(np.asarray(r), expect, rtol=1e-12)
    # scale-only path (used for lambda*Bx)
    r = linear_comb(None, None, y, beta)
    np.testing.assert_allclose(np.asarray(r), np.asarray(y) * np.arange(1.0, 5.0), rtol=1e-13)


def test_qtap_modes(rng):
    n = 40
    a = rng.standard_normal((n, n))
    a = a + a.T
    q = jnp.asarray(rng.standard_normal((n, 5)))
    p = jnp.asarray(rng.standard_normal((n, 3)))
    op = DenseOperator(jnp.asarray(a))
    g = qtap(q, op.matvec, p, "N")
    np.testing.assert_allclose(np.asarray(g), np.asarray(q).T @ a @ np.asarray(p), rtol=1e-12)
    # A = None -> pure block inner product
    g = qtap(q, None, p, "N")
    np.testing.assert_allclose(np.asarray(g), np.asarray(q).T @ np.asarray(p), rtol=1e-12)


def test_operators_consistency(rng):
    n = 30
    dense = rng.standard_normal((n, n))
    dense = dense + dense.T + n * np.eye(n)
    x = jnp.asarray(rng.standard_normal((n, 4)))

    a_dense = DenseOperator(jnp.asarray(dense))
    rows, cols = np.nonzero(dense)
    a_sparse = SparseOperator.from_coo(rows, cols, dense[rows, cols], (n, n))
    np.testing.assert_allclose(
        np.asarray(a_sparse.matvec(x)), np.asarray(a_dense.matvec(x)), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(a_sparse.to_dense()), dense, rtol=1e-13)

    d = DiagOperator(jnp.asarray(np.diag(dense)))
    np.testing.assert_allclose(
        np.asarray(d.matvec(x)), np.diag(dense)[:, None] * np.asarray(x), rtol=1e-13
    )

    ident = IdentityOperator(n)
    np.testing.assert_allclose(np.asarray(ident.matvec(x)), np.asarray(x))

    b = DiagOperator(jnp.asarray(np.full(n, 2.0)))
    shifted = ShiftedOperator(a_dense, b, 0.5)
    np.testing.assert_allclose(
        np.asarray(shifted.matvec(x)),
        dense @ np.asarray(x) + 0.5 * 2.0 * np.asarray(x),
        rtol=1e-12,
    )
    shifted_i = ShiftedOperator(a_dense, None, 0.5)
    np.testing.assert_allclose(
        np.asarray(shifted_i.matvec(x)), dense @ np.asarray(x) + 0.5 * np.asarray(x), rtol=1e-12
    )


def test_sparse_truly_sparse(rng):
    """ELL packing of an actually sparse matrix (1D Laplacian)."""
    from tests.conftest import laplacian_1d

    a, _ = laplacian_1d(100)
    rows, cols = np.nonzero(a)
    sp = SparseOperator.from_coo(rows, cols, a[rows, cols], a.shape)
    assert sp.values.shape[1] == 3  # tridiagonal -> kmax == 3
    x = jnp.asarray(rng.standard_normal((100, 7)))
    np.testing.assert_allclose(np.asarray(sp.matvec(x)), a @ np.asarray(x), rtol=1e-12)
