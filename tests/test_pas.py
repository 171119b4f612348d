"""PAS multilevel eigensolver + composite operator tests
(re-make of ``test/test_eig_sol_pas.c`` and ``test_app_pas_*.c``)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg
import scipy.sparse as sps

from gcge_tpu.ops.operators import DenseOperator
from gcge_tpu.solvers.multigrid import build_hierarchy
from gcge_tpu.solvers.pas import AugmentedOperator, pas_solve
from tests.conftest import laplacian_1d, laplacian_1d_eigs


def test_augmented_operator_matches_dense_composite(rng):
    """AugmentedOperator action == the explicit PASMAT [XX XQ; QX QQ]."""
    n, k, m = 60, 4, 3
    a = rng.standard_normal((n, n))
    a = a + a.T
    xp = rng.standard_normal((n, k))
    op = AugmentedOperator(DenseOperator(jnp.asarray(a)), jnp.asarray(xp))
    pasmat = np.block([[xp.T @ a @ xp, xp.T @ a], [a @ xp, a]])
    s = rng.standard_normal((n + k, m))
    np.testing.assert_allclose(
        np.asarray(op.matvec(jnp.asarray(s))), pasmat @ s, rtol=1e-11, atol=1e-11
    )
    # to_fine collapses the redundant representation
    np.testing.assert_allclose(
        np.asarray(op.to_fine(jnp.asarray(s))), xp @ s[:k] + s[k:], rtol=1e-13
    )


def test_pas_standard_laplacian():
    n, nev = 512, 6
    a, _ = laplacian_1d(n)
    rows, cols = np.nonzero(a)
    hier = build_hierarchy(rows, cols, a[rows, cols], n, max_levels=3)
    res = pas_solve(hier, nev, verbose=0, final_sweeps=12, bamg_cycles=8, tol_rel=1e-6)
    exact = laplacian_1d_eigs(n)
    assert res.nev_conv >= nev
    np.testing.assert_allclose(res.eval[:nev], exact[:nev], rtol=1e-8)


def test_pas_generalized_fem():
    """PAS on the cube FEM pair with coarsened mass matrices."""
    from gcge_tpu.io.fem import cube_fem_laplacian

    nx, nev = 6, 4
    rows, cols, a_vals, b_vals, n = cube_fem_laplacian(nx)
    hier = build_hierarchy(rows, cols, a_vals, n, b_vals=b_vals, max_levels=2)
    res = pas_solve(hier, nev, verbose=0, final_sweeps=8, tol_rel=1e-6)
    A = sps.coo_matrix((a_vals, (rows, cols)), shape=(n, n)).toarray()
    B = sps.coo_matrix((b_vals, (rows, cols)), shape=(n, n)).toarray()
    exact = scipy.linalg.eigh(A, B, eigvals_only=True)
    np.testing.assert_allclose(res.eval[:nev], exact[:nev], rtol=1e-6)


def test_pas_fused_matches_phasewise():
    """The one-dispatch fused sweep loop and the host-looped path agree."""
    n, nev = 400, 4
    a, _ = laplacian_1d(n)
    rows, cols = np.nonzero(a)
    hier = build_hierarchy(rows, cols, a[rows, cols], n, max_levels=3)
    kw = dict(verbose=0, final_sweeps=10, bamg_cycles=6, tol_rel=1e-7)
    rf = pas_solve(hier, nev, fuse=True, **kw)
    rp = pas_solve(hier, nev, fuse=False, **kw)
    assert rf.nev_conv >= nev and rp.nev_conv >= nev
    np.testing.assert_allclose(rf.eval, rp.eval, rtol=1e-9)
    np.testing.assert_allclose(rf.eval, laplacian_1d_eigs(n)[:nev], rtol=1e-6)


def test_pas_composite_rr_matches_explicit():
    """composite_rr=True routes every per-level RR through the stacked
    AugmentedOperator (the reference's PASMAT dataflow,
    ops_eig_sol_pas.c:183-219) and must converge to the same spectrum as
    the explicit-span path."""
    n, nev = 400, 6
    a, _ = laplacian_1d(n)
    rows, cols = np.nonzero(a)
    hier = build_hierarchy(rows, cols, a[rows, cols], n, max_levels=3)
    rc = pas_solve(hier, nev, verbose=0, final_sweeps=12, bamg_cycles=6,
                   tol_rel=1e-7, composite_rr=True)
    assert rc.nev_conv >= nev
    np.testing.assert_allclose(rc.eval, laplacian_1d_eigs(n)[:nev],
                               rtol=1e-6)
    re = pas_solve(hier, nev, verbose=0, final_sweeps=12, bamg_cycles=6,
                   tol_rel=1e-7)
    np.testing.assert_allclose(rc.eval, re.eval, rtol=1e-8)
