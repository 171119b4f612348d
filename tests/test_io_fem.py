"""FEM assembly, loaders and DIA operator tests.

Covers the reference's FEM problem generator (``test/get_mat_phg.c``) and
matrix-format converters (``test/mat_convert.c``) equivalents: the cube
Laplacian/mass pair, MatrixMarket + PETSc-binary round trips, and the DIA
fast-path operator.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg
import scipy.sparse as sps

from gcge_tpu.io.fem import cube_exact_eigenvalues, cube_fem_laplacian, cube_mesh
from gcge_tpu.io.loaders import (
    load_matrix_market,
    load_petsc_binary,
    save_petsc_binary,
)
from gcge_tpu.ops.operators import DiaOperator, SparseOperator, make_operator
from gcge_tpu.solvers.gcg import GCGParams, gcg_solve


def test_cube_mesh_matches_cube4_sizes():
    """nx=4 must reproduce the reference mesh sizes: 125 vertices, 384 tets
    (``data/cube4.dat``)."""
    verts, tets = cube_mesh(4)
    assert verts.shape == (125, 3)
    assert tets.shape == (384, 4)
    # all tets positively sized, total volume = 1
    p = verts[tets]
    vol = np.abs(np.linalg.det(p[:, 1:] - p[:, :1])) / 6.0
    np.testing.assert_allclose(vol.sum(), 1.0, rtol=1e-12)


def test_cube_fem_spd_and_spectrum():
    rows, cols, a_vals, b_vals, n = cube_fem_laplacian(4)
    assert n == 27  # 3^3 interior vertices
    A = sps.coo_matrix((a_vals, (rows, cols)), shape=(n, n)).toarray()
    B = sps.coo_matrix((b_vals, (rows, cols)), shape=(n, n)).toarray()
    np.testing.assert_allclose(A, A.T, atol=1e-12)
    np.testing.assert_allclose(B, B.T, atol=1e-12)
    assert (np.linalg.eigvalsh(B) > 0).all()
    lam = scipy.linalg.eigh(A, B, eigvals_only=True)
    assert (lam > 0).all()
    # coarse mesh (h=1/4): P1 eigenvalues overshoot by O(h^2 lambda) ~ 27%
    exact = cube_exact_eigenvalues(3)
    assert lam[0] > exact[0]  # Dirichlet P1 converges from above
    assert abs(lam[0] - exact[0]) / exact[0] < 0.35


def test_gcg_on_cube_fem():
    """End-to-end: GCG on the FEM pair matches scipy's dense generalized
    solve — the cube4/PHG test configuration (SURVEY.md config 2)."""
    nx, nev = 6, 8
    rows, cols, a_vals, b_vals, n = cube_fem_laplacian(nx)
    A = sps.coo_matrix((a_vals, (rows, cols)), shape=(n, n)).toarray()
    B = sps.coo_matrix((b_vals, (rows, cols)), shape=(n, n)).toarray()
    exact = scipy.linalg.eigh(A, B, eigvals_only=True)

    a_op = SparseOperator.from_coo(rows, cols, a_vals, (n, n))
    b_op = SparseOperator.from_coo(rows, cols, b_vals, (n, n))
    params = GCGParams(nev=nev, block_size=4, max_iter=80, verbose=0)
    res = gcg_solve(a_op, b_op, params)
    assert res.nev_conv >= nev
    np.testing.assert_allclose(res.eval[:nev], exact[:nev], rtol=1e-7)


def test_dia_operator_matches_ell(rng):
    from tests.conftest import laplacian_1d

    a, _ = laplacian_1d(200)
    rows, cols = np.nonzero(a)
    vals = a[rows, cols]
    dia = DiaOperator.from_coo(rows, cols, vals, a.shape)
    ell = SparseOperator.from_coo(rows, cols, vals, a.shape)
    assert dia.offsets == (-1, 0, 1)
    x = jnp.asarray(rng.standard_normal((200, 5)))
    np.testing.assert_allclose(
        np.asarray(dia.matvec(x)), np.asarray(ell.matvec(x)), rtol=1e-13
    )


def test_make_operator_selection(rng):
    # tridiagonal -> DIA
    from tests.conftest import laplacian_1d

    a, _ = laplacian_1d(64)
    rows, cols = np.nonzero(a)
    op = make_operator(rows, cols, a[rows, cols], a.shape)
    assert isinstance(op, DiaOperator)
    # random sparse -> ELL
    n = 256
    rr = rng.integers(0, n, 4000)
    cc = rng.integers(0, n, 4000)
    op = make_operator(rr, cc, np.ones(4000), (n, n))
    assert isinstance(op, SparseOperator)


def test_fem_dia_gcg():
    """Structured FEM matrices live on few diagonals -> DIA path end-to-end."""
    nx, nev = 6, 6
    rows, cols, a_vals, b_vals, n = cube_fem_laplacian(nx)
    a_op = make_operator(rows, cols, a_vals, (n, n))
    b_op = make_operator(rows, cols, b_vals, (n, n))
    assert isinstance(a_op, DiaOperator)
    A = sps.coo_matrix((a_vals, (rows, cols)), shape=(n, n)).toarray()
    B = sps.coo_matrix((b_vals, (rows, cols)), shape=(n, n)).toarray()
    exact = scipy.linalg.eigh(A, B, eigvals_only=True)
    res = gcg_solve(a_op, b_op, GCGParams(nev=nev, block_size=3, max_iter=80, verbose=0))
    assert res.nev_conv >= nev
    np.testing.assert_allclose(res.eval[:nev], exact[:nev], rtol=1e-7)


def test_petsc_binary_roundtrip(tmp_path):
    rows, cols, a_vals, _, n = cube_fem_laplacian(4)
    path = str(tmp_path / "a.petsc")
    save_petsc_binary(path, rows, cols, a_vals, (n, n))
    r2, c2, v2, shape = load_petsc_binary(path)
    assert shape == (n, n)
    m1 = sps.coo_matrix((a_vals, (rows, cols)), shape=(n, n)).toarray()
    m2 = sps.coo_matrix((v2, (r2, c2)), shape=shape).toarray()
    np.testing.assert_allclose(m2, m1, rtol=1e-14)


def test_matrix_market_symmetric(tmp_path):
    path = tmp_path / "t.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "% comment\n"
        "3 3 4\n"
        "1 1 2.0\n"
        "2 1 -1.0\n"
        "2 2 2.0\n"
        "3 3 1.5\n"
    )
    rows, cols, vals, shape = load_matrix_market(str(path))
    m = sps.coo_matrix((vals, (rows, cols)), shape=shape).toarray()
    expect = np.array([[2.0, -1.0, 0], [-1.0, 2.0, 0], [0, 0, 1.5]])
    np.testing.assert_allclose(m, expect)


def test_albert_reader_and_general_assembly(tmp_path):
    """Round-trip: write an ALBERT file from our structured cube mesh, read
    it back, assemble with the general-path assembler, and match the direct
    structured assembly (same spectrum)."""
    import numpy as np
    from gcge_tpu.io.fem import (
        assemble_p1, cube_fem_laplacian, cube_mesh, load_albert_mesh,
    )

    nx = 3
    verts, tets = cube_mesh(nx)
    # boundary faces: a face (3 verts) lies on the cube boundary if all its
    # vertices do; encode per element, face i opposite vertex i
    on_bnd = np.any((verts <= 0.0) | (verts >= 1.0 - 1e-12), axis=1)
    bnd_codes = np.zeros((len(tets), 4), np.int64)
    for face in range(4):
        others = [v for v in range(4) if v != face]
        bnd_codes[:, face] = np.all(on_bnd[tets[:, others]], axis=1)
    p = tmp_path / "cube.dat"
    with open(p, "w") as f:
        f.write("DIM: 3\nDIM_OF_WORLD: 3\n")
        f.write(f"number of vertices: {len(verts)}\n")
        f.write(f"number of elements: {len(tets)}\n\n")
        f.write("vertex coordinates:\n")
        for v in verts:
            f.write(" %.17g %.17g %.17g\n" % tuple(v))
        f.write("element vertices:\n")
        for t in tets:
            f.write(" %d %d %d %d\n" % tuple(t))
        f.write("element boundaries:\n")
        for b in bnd_codes:
            f.write(" %d %d %d %d\n" % tuple(b))
    v2, t2, mask = load_albert_mesh(str(p))
    np.testing.assert_allclose(v2, verts)
    np.testing.assert_array_equal(t2, tets)
    np.testing.assert_array_equal(mask, on_bnd)
    r1, c1, a1, b1, n1 = assemble_p1(v2, t2, mask)
    r0, c0, a0, b0, n0 = cube_fem_laplacian(nx)
    assert n1 == n0
    d1 = np.zeros((n1, n1)); np.add.at(d1, (r1, c1), a1)
    d0 = np.zeros((n0, n0)); np.add.at(d0, (r0, c0), a0)
    np.testing.assert_allclose(d1, d0, atol=1e-12)
