"""Native matrix toolkit tests (C++ matpack via ctypes)."""

import numpy as np
import pytest
import scipy.sparse as sps

from gcge_tpu.io.fem import cube_fem_laplacian
from gcge_tpu.io.native import (
    apply_permutation,
    available,
    load_matrix_market_native,
    rcm_permutation,
    structure_stats,
)


def test_native_builds():
    assert available(), "libmatpack.so must build with the repo g++"


def test_native_mm_reader_matches_python(tmp_path):
    from gcge_tpu.io.loaders import load_matrix_market

    path = tmp_path / "t.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "% c\n"
        "4 4 5\n"
        "1 1 2.0\n2 1 -1.5\n2 2 2.0\n4 3 0.25\n4 4 1.0\n"
    )
    r1, c1, v1, s1 = load_matrix_market(str(path))
    r2, c2, v2, s2 = load_matrix_market_native(str(path))
    assert s1 == s2
    m1 = sps.coo_matrix((v1, (r1, c1)), shape=s1).toarray()
    m2 = sps.coo_matrix((v2, (r2, c2)), shape=s2).toarray()
    np.testing.assert_allclose(m2, m1)


def test_rcm_reduces_bandwidth(rng):
    """Random permutation of a banded matrix; RCM must recover a small band."""
    n = 300
    diags = [np.full(n, 4.0), np.full(n - 1, -1.0), np.full(n - 3, -0.5)]
    a = sps.diags(diags, [0, 1, 3], shape=(n, n))
    a = (a + a.T).tocoo()
    p = rng.permutation(n)
    rows, cols = p[a.row], p[a.col]
    before = structure_stats(rows, cols, n)["bandwidth"]
    perm = rcm_permutation(rows, cols, n)
    r2, c2, v2 = apply_permutation(rows, cols, a.data, perm)
    after = structure_stats(r2, c2, n)["bandwidth"]
    assert before > 50  # scrambled
    assert after <= 8   # RCM recovers (near-)optimal band of 3
    # permutation is a similarity transform: spectrum preserved
    m1 = sps.coo_matrix((a.data, (rows, cols)), shape=(n, n)).toarray()
    m2 = sps.coo_matrix((v2, (r2, c2)), shape=(n, n)).toarray()
    np.testing.assert_allclose(
        np.linalg.eigvalsh(m2), np.linalg.eigvalsh(m1), atol=1e-10
    )


def test_rcm_enables_dia_fast_path():
    """FEM matrix scrambled -> huge diagonal count; RCM + DIA recovers the
    gather-free layout."""
    rows, cols, a_vals, _, n = cube_fem_laplacian(6)
    rng = np.random.default_rng(0)
    p = rng.permutation(n)
    rs, cs = p[rows], p[cols]
    perm = rcm_permutation(rs, cs, n)
    r2, c2, v2 = apply_permutation(rs, cs, a_vals, perm)
    s_before = structure_stats(rs, cs, n)
    s_after = structure_stats(r2, c2, n)
    assert s_after["bandwidth"] < s_before["bandwidth"] / 2


def test_structure_stats(rng):
    from tests.conftest import laplacian_1d

    a, _ = laplacian_1d(50)
    rows, cols = np.nonzero(a)
    st = structure_stats(rows, cols, 50)
    assert st == {"bandwidth": 1, "n_diagonals": 3, "ell_width": 3}
