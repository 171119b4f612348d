"""Windowed one-hot MXU SpMM kernel (ops/onehot_pallas.py) — interpret-mode
correctness on irregular patterns (the SuiteSparse-class matrices the
reference benchmarks with, ``/root/reference/test/submit.sh:9-15``)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from gcge_tpu.ops.onehot_pallas import OneHotOperator, pack_onehot


def _random_banded(rng, n, k, band):
    idx = np.clip(np.arange(n)[:, None] + rng.integers(-band, band + 1,
                                                       (n, k)), 0, n - 1)
    rows = np.repeat(np.arange(n), k)
    cols = idx.reshape(-1)
    vals = rng.standard_normal(n * k)
    return rows, cols, vals


@pytest.mark.parametrize("n,k,band,cfg", [
    (1000, 7, 300, (256, 256, 128)),
    (700, 5, 650, (128, 256, 128)),     # band wider than the tile
    (513, 11, 80, (256, 512, 128)),     # n not a tile multiple
])
def test_onehot_matches_scipy(rng, n, k, band, cfg):
    rows, cols, vals = _random_banded(rng, n, k, band)
    rt, wt, jm = cfg
    op = OneHotOperator.from_coo(rows, cols, vals, (n, n), r_tile=rt,
                                 w_tile=wt, j_max=jm)
    a = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    x = rng.standard_normal((n, 6)).astype(np.float32)
    y = np.asarray(op.matvec(jnp.asarray(x)))
    y_ref = (a @ x.astype(np.float64)).astype(np.float32)
    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() < 3e-6 * scale
    # transposed entry agrees with the row-major one
    yt = np.asarray(op.matvec_t(jnp.asarray(x.T)))
    assert np.abs(yt.T - y).max() < 1e-6 * scale


def test_onehot_oversized_groups_split(rng):
    """A (tile, window) pair with more nonzeros than j_max must split into
    several pairs and still be exact."""
    n = 300
    # all nonzeros inside one 256x256 tile-window corner
    rows = rng.integers(0, 200, 1500)
    cols = rng.integers(0, 200, 1500)
    vals = rng.standard_normal(1500)
    op = OneHotOperator.from_coo(rows, cols, vals, (n, n), j_max=64)
    assert op.stats["pairs"] >= 1500 // 64
    a = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    x = rng.standard_normal((n, 3)).astype(np.float32)
    y = np.asarray(op.matvec(jnp.asarray(x)))
    y_ref = (a @ x.astype(np.float64)).astype(np.float32)
    assert np.abs(y - y_ref).max() < 3e-6 * np.abs(y_ref).max()


def test_pack_onehot_stats(rng):
    rows, cols, vals = _random_banded(rng, 2000, 9, 500)
    t, w, rl, cl, pv, pvlo, n_pad, stats = pack_onehot(rows, cols, vals, 2000)
    assert n_pad % 256 == 0
    assert (np.diff(t) >= 0).all()          # sorted by tile
    assert stats["fill"] == pytest.approx(
        len(vals) / (stats["pairs"] * rl.shape[1]))
    # hi + lo reconstructs the f64 values exactly
    assert (pv.astype(np.float64) + pvlo.astype(np.float64)).sum() \
        == pytest.approx(np.asarray(vals, np.float64).sum(), abs=1e-12)


@pytest.mark.parametrize("n,k,band,cfg", [
    (1000, 7, 300, (256, 256, 128)),
    (513, 11, 80, (256, 512, 128)),
])
def test_onehot_df64_accuracy(rng, n, k, band, cfg):
    """The df64 one-hot kernel must deliver ~f64 accuracy — orders below
    what any f32 pipeline can give — so residual checks at rel-tol 1e-8 can
    ride it (the whole point of the kernel)."""
    rows, cols, vals = _random_banded(rng, n, k, band)
    rt, wt, jm = cfg
    op = OneHotOperator.from_coo(rows, cols, vals, (n, n), r_tile=rt,
                                 w_tile=wt, j_max=jm)
    a = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    x = rng.standard_normal((n, 6))
    y = np.asarray(op.matvec_t_df64(jnp.asarray(x.T, jnp.float64)))
    y_ref = (a @ x).T
    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() < 1e-11 * scale


def test_ellonehot_f64_matvec_routes_df64(rng):
    """EllOneHotOperator.matvec on f64 must agree with scipy to f64 quality
    on every backend (df64 kernel on TPU, gather-ELL elsewhere)."""
    from gcge_tpu.ops.operators import EllOneHotOperator

    n = 600
    rows, cols, vals = _random_banded(rng, n, 5, 200)
    op = EllOneHotOperator.from_coo(rows, cols, vals, (n, n))
    a = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    x = rng.standard_normal((n, 4))
    y = np.asarray(op.matvec(jnp.asarray(x, jnp.float64)))
    y_ref = a @ x
    assert np.abs(y - y_ref).max() < 1e-11 * np.abs(y_ref).max()
    yt = np.asarray(op.matvec_t(jnp.asarray(x.T, jnp.float64)))
    assert np.abs(yt - y_ref.T).max() < 1e-11 * np.abs(y_ref).max()


def test_gcg_mixed_with_onehot_operator(rng):
    """End-to-end: cg_mixed routes the f32 CG stages through the one-hot
    kernel when the operator carries one-hot planes (irregular fast path),
    and still converges to the analytic spectrum."""
    from gcge_tpu.ops.operators import EllOneHotOperator
    from gcge_tpu.solvers.gcg import GCGParams, gcg_solve
    from tests.conftest import laplacian_1d, laplacian_1d_eigs

    n = 400
    a, _ = laplacian_1d(n)
    rows, cols = np.nonzero(a)
    op = EllOneHotOperator.from_coo(rows, cols, a[rows, cols], a.shape,
                                    r_tile=128, w_tile=128, j_max=128)
    p = GCGParams(nev=6, block_size=3, max_iter=80, verbose=0,
                  cg_mixed=True, cg_refine=2, cg_max_iter=30)
    res = gcg_solve(op, None, p)
    assert res.nev_conv >= 6
    np.testing.assert_allclose(res.eval[:6], laplacian_1d_eigs(n)[:6],
                               rtol=1e-7)


@pytest.mark.parametrize("group", [2, 4, 8])
def test_onehot_grouped_matches_ungrouped(rng, group):
    """group>1 (several pairs per grid step, regroup_pairs padding each
    tile's run) must agree with group=1 in both kernels."""
    n, k, band = 900, 6, 250
    rows, cols, vals = _random_banded(rng, n, k, band)
    kw = dict(r_tile=128, w_tile=128, j_max=128)
    op1 = OneHotOperator.from_coo(rows, cols, vals, (n, n), **kw)
    opg = OneHotOperator.from_coo(rows, cols, vals, (n, n), group=group, **kw)
    assert opg.stats["pairs_grouped"] % group == 0
    x = rng.standard_normal((5, n))
    y1 = np.asarray(op1.matvec_t(jnp.asarray(x, jnp.float32)))
    yg = np.asarray(opg.matvec_t(jnp.asarray(x, jnp.float32)))
    # f32 kernel: identical contractions, but the scatter accumulation order
    # differs (G pairs summed in one matmul) -> tiny f32 reassociation noise
    assert np.abs(y1 - yg).max() < 1e-5 * np.abs(y1).max()
    y1d = np.asarray(op1.matvec_t_df64(jnp.asarray(x)))
    ygd = np.asarray(opg.matvec_t_df64(jnp.asarray(x)))
    a = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    y_ref = (a @ x.T).T
    scale = np.abs(y_ref).max()
    assert np.abs(ygd - y_ref).max() < 1e-11 * scale
    assert np.abs(y1d - y_ref).max() < 1e-11 * scale


def test_onehot_handbuilt_unpadded_pairs(rng):
    """Hand-built pair sets with P % 8 != 0 go through the kernels'
    in-call pad8 branch: the scalar-prefetch t/w ids must be padded
    alongside the pair arrays (ADVICE r4 medium — unpadded ids read out
    of bounds and a garbage tile id can wipe a wrong output tile)."""
    n = 300
    # three (tile, window) combos at r_tile=w_tile=128 -> P=3 pairs
    rows = np.array([0, 5, 130, 135, 270, 271])
    cols = np.array([3, 10, 140, 150, 10, 12])
    vals = rng.standard_normal(6)
    t, w, rl, cl, pv, pvlo, n_pad, stats = pack_onehot(
        rows, cols, vals, n, 128, 128, 128)
    P = stats["pairs"]
    assert P % 8 != 0   # the config this test exists for
    op = OneHotOperator(jnp.asarray(t[:P]), jnp.asarray(w[:P]),
                        jnp.asarray(rl[:P]), jnp.asarray(cl[:P]),
                        jnp.asarray(pv[:P]), jnp.asarray(pvlo[:P]),
                        n, n_pad, 128, 128)
    a = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    x = rng.standard_normal((4, n))
    y = np.asarray(op.matvec_t(jnp.asarray(x, jnp.float32)))
    y_ref = (a @ x.T).T
    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() < 3e-6 * scale
    yd = np.asarray(op.matvec_t_df64(jnp.asarray(x)))
    assert np.abs(yd - y_ref).max() < 1e-11 * scale


def test_pack_onehot_sharded_empty_shard(rng):
    """A device whose row slice has no nonzeros must get a no-op dummy
    pack, not an IndexError (ADVICE r4 low); the stacked packs must still
    reproduce the full matvec."""
    from gcge_tpu.ops.onehot_pallas import pack_onehot_sharded

    n, ndev = 512, 4
    # nonzeros only in the first device's rows (plus a small band)
    rows = rng.integers(0, 120, 400)
    cols = np.clip(rows + rng.integers(-30, 31, 400), 0, n - 1)
    vals = rng.standard_normal(400)
    (t, w, rl, cl, pv, pvlo), (hl, hr, nw, n_pad, ln) = pack_onehot_sharded(
        rows, cols, vals, n, ndev, r_tile=128, w_tile=128)
    assert t.shape[0] == ndev and ln == n // ndev
    a = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    x = rng.standard_normal((3, n))
    y = np.zeros((3, n))
    for s in range(ndev):
        op = OneHotOperator(jnp.asarray(t[s]), jnp.asarray(w[s]),
                            jnp.asarray(rl[s]), jnp.asarray(cl[s]),
                            jnp.asarray(pv[s]), jnp.asarray(pvlo[s]),
                            nw, n_pad, 128, 128)
        lo, hi = s * ln - hl, (s + 1) * ln + hr
        xw = np.zeros((3, nw))
        src_lo, src_hi = max(lo, 0), min(hi, n)
        xw[:, src_lo - lo:src_lo - lo + (src_hi - src_lo)] = \
            x[:, src_lo:src_hi]
        yl = np.asarray(op.matvec_t(jnp.asarray(xw, jnp.float32)))
        y[:, s * ln:(s + 1) * ln] = yl[:, hl:hl + ln]
    y_ref = (a @ x.T).T
    scale = max(np.abs(y_ref).max(), 1.0)
    assert np.abs(y - y_ref).max() < 3e-6 * scale
