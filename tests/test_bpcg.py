"""Block PCG tests — re-make of ``test/test_lin_sol.c:20-114`` with asserts:
solve against a known solution, and exercise the per-column masking by
re-randomizing a subset of columns (the reference re-randomizes 2 of 4)."""

import jax.numpy as jnp
import numpy as np

from gcge_tpu.ops.operators import DenseOperator, ShiftedOperator, SparseOperator
from gcge_tpu.solvers.bpcg import BlockPCGParams, block_pcg, pcg
from tests.conftest import laplacian_1d


def test_pcg_known_solution(rng):
    a, _ = laplacian_1d(80)
    op = DenseOperator(jnp.asarray(a))
    x_true = rng.standard_normal(80)
    b = jnp.asarray(a @ x_true)
    x, info = pcg(op.matvec, b, jnp.zeros(80), max_iter=200, rate=0.0, tol=1e-12)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-7, atol=1e-8)


def test_block_pcg_known_solution(rng):
    a, _ = laplacian_1d(100)
    op = DenseOperator(jnp.asarray(a))
    x_true = rng.standard_normal((100, 4))
    b = jnp.asarray(a @ x_true)
    params = BlockPCGParams(max_iter=300, rate=0.0, tol=1e-12, tol_type="rel")
    x, info = block_pcg(op.matvec, b, jnp.zeros((100, 4)), params)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-7, atol=1e-9)
    assert int(info.niters) < 300


def test_block_pcg_rate_stopping(rng):
    """rate=1e-2 must stop early with residual reduced by >= 1e-2 per col."""
    a, _ = laplacian_1d(100)
    op = DenseOperator(jnp.asarray(a))
    b = jnp.asarray(rng.standard_normal((100, 3)))
    params = BlockPCGParams(max_iter=200, rate=1e-2, tol=1e-30)
    x, info = block_pcg(op.matvec, b, jnp.zeros((100, 3)), params)
    ratio = np.asarray(info.final_res) / np.asarray(info.init_res)
    assert (ratio <= 1e-2 + 1e-12).all()


def test_block_pcg_active_mask(rng):
    """Frozen columns must come back bit-identical to their initial guess."""
    a, _ = laplacian_1d(60)
    op = DenseOperator(jnp.asarray(a))
    b = jnp.asarray(rng.standard_normal((60, 4)))
    x0 = jnp.asarray(rng.standard_normal((60, 4)))
    active = jnp.asarray([True, False, True, False])
    params = BlockPCGParams(max_iter=100, rate=0.0, tol=1e-10, tol_type="rel")
    x, info = block_pcg(op.matvec, b, x0, params, active0=active)
    xn, x0n = np.asarray(x), np.asarray(x0)
    np.testing.assert_array_equal(xn[:, 1], x0n[:, 1])
    np.testing.assert_array_equal(xn[:, 3], x0n[:, 3])
    # active columns actually solved
    r = np.asarray(b)[:, 0] - a @ xn[:, 0]
    assert np.linalg.norm(r) < 1e-8 * np.linalg.norm(np.asarray(b)[:, 0]) + 1e-9


def test_block_pcg_shifted_operator(rng):
    """The GCG inner solve shape: (A + sigma*B) w = rhs via ShiftedOperator."""
    a, _ = laplacian_1d(70)
    bdiag = np.full(70, 0.5)
    op = ShiftedOperator(
        DenseOperator(jnp.asarray(a)),
        DenseOperator(jnp.asarray(np.diag(bdiag))),
        2.0,
    )
    dense = a + 2.0 * np.diag(bdiag)
    x_true = rng.standard_normal((70, 2))
    b = jnp.asarray(dense @ x_true)
    params = BlockPCGParams(max_iter=300, rate=0.0, tol=1e-12, tol_type="rel")
    x, _ = block_pcg(op.matvec, b, jnp.zeros((70, 2)), params)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-7, atol=1e-9)


def test_block_pcg_sparse_operator(rng):
    a, _ = laplacian_1d(120)
    rows, cols = np.nonzero(a)
    sp = SparseOperator.from_coo(rows, cols, a[rows, cols], a.shape)
    x_true = rng.standard_normal((120, 3))
    b = jnp.asarray(a @ x_true)
    params = BlockPCGParams(max_iter=400, rate=0.0, tol=1e-12, tol_type="rel")
    x, _ = block_pcg(sp.matvec, b, jnp.zeros((120, 3)), params)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-8)


def test_block_pcg_preconditioned(rng):
    """Jacobi-preconditioned BPCG converges faster on an ill-conditioned
    diagonal-dominant system (reference flag=2 mode: external solver as
    preconditioner, ops_eig_sol_gcg.c:584-618)."""
    import jax.numpy as jnp
    from gcge_tpu.solvers.bpcg import BlockPCGParams, block_pcg

    n, m = 400, 3
    d = jnp.asarray(10.0 ** rng.uniform(0, 4, n))   # cond ~ 1e4
    off = jnp.asarray(rng.standard_normal(n - 1) * 0.01)
    a = jnp.diag(d) + jnp.diag(off, 1) + jnp.diag(off, -1)
    x_true = jnp.asarray(rng.standard_normal((n, m)))
    b = a @ x_true
    params = BlockPCGParams(max_iter=150, rate=0.0, tol=1e-10, tol_type="rel")
    x0 = jnp.zeros((n, m))
    _, info_plain = block_pcg(lambda x: a @ x, b, x0, params)
    dinv = 1.0 / d
    x_pc, info_pc = block_pcg(lambda x: a @ x, b, x0, params,
                              precond=lambda r: dinv[:, None] * r)
    assert int(info_pc.niters) < int(info_plain.niters) / 2
    err = jnp.abs(x_pc - x_true).max() / jnp.abs(x_true).max()
    assert float(err) < 1e-5


def test_gcg_with_preconditioner(rng):
    """GCG with a Jacobi linear_precond still converges to the right pairs."""
    import jax.numpy as jnp
    import numpy as np
    from gcge_tpu.ops.operators import SparseOperator
    from gcge_tpu.solvers.gcg import GCGParams, gcg_solve
    from tests.conftest import laplacian_1d, laplacian_1d_eigs

    n = 400
    a, h = laplacian_1d(n)
    rows, cols = np.nonzero(a)
    op = SparseOperator.from_coo(rows, cols, a[rows, cols], a.shape)
    dinv = jnp.full((n,), h / 2.0)  # inverse diagonal of A
    p = GCGParams(nev=5, block_size=3, max_iter=100, verbose=0,
                  linear_precond=lambda r: dinv[:, None] * r)
    res = gcg_solve(op, None, p)
    assert res.nev_conv >= 5
    np.testing.assert_allclose(res.eval[:5], laplacian_1d_eigs(n)[:5],
                               rtol=1e-7)


def test_block_pcg_t_preconditioned(rng):
    """Transposed-layout CG composes with a preconditioner (parity with
    block_pcg — required so the mixed-precision inner solve can be
    AMG-preconditioned, reference flag=2 semantics)."""
    from gcge_tpu.solvers.bpcg import block_pcg_t

    n, m = 400, 3
    d = jnp.asarray(10.0 ** rng.uniform(0, 4, n))
    off = jnp.asarray(rng.standard_normal(n - 1) * 0.01)
    a = jnp.diag(d) + jnp.diag(off, 1) + jnp.diag(off, -1)
    x_true = jnp.asarray(rng.standard_normal((m, n)))
    bt = x_true @ a.T                       # (m, n) rows are columns
    params = BlockPCGParams(max_iter=150, rate=0.0, tol=1e-10, tol_type="rel")
    x0 = jnp.zeros((m, n))
    mv_t = lambda xt: xt @ a.T
    _, info_plain = block_pcg_t(mv_t, bt, x0, params)
    dinv = 1.0 / d
    x_pc, info_pc = block_pcg_t(mv_t, bt, x0, params,
                                precond=lambda rt: rt * dinv[None, :])
    assert int(info_pc.niters) < int(info_plain.niters) / 2
    err = jnp.abs(x_pc - x_true).max() / jnp.abs(x_true).max()
    assert float(err) < 1e-5


def test_block_pcg_t_user_norm(rng):
    """tol_type='user' + norm_b parity for the transposed layout
    (``ops_lin_sol.c:186-192``)."""
    from gcge_tpu.solvers.bpcg import block_pcg_t

    a, _ = laplacian_1d(100)
    aj = jnp.asarray(a)
    x_true = rng.standard_normal((3, 100))
    bt = jnp.asarray(x_true @ a.T)
    # huge user norms make tol*nb exceed the initial residual -> no iterations
    big = jnp.full((3,), 1e30)
    params = BlockPCGParams(max_iter=50, rate=0.0, tol=1e-10, tol_type="user")
    x, info = block_pcg_t(lambda xt: xt @ aj.T, bt, jnp.zeros((3, 100)),
                          params, norm_b=big)
    assert int(info.niters) == 0
    # realistic user norms behave like 'rel'
    nb = jnp.sqrt(jnp.sum(bt * bt, axis=1))
    x, info = block_pcg_t(lambda xt: xt @ aj.T, bt, jnp.zeros((3, 100)),
                          BlockPCGParams(max_iter=300, rate=0.0, tol=1e-10,
                                         tol_type="user"), norm_b=nb)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-8)
