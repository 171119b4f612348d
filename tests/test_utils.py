"""CLI flag surface and checkpoint/resume tests."""

import numpy as np
import jax.numpy as jnp

from gcge_tpu.ops.operators import DenseOperator
from gcge_tpu.solvers.gcg import GCGParams, gcg_solve
from gcge_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from gcge_tpu.utils.cli import params_from_args, print_usage
from tests.conftest import laplacian_1d, laplacian_1d_eigs


def test_cli_flags_reference_namespace():
    argv = (
        "-nevConv 40 -nevMax 90 -blockSize 8 -gcge_max_niter 123 "
        "-gcge_abs_tol 1e-2 -gcge_rel_tol 1e-9 -gcge_min_gap 0.05 "
        "-gcge_compW_cg_max_iter 55 -gcge_compW_cg_rate 1e-3 "
        "-gcge_compW_cg_tol 1e-10 -gcge_compW_cg_tol_type rel "
        "-gcge_compW_cg_auto_shift 1 -gcge_compW_cg_shift -0.5 "
        "-gcge_initX_orth_method bgs -gcge_compW_orth_zero_tol 1e-11"
    ).split()
    p, extras = params_from_args(argv)
    assert (p.nev, p.nev_max, p.block_size) == (40, 90, 8)
    assert p.max_iter == 123
    assert (p.tol_abs, p.tol_rel, p.gap_min) == (1e-2, 1e-9, 0.05)
    assert (p.cg_max_iter, p.cg_rate, p.cg_tol, p.cg_tol_type) == (55, 1e-3, 1e-10, "rel")
    assert p.cg_auto_shift is True and p.cg_shift == -0.5
    assert p.orth_zero_tol == 1e-11
    assert extras["-gcge_initX_orth_method"] == "bgs"
    # usage text must render
    lines = []
    print_usage(lambda s="": lines.append(s))
    assert any("-gcge_rel_tol" in l for l in lines)


def test_checkpoint_resume(tmp_path):
    n, nev = 200, 6
    a, _ = laplacian_1d(n)
    op = DenseOperator(jnp.asarray(a))
    params = GCGParams(nev=nev, block_size=3, max_iter=60, verbose=0)
    res = gcg_solve(op, None, params)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, res, params)
    ev, evec, nev_conv, meta = load_checkpoint(path)
    assert nev_conv >= nev and meta["nev"] == nev
    # resume from checkpointed vectors: converges almost immediately
    res2 = gcg_solve(op, None, params, x0=evec[:, :nev])
    assert res2.nev_conv >= nev
    np.testing.assert_allclose(res2.eval[:nev], laplacian_1d_eigs(n)[:nev], rtol=1e-7)
    assert res2.num_iter <= res.num_iter


def test_mid_solve_checkpoint_and_resume(tmp_path):
    """Periodic checkpointing during the solve + warm-started resume."""
    import jax.numpy as jnp

    from gcge_tpu.ops.operators import make_operator
    from gcge_tpu.solvers.gcg import GCGParams, gcg_solve
    from gcge_tpu.utils.checkpoint import load_checkpoint
    from tests.conftest import laplacian_1d, laplacian_1d_eigs

    n = 400
    a, _ = laplacian_1d(n)
    rows, cols = np.nonzero(a)
    op = make_operator(rows, cols, a[rows, cols], a.shape)
    ck = str(tmp_path / "gcg_ck.npz")

    # run a few iterations only, checkpointing every 2
    p1 = GCGParams(nev=5, block_size=3, max_iter=6, verbose=0,
                   checkpoint_path=ck, checkpoint_every=2)
    gcg_solve(op, None, p1)
    ev, evec, nev_conv, meta = load_checkpoint(ck)
    assert evec.shape[0] == n and meta["nev"] == 5

    # resume from the checkpointed Ritz vectors: must converge quickly
    p2 = GCGParams(nev=5, block_size=3, max_iter=60, verbose=0)
    res = gcg_solve(op, None, p2, x0=evec[:, :5])
    assert res.nev_conv >= 5
    np.testing.assert_allclose(res.eval[:5], laplacian_1d_eigs(n)[:5],
                               rtol=1e-7)

    # fused path checkpoints per chunk
    p3 = GCGParams(nev=5, block_size=3, max_iter=6, verbose=0, fuse=3,
                   checkpoint_path=ck, checkpoint_every=1)
    gcg_solve(op, None, p3)
    ev2, _, _, _ = load_checkpoint(ck)
    assert np.isfinite(ev2).all()


def test_meminfo_snapshot_and_memwatch(capsys):
    """Memory observability (the memwatch analogue, SURVEY #20)."""
    import jax.numpy as jnp

    from gcge_tpu.utils.meminfo import MemWatch, snapshot, workspace_bytes

    s0 = snapshot()
    assert s0.live_array_bytes >= 0 and "live_arrays" in str(s0)
    est = workspace_bytes(n=10000, nev=50)
    assert est > 10000 * 50 * 8          # at least the basis itself
    with MemWatch("test-region"):
        x = jnp.ones((1000, 8))
        x.block_until_ready()
    out = capsys.readouterr().out
    assert "test-region" in out


def test_leaktracker_catches_a_leak_and_leak_check_passes_clean():
    """Leak tracking (memwatch parity, SURVEY #20): an array created inside
    the region and kept alive is reported with its shape group; a pure
    function passes leak_check."""
    import jax.numpy as jnp

    from gcge_tpu.utils.meminfo import LeakTracker, leak_check

    holder = []
    lt = LeakTracker().start()
    holder.append(jnp.ones((257, 3), jnp.float32) * 2.0)
    holder[-1].block_until_ready()
    rep = lt.stop()
    assert rep.new_arrays >= 1
    assert ((257, 3), "float32") in rep.groups
    assert "float32" in str(rep)

    def clean(x):
        return (x * 2.0 + 1.0).block_until_ready()

    rep2 = leak_check(clean, jnp.ones((64, 4)))
    assert rep2.new_bytes == 0

    def leaky(x):
        holder.append(jnp.zeros((129, 5)) + x[0, 0])
        holder[-1].block_until_ready()
        return x

    try:
        leak_check(leaky, jnp.ones((8, 8)))
    except AssertionError as e:
        assert "129" in str(e)
    else:
        raise AssertionError("leak_check missed a held buffer")


def test_gcg_solve_steady_state_does_not_leak():
    """The operational memwatch question: a steady-state gcg_solve call must
    not grow the live-buffer census (the reference's 'no unfreed blocks'
    report, test/memwatch.c)."""
    import numpy as np
    import scipy.sparse as sps

    from gcge_tpu.ops.operators import make_operator
    from gcge_tpu.solvers.gcg import GCGParams, gcg_solve
    from gcge_tpu.utils.meminfo import leak_check

    n = 400
    a = sps.diags([-np.ones(n - 1), 2.0 * np.ones(n), -np.ones(n - 1)],
                  [-1, 0, 1]).tocoo()
    op = make_operator(a.row, a.col, a.data, (n, n))
    params = GCGParams(nev=4, block_size=2, max_iter=8, verbose=0)

    def run():
        res = gcg_solve(op, None, params)
        np.asarray(res.eval)  # force materialization
        return None

    leak_check(run)
