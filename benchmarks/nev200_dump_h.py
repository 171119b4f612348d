"""Spy on the phase-wise nev=200 run's RR calls: fetch outputs and compare
against a host LAPACK eigensolve of the same (reassembled) projected matrix.
Used to localize the f32-warm eigh_newton stall (residual floor ~1e-5)."""
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bench import build_3d27
from gcge_tpu.ops.operators import make_operator
import gcge_tpu.solvers.gcg as gcg
from gcge_tpu.solvers.gcg import GCGParams, gcg_solve

orig_rr = gcg._rayleigh_ritz
calls = {"k": 0}
SPY_AT = {1, 10, 25}
SIZE_X, BS = 400, 40


def spy_rr(a_op, v, h_pp, ss_eval, p_cnt, w_cnt, size_x, bs,
           rr_backend="auto", gemm_prec="f64", mesh=None):
    k = calls["k"]; calls["k"] += 1
    out = orig_rr(a_op, v, h_pp, ss_eval, p_cnt, w_cnt, size_x, bs,
                  rr_backend, gemm_prec, mesh)
    if k in SPY_AT:
        h = np.asarray(out[2])
        pc, wc = int(p_cnt), int(w_cnt)
        m = h.shape[0]
        valid = np.concatenate([np.ones(size_x, bool),
                                np.arange(bs) < pc, np.arange(bs) < wc])
        fv = valid.astype(np.float64)
        hm = h * fv[None, :] * fv[:, None]
        gersh = np.abs(hm).sum(1).max() + 1.0
        h_eig = hm + np.diag((1 - fv) * gersh)
        wref, cref = np.linalg.eigh(h_eig)
        wd = np.asarray(out[0])
        cd = np.asarray(out[1])
        act = size_x + pc + wc
        evalerr = np.abs(wd[:act] - wref[:act]).max()
        res = np.linalg.norm(h_eig @ cd - cd * np.concatenate(
            [wd[:act], wref[act:]])[None, :], axis=0)
        orth = np.abs(cd.T @ cd - np.eye(m)).max()
        np.savez(f"/tmp/rr_late_{k}.npz", h_eig=h_eig, wd=wd, cd=cd)
        print(f"[spy] k={k} p={pc} w={wc} evalerr={evalerr:.3e} "
              f"eigres_max={res[:act].max():.3e} orth={orth:.3e} "
              f"spec[min,max]=({wref[0]:.4f},{wref[act-1]:.4f}) "
              f"min_gap={np.diff(wref[:act]).min():.3e}", flush=True)
    return out


gcg._rayleigh_ritz = spy_rr

rows, cols, vals, n = build_3d27(54)
dia64 = make_operator(rows, cols, vals, (n, n))
params = GCGParams(nev=200, block_size=40, max_iter=27, verbose=1,
                   cg_max_iter=30, fuse=0, cg_mixed=True, cg_refine=2,
                   cg_auto_shift=True)
res = gcg_solve(dia64, None, params)
print(f"done iters={res.num_iter} conv={res.nev_conv}", flush=True)
