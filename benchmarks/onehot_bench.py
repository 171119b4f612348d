"""One-hot windowed SpMM vs gather-ELL on the production irregular pattern.

Sweeps (r_tile, w_tile, j_max) at the solver's block widths.  Uses the
cached irregular FEM matrix (benchmarks/irregular.py must have run once).
"""
import os
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import scipy.sparse as sps
from scipy.sparse.csgraph import reverse_cuthill_mckee

from gcge_tpu.ops.onehot_pallas import OneHotOperator
from gcge_tpu.ops.operators import SparseOperator

G = int(os.environ.get("IRREG_G", 64))
d = np.load(f"/tmp/irreg_mesh_g{G}.npz")
rows, cols, av, n = d["rows"], d["cols"], d["av"], int(d["n"])
a = sps.coo_matrix((av, (rows, cols)), shape=(n, n)).tocsr()
perm = reverse_cuthill_mckee(a, symmetric_mode=True)
inv = np.empty_like(perm); inv[perm] = np.arange(n)
r2, c2 = inv[rows], inv[cols]
nnz = len(av)
print(f"n={n} nnz={nnz}", flush=True)

rng = np.random.default_rng(0)
_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=20):
    out = fn(*args); float(_sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(_sum(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt*1e3:7.2f} ms  {nnz/dt/1e9:6.2f} Gnnz/s",
          flush=True)


BS_LIST = tuple(int(b) for b in
                os.environ.get("ONEHOT_BS", "10,40").split(","))
DF64 = os.environ.get("ONEHOT_DF64", "1") == "1"
CONFIGS = ((256, 256, 128), (256, 512, 256), (512, 512, 256),
           (128, 256, 128), (256, 256, 256), (128, 128, 128),
           (128, 128, 256), (256, 128, 128), (128, 256, 256))

for bs in BS_LIST:
    xt = jnp.asarray(rng.standard_normal((bs, n)), jnp.float32)
    # gather-ELL baseline
    ell = SparseOperator.from_coo(r2, c2, av, (n, n), dtype=jnp.float32)
    timeit(f"ELL gather bs={bs}", jax.jit(lambda x: ell.matvec(x.T).T), xt)
    for (rt, wt, jm) in CONFIGS:
        op = OneHotOperator.from_coo(r2, c2, av, (n, n), r_tile=rt,
                                     w_tile=wt, j_max=jm)
        s = op.stats
        name = (f"onehot bs={bs} R={rt} W={wt} J={jm} "
                f"fill={s['fill']:.2f} P={s['pairs']}")
        try:
            timeit(name, jax.jit(op.matvec_t), xt)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:160]}",
                  flush=True)
            continue
        if DF64:
            xt64 = jnp.asarray(np.asarray(xt), jnp.float64)
            try:
                timeit(name.replace("onehot", "oh df64"),
                       jax.jit(op.matvec_t_df64), xt64)
            except Exception as e:
                print(f"{name} df64: FAILED {type(e).__name__} "
                      f"{str(e)[:160]}", flush=True)
    # correctness spot check on the last config
    y = np.asarray(op.matvec_t(xt))
    import scipy.sparse as _s
    a_perm = _s.coo_matrix((av, (r2, c2)), shape=(n, n)).tocsr()
    y_ref = (a_perm @ np.asarray(xt).T.astype(np.float64)).T
    err = np.abs(y - y_ref).max() / max(np.abs(y_ref).max(), 1e-30)
    print(f"correctness bs={bs}: rel err {err:.2e}", flush=True)
