"""Grouped one-hot kernels (G pairs per grid step) on the production
irregular matrix — picks the production ``group``/tile defaults.

Per the round-4 sweep the ungrouped kernel is bound by per-grid-step fixed
cost (~0.3 us x P steps), not by the MXU; grouping divides the step count.
Uses the cached irregular FEM matrix (benchmarks/irregular.py builds it).
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
    out = fn(*args); float(_sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(_sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:7.2f} ms  {nnz/dt/1e9:6.2f} Gnnz/s",
          flush=True)


BS = tuple(int(b) for b in os.environ.get("OG_BS", "10").split(","))
CONFIGS = ((256, 256, 256), (256, 256, 128))
GROUPS = tuple(int(g) for g in os.environ.get("OG_GROUPS", "1,2,4,8").split(","))

for bs in BS:
    xt32 = jnp.asarray(rng.standard_normal((bs, n)), jnp.float32)
    xt64 = jnp.asarray(np.asarray(xt32), jnp.float64)
    for (rt, wt, jm) in CONFIGS:
        for g in GROUPS:
            op = OneHotOperator.from_coo(r2, c2, av, (n, n), r_tile=rt,
                                         w_tile=wt, j_max=jm, group=g)
            s = op.stats
            pg = s.get("pairs_grouped", s["pairs"])
            name = (f"bs={bs} R={rt} W={wt} J={jm} G={g} "
                    f"fill={s['fill']:.2f} steps={pg // g}")
            try:
                timeit("f32 " + name, jax.jit(op.matvec_t), xt32)
                timeit("df64 " + name, jax.jit(op.matvec_t_df64), xt64)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__} {str(e)[:140]}",
                      flush=True)
        # spot correctness on the last config
        y = np.asarray(op.matvec_t_df64(xt64))
        a_p = sps.coo_matrix((av, (r2, c2)), shape=(n, n)).tocsr()
        y_ref = (a_p @ np.asarray(xt64).T).T
        err = np.abs(y - y_ref).max() / np.abs(y_ref).max()
        print(f"   correctness G={g}: rel {err:.2e}", flush=True)
