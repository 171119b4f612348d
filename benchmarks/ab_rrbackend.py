import os, sys, time
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from bench import build_3d27
from gcge_tpu.ops.operators import make_operator
from gcge_tpu.solvers.gcg import GCGParams, gcg_solve

rows, cols, vals, n = build_3d27(54)
dia64 = make_operator(rows, cols, vals, (n, n))
which = sys.argv[1] if len(sys.argv) > 1 else "auto"
params = GCGParams(nev=50, block_size=10, max_iter=120, verbose=0,
                   cg_max_iter=30, fuse=20, cg_mixed=True, cg_refine=2,
                   cg_auto_shift=True, rr_backend=which)
res = gcg_solve(dia64, None, params)
t0 = time.perf_counter()
res = gcg_solve(dia64, None, params)
wall = time.perf_counter() - t0
print(f"[rr={which}] steady: {wall:.2f}s iters={res.num_iter} nev_conv={res.nev_conv}")
print("eval[:5]:", np.asarray(res.eval[:5]))
