"""nev=400 end-to-end: the first production size whose projected problem
(m = 2*400 + 2*80 = 960) crosses F32_WARM_MIN_M, so the Rayleigh-Ritz
eigensolve runs the f32-warm multi-pass eigh_newton (cluster-first + trust
cap + divergence guard + per-pass noise floors).  Validates the huge-nev
path on real hardware.  n is kept at 36^3 = 46,656: at the SiO2-scale
n=157k this size OOMs single-chip HBM (the initial-RR program peaks at
17.9 G vs 15.75 G available — V alone is n*960*32 B ~ 4.8 GB on this
runtime); that regime is what the 2-D mesh path is for."""
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bench import build_3d27
from gcge_tpu.ops.operators import make_operator
from gcge_tpu.solvers.gcg import GCGParams, gcg_solve

rows, cols, vals, n = build_3d27(36)
dia64 = make_operator(rows, cols, vals, (n, n))
params = GCGParams(nev=400, block_size=80, max_iter=200, verbose=1,
                   cg_max_iter=30, fuse=0, cg_mixed=True, cg_refine=2,
                   cg_auto_shift=True)
t0 = time.perf_counter()
res = gcg_solve(dia64, None, params)
print(f"cold: {time.perf_counter()-t0:.1f}s iters={res.num_iter} conv={res.nev_conv}", flush=True)
t0 = time.perf_counter()
res = gcg_solve(dia64, None, params)
print(f"steady: {time.perf_counter()-t0:.1f}s iters={res.num_iter} conv={res.nev_conv}", flush=True)
