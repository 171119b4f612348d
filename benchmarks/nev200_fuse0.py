"""nev=200 with fuse=0 (phase-wise): isolates the fused-loop f32-eigh crash
and measures the per-iteration-dispatch alternative."""
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

rows, cols, vals, n = build_3d27(54)
dia64 = make_operator(rows, cols, vals, (n, n))
params = GCGParams(nev=200, block_size=40, max_iter=150, verbose=1,
                   cg_max_iter=30, fuse=0, cg_mixed=True, cg_refine=2,
                   cg_auto_shift=True)
t0 = time.perf_counter()
res = gcg_solve(dia64, None, params)
print(f"cold: {time.perf_counter()-t0:.1f}s iters={res.num_iter} conv={res.nev_conv}", flush=True)
t0 = time.perf_counter()
res = gcg_solve(dia64, None, params)
print(f"steady: {time.perf_counter()-t0:.1f}s iters={res.num_iter} conv={res.nev_conv}", flush=True)
