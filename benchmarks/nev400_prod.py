"""nev=400 at PRODUCTION n — the single-chip huge-nev milestone.

Round 1 could not run this size: the initial Rayleigh-Ritz program peaked
17.9 GB (f64 = 32 B/element on this runtime) vs 15.75 GB HBM, and the
m=960 projected eigensolve needed the f32-warm path (the emulated-f64
device eigh does not compile past m~1000).  Round 2 changes that make it
feasible: streamed initial RR + donated basis buffers (gcg.py), and the
structural RR warm start (one 160x160 eigh instead of any m x m device
eigh).  Reference rig: nev sweeps to 5000, test/submit.sh:30-32.

NX=44 (n=85k) fits comfortably; NX=54 (n=157k) is the stretch target.
"""
import os
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from bench import build_3d27
from gcge_tpu.ops.operators import make_operator
from gcge_tpu.solvers.gcg import GCGParams, gcg_solve

NX = int(os.environ.get("NEV400_NX", 44))
if os.path.exists(f"/root/repo/.scratch/SKIP_NX{NX}"):
    print(f"skipping NX={NX} (skip marker present)", flush=True)
    raise SystemExit(0)
FUSE = int(os.environ.get("NEV400_FUSE", 10))
BS = int(os.environ.get("NEV400_BS", 80))
NEVMAX = int(os.environ.get("NEV400_NEVMAX", 0))   # 0 -> auto (2*nev)
rows, cols, vals, n = build_3d27(NX)
dia64 = make_operator(rows, cols, vals, (n, n))
print(f"n={n} fuse={FUSE} bs={BS} nev_max={NEVMAX or 'auto'}", flush=True)
MAXIT = int(os.environ.get("NEV400_MAXIT", 200))
ONESHOT = os.environ.get("NEV400_ONESHOT", "0") == "1"
SHIFT = os.environ.get("NEV400_SHIFT", "1") == "1"
CG = int(os.environ.get("NEV400_CG", 30))
REFINE = int(os.environ.get("NEV400_REFINE", 2))
MIXED = os.environ.get("NEV400_MIXED", "1") == "1"
params = GCGParams(nev=400, block_size=BS, nev_max=NEVMAX, max_iter=MAXIT,
                   verbose=1,
                   cg_max_iter=CG, fuse=FUSE, cg_mixed=MIXED,
                   cg_refine=REFINE, cg_auto_shift=SHIFT)
t0 = time.perf_counter()
res = gcg_solve(dia64, None, params)
print(f"nev400 nx={NX} cold: {time.perf_counter()-t0:.1f}s "
      f"iters={res.num_iter} conv={res.nev_conv} "
      f"eval[:3]={np.asarray(res.eval[:3])}", flush=True)
if ONESHOT:
    raise SystemExit(0)
t0 = time.perf_counter()
res = gcg_solve(dia64, None, params)
print(f"nev400 nx={NX} steady: {time.perf_counter()-t0:.1f}s "
      f"iters={res.num_iter} conv={res.nev_conv} "
      f"eval[:3]={np.asarray(res.eval[:3])}", flush=True)
