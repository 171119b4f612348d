"""Single-chip nev=400 stall — factor isolation on CPU (round 5).

The m=960 single-chip run freezes at 284/400 while the virtual-mesh run
(exact-f64 RR + plain f64 inner CG) converges 407/400 in 37 iterations on
the same parameterization.  Two emulated-f64 shortcuts differ:
``cg_mixed`` (f32 inner-CG stages) and the f32-warm Newton RR
(``eigh_newton`` past ``F32_WARM_MIN_M``).  CPU f64 is exact, so both
shortcuts can be reproduced/forced ON here independently at NX=24 (the
mesh run's size) to isolate the stall:

    REPRO_MIXED=0|1     cg_mixed
    REPRO_RR=device|newton   rr_backend (newton + GCGE_F32_WARM_MIN_M=0
                             reproduces the TPU's f32-warm path)

Usage:
    GCGE_F32_WARM_MIN_M=0 REPRO_RR=newton REPRO_MIXED=1 \
        python benchmarks/nev400_stall_repro.py
"""
import os
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")   # env alone is ignored (axon)
import time

import numpy as np

from bench import build_3d27
from gcge_tpu.ops.operators import DiaOperator
from gcge_tpu.solvers.gcg import GCGParams, gcg_solve

NX = int(os.environ.get("REPRO_NX", 24))
MIXED = os.environ.get("REPRO_MIXED", "1") == "1"
RR = os.environ.get("REPRO_RR", "newton")
MAXIT = int(os.environ.get("REPRO_MAXIT", 120))
NEVMAX = int(os.environ.get("REPRO_NEVMAX", 800))

rows, cols, vals, n = build_3d27(NX)
op = DiaOperator.from_coo(rows, cols, vals, (n, n))
print(f"n={n} mixed={MIXED} rr={RR} f32warm_min="
      f"{os.environ.get('GCGE_F32_WARM_MIN_M', 'default')}", flush=True)
params = GCGParams(nev=400, block_size=80, nev_max=NEVMAX, max_iter=MAXIT,
                   verbose=1, cg_max_iter=30, cg_mixed=MIXED, cg_refine=2,
                   cg_auto_shift=True, rr_backend=RR, fuse=0)
t0 = time.perf_counter()
res = gcg_solve(op, None, params)
print(f"stall-repro nx={NX} mixed={MIXED} rr={RR}: "
      f"{time.perf_counter()-t0:.1f}s iters={res.num_iter} "
      f"conv={res.nev_conv}", flush=True)
