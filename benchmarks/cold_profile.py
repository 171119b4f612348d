"""Cold-start budget breakdown (VERDICT round-2 item 8).

Runs the production nev=50 solve exactly as bench.py does, from a COLD
persistent-compile cache, and logs every XLA compile with a wall-clock
timestamp and duration, so the ~3-minute first-solve latency can be
attributed program by program.  The reference has no compile phase at all
(ahead-of-time C); here the cost is XLA tracing + Mosaic kernel compiles
serialized over the axon tunnel, paid once per (shape, config) and then
served from ``.jax_cache`` forever.

Usage: COLD_CACHE_DIR=/tmp/coldcache python benchmarks/cold_profile.py
"""
import os
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import logging
import tempfile
import time

# A pre-populated cache dir would silently measure a WARM start — default to
# a fresh temporary directory, and refuse a non-empty user-supplied one.
CACHE = os.environ.get("COLD_CACHE_DIR")
if CACHE is None:
    CACHE = tempfile.mkdtemp(prefix="coldcache_")
elif os.path.isdir(CACHE) and os.listdir(CACHE):
    raise SystemExit(f"COLD_CACHE_DIR={CACHE} is non-empty: this run would "
                     "measure a warm cache, not a cold start.  Point it at "
                     "an empty/new directory (or unset it).")
os.environ["JAX_COMPILATION_CACHE_DIR"] = CACHE

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_log_compiles", True)

t_start = time.perf_counter()


class _StampFormatter(logging.Formatter):
    """Prefix every jax compile log line with seconds-since-start.

    Formatter, not a Filter mutating record.msg: other handlers must see the
    pristine record.
    """

    def format(self, record):
        return (f"[t={time.perf_counter() - t_start:7.1f}s] "
                f"{super().format(record)}")


handler = logging.StreamHandler()
handler.setFormatter(_StampFormatter("%(message)s"))
for name in ("jax._src.interpreters.pxla", "jax._src.compiler",
             "jax._src.dispatch"):
    lg = logging.getLogger(name)
    lg.addHandler(handler)
    lg.setLevel(logging.DEBUG)
    lg.propagate = False  # a root/absl handler would double-print

from bench import build_3d27
from gcge_tpu.ops.operators import make_operator
from gcge_tpu.solvers.gcg import GCGParams, gcg_solve

NX = int(os.environ.get("COLD_NX", 54))
rows, cols, vals, n = build_3d27(NX)
op = make_operator(rows, cols, vals, (n, n))
params = GCGParams(nev=50, block_size=10, max_iter=120, verbose=0,
                   cg_max_iter=30, fuse=20, cg_mixed=True, cg_refine=2,
                   cg_auto_shift=True)
t0 = time.perf_counter()
res = gcg_solve(op, None, params)
print(f"COLD solve: {time.perf_counter() - t0:.1f}s iters={res.num_iter} "
      f"conv={res.nev_conv}", flush=True)
