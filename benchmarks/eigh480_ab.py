"""A/B at the nev=200 projected shape (m=480): eigh_newton warm starts.

The default newton path warm-starts from the EMULATED-f64 device eigh
(m < F32_WARM_MIN_M = 768).  Hypothesis: at m=480 the f64 QDWH warm start
dominates the ~1 s eigh cost; the f32 warm (native-precision QDWH) + more
refinement passes may be far cheaper at equal accuracy.
"""
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from gcge_tpu.ops.eighs import eigh_jacobi, eigh_newton, safe_eigh

rng = np.random.default_rng(0)
m = 480

# GCG-like projected matrix: nearly diagonal X-block (converged Ritz values
# with a dense low-lying spectrum), O(1) coupling to the fresh 2*bs W/P block
lam = np.sort(rng.uniform(1.0, 400.0, m - 80))
h = np.zeros((m, m))
h[: m - 80, : m - 80] = np.diag(lam)
w_blk = rng.standard_normal((80, 80)); w_blk = (w_blk + w_blk.T) * 5
h[m - 80:, m - 80:] = w_blk + np.diag(np.linspace(380, 420, 80))
c = rng.standard_normal((m - 80, 80)) * 2.0
h[: m - 80, m - 80:] = c
h[m - 80:, : m - 80] = c.T
hj = jnp.asarray(h)
w_ref = np.linalg.eigvalsh(h)


def run(name, fn):
    # IMPORTANT: on the axon tunnel block_until_ready in a tight loop
    # returns optimistically (see repeat_cache_probe.py) — every timed rep
    # must FETCH a value to force completion.  ~30 ms round trip is part of
    # each rep; subtract the floor when comparing micro-costs.
    w, u = fn(hj); float(w[0])
    t0 = time.perf_counter()
    for _ in range(3):
        w, u = fn(hj); float(w[0])
    dt = (time.perf_counter() - t0) / 3
    wn, un = np.asarray(w), np.asarray(u)
    resid = np.linalg.norm(h @ un - un * wn[None, :], axis=0).max() / np.abs(w_ref).max()
    werr = np.abs(wn - w_ref).max() / np.abs(w_ref).max()
    ortho = np.abs(un.T @ un - np.eye(m)).max()
    print(f"{name:28s} {dt*1e3:8.1f} ms  resid {resid:.2e}  werr {werr:.2e}  orth {ortho:.2e}",
          flush=True)


run("newton default (f64 warm)", lambda x: eigh_newton(x))
run("newton f32 warm p=2", lambda x: eigh_newton(x, warm_dtype="f32", passes=2))
run("newton f32 warm p=3", lambda x: eigh_newton(x, warm_dtype="f32", passes=3))
run("jacobi", eigh_jacobi)
run("device f64 safe_eigh", safe_eigh)
