"""Where does the nev=400 (m=960) compile wall sit?

The fused `_gcg_chunk` at m=960 did not finish remote-compiling in 90 min
(round 4; round 3 gave up at 46 min).  This probe compiles the candidate
sub-programs STANDALONE with wall-clock timing, coarsest first, so the wall
can be attributed:

  1. eigh_newton at m=960 (f32-warm path — what the chunk's RR runs);
  2. _rayleigh_ritz at m=960 (adds the osgemm Grams + recombination);
  3. _compute_w at nev=400 shapes (mixed CG + orth);
  4. the full _gcg_chunk (only with PROBE_CHUNK=1 — this is the known hog).

Each stage runs under its own timeout budget (PROBE_BUDGET, default 900 s)
in a fresh interpreter so an un-compilable stage doesn't block the rest:
run via  `for s in eigh rr compw; do PROBE_STAGE=$s python
benchmarks/nev400_compile_probe.py; done`.
"""
import os
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

STAGE = os.environ.get("PROBE_STAGE", "eigh")
NX = int(os.environ.get("PROBE_NX", 44))
M = int(os.environ.get("PROBE_M", 960))

rng = np.random.default_rng(0)


def tlog(msg, t0):
    print(f"[{time.perf_counter() - t0:7.1f}s] {msg}", flush=True)


t0 = time.perf_counter()

if STAGE == "eigh":
    from gcge_tpu.ops.eighs import eigh_newton

    h = rng.standard_normal((M, M))
    h = jnp.asarray(h + h.T)
    tlog(f"compiling eigh_newton m={M} (f32 warm auto)", t0)
    w, u = eigh_newton(h)
    jax.block_until_ready((w, u))
    tlog(f"eigh_newton m={M} done (compile+run)", t0)
    t1 = time.perf_counter()
    w, u = eigh_newton(h + 1e-3)
    jax.block_until_ready((w, u))
    print(f"steady: {time.perf_counter() - t1:.2f}s", flush=True)

elif STAGE == "rr":
    from bench import build_3d27
    from gcge_tpu.ops.operators import make_operator
    from gcge_tpu.solvers import gcg as G

    rows, cols, vals, n = build_3d27(NX)
    op = make_operator(rows, cols, vals, (n, n))
    bs = max(M // 12, 2)
    size_x = M - 2 * bs
    v = jnp.asarray(rng.standard_normal((n, M)))
    ss_eval = jnp.sort(jnp.asarray(rng.standard_normal((M,)) ** 2))
    h_pp = jnp.zeros((bs, bs))
    tlog(f"compiling _rayleigh_ritz m={M} (newton, osgemm_pallas)", t0)
    out = G._rayleigh_ritz(op, v, h_pp, ss_eval, jnp.int32(bs), jnp.int32(bs),
                           size_x, bs, "auto", "osgemm_pallas", None, True)
    jax.block_until_ready(out)
    tlog("_rayleigh_ritz done (compile+run)", t0)

elif STAGE == "compw":
    from bench import build_3d27
    from gcge_tpu.ops.operators import make_operator
    from gcge_tpu.solvers import gcg as G
    from gcge_tpu.solvers.bpcg import BlockPCGParams

    rows, cols, vals, n = build_3d27(NX)
    op = make_operator(rows, cols, vals, (n, n))
    bs = max(M // 12, 2)
    size_x = M - 2 * bs
    cg = BlockPCGParams(max_iter=30, rate=1e-2, tol=1e-14, tol_type="abs")
    v = jnp.asarray(rng.standard_normal((n, M)))
    ritz = v[:, :size_x]
    ss_eval = jnp.sort(jnp.asarray(rng.standard_normal((M,)) ** 2))
    act = jnp.arange(bs, dtype=jnp.int32)
    tlog(f"compiling _compute_w nev-shape m={M} (mixed cg)", t0)
    out = G._compute_w(op, None, v, ritz, ss_eval, act, jnp.int32(bs),
                       jnp.asarray(0.0), size_x, bs, cg, 1e-13, 2, 1, None,
                       True, 2, None, "evp", "osgemm_pallas")
    jax.block_until_ready(out)
    tlog("_compute_w done (compile+run)", t0)

else:
    raise SystemExit(f"unknown PROBE_STAGE={STAGE}")
