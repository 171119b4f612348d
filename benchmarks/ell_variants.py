"""Measure XLA gather-SpMM formulations on the TPU for IRREGULAR matrices.

The production irregular pattern (unstructured tet FEM after RCM — see
benchmarks/irregular.py) puts only ~40% of nnz on the top-128 diagonals, so
the DIA/Hybrid fast path cannot carry it: the ELL gather path does.  Round-1
measured it at 3 Gnnz/s (bs=10, f32) — this driver A/Bs the candidate
formulations at production shapes to pick the fastest as SparseOperator's
implementation.

Synthetic pattern: K nnz/row uniform in a +-band window — matches the
post-RCM statistics of the FEM matrices (bandwidth ~n^(2/3)).
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

N = int(os.environ.get("ELL_N", 250_000))
K = int(os.environ.get("ELL_K", 16))
BAND = int(os.environ.get("ELL_BAND", 6000))

rng = np.random.default_rng(0)
idx = np.clip(np.arange(N)[:, None]
              + rng.integers(-BAND, BAND + 1, (N, K)), 0, N - 1)
idx_sorted = np.sort(idx, axis=1)
vals = rng.standard_normal((N, K))
nnz = N * K

_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=20):
    out = fn(*args); float(_sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(_sum(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:8.2f} ms   {nnz/dt/1e9:7.2f} Gnnz/s")
    return dt


def ell_loop(values, indices, x):
    """Current SparseOperator path: fori over K slot-gathers."""
    n, k = values.shape

    def body(j, y):
        return y + values[:, j, None] * jnp.take(x, indices[:, j], axis=0)

    return jax.lax.fori_loop(0, k, body, jnp.zeros((n, x.shape[1]), x.dtype))


def ell_unrolled(values, indices, x):
    y = jnp.zeros((values.shape[0], x.shape[1]), x.dtype)
    for j in range(values.shape[1]):
        y = y + values[:, j, None] * jnp.take(x, indices[:, j], axis=0)
    return y


def ell_big_take(values, indices, x):
    g = jnp.take(x, indices.reshape(-1), axis=0).reshape(*indices.shape, -1)
    return jnp.einsum("nk,nkb->nb", values, g)


def ell_onehot_free(values, indices, x):
    # gather expressed per-slot, but through take_along_axis on an (n, bs)
    # broadcast — sometimes lowered differently by XLA
    n, k = values.shape
    y = jnp.zeros((n, x.shape[1]), x.dtype)
    for j in range(k):
        g = jnp.take_along_axis(
            x, jnp.broadcast_to(indices[:, j:j+1], (n, x.shape[1])), axis=0)
    # note: take_along_axis with axis=0 and full-width col index IS the row
    # gather; accumulate outside to time the gather itself
        y = y + values[:, j, None] * g
    return y


for bs in (10, 40):
    for dt, dname in ((jnp.float32, "f32"), (jnp.float64, "f64")):
        x = jnp.asarray(rng.standard_normal((N, bs)), dt)
        v = jnp.asarray(vals, dt)
        ii = jnp.asarray(idx, jnp.int32)
        iis = jnp.asarray(idx_sorted, jnp.int32)
        print(f"--- bs={bs} {dname} (N={N} K={K} band={BAND}) ---")
        timeit(f"ell_loop", jax.jit(ell_loop), v, ii, x)
        timeit(f"ell_unrolled", jax.jit(ell_unrolled), v, ii, x)
        timeit(f"ell_unrolled sorted-idx", jax.jit(ell_unrolled), v, iis, x)
        timeit(f"ell_big_take", jax.jit(ell_big_take), v, ii, x)
        if dt == jnp.float32:
            timeit(f"ell_unrolled bf16-x", jax.jit(ell_unrolled), v.astype(jnp.bfloat16),
                   ii, x.astype(jnp.bfloat16))
        # raw gather floor: one take of all rows
        timeit(f"raw take (n*K rows)",
               jax.jit(lambda i_, x_: jnp.take(x_, i_.reshape(-1), axis=0)), ii, x)
