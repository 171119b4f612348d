"""df64 DIA SpMM roofline experiments (VERDICT round-1 item 7).

E1: raise the kernel's result-plane budget so bs=10..24 runs unchunked
    (the 12 MB guard forced row-chunks that re-read the value planes).
E2: FMA probe — if (a*b - p) lowers to a fused multiply-add on this VPU
    (XLA runs with --xla_allow_excess_precision=true), the Dekker
    two-product's 9-op error computation collapses to ONE op and the
    kernel's VPU cost drops ~2x.
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

from bench import build_3d27
from gcge_tpu.ops import spmm_pallas as SP
from gcge_tpu.ops.operators import DiaOperator

rows, cols, vals, n = build_3d27(54)
dia = DiaOperator.from_coo(rows, cols, vals, (n, n))
vhi, vlo = SP.split_df32(dia.values)
offs = dia.offsets
nnz = len(vals)
rng = np.random.default_rng(0)
_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, reps=30):
    out = fn(*args); float(_sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(_sum(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:7.2f} ms  {nnz/dt/1e9:6.1f} Gnnz/s", flush=True)


# --- E2: FMA probe (run first, cheap) --------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fma_probe_kernel(a_ref, b_ref, o_ref):
    a, b = a_ref[:], b_ref[:]
    p = a * b
    err_fma = a * b - p                      # exact iff lowered as FMA
    # Dekker reference
    c = jnp.float32(4097.0) * a
    a_hi = c - (c - a); a_lo = a - a_hi
    c = jnp.float32(4097.0) * b
    b_hi = c - (c - b); b_lo = b - b_hi
    err_dek = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    o_ref[:] = jnp.stack([err_fma, err_dek], axis=0).reshape(o_ref.shape)


a32 = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32) * 1.7
b32 = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32) * 0.3
out = pl.pallas_call(
    fma_probe_kernel,
    out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
)(a32, b32)
err_fma, err_dek = np.asarray(out[:8]), np.asarray(out[8:])
match = np.array_equal(err_fma, err_dek)
nz = np.count_nonzero(err_dek)
print(f"FMA probe: (a*b - p) == dekker_err exactly: {match} "
      f"(dekker err nonzeros: {nz}/1024)", flush=True)

# --- E1: budget sweep at production shapes ---------------------------------
for bs in (10, 24, 40):
    xt = jnp.asarray(rng.standard_normal((bs, n)))
    for budget_mb in (12, 28, 48):
        SP._RESULT_BUDGET = budget_mb * 2**20
        name = f"df64 bs={bs} budget={budget_mb}MB"
        try:
            timeit(name, jax.jit(lambda x: SP.dia_spmm_pallas_t_df64(
                vhi, vlo, offs, x)), xt)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
