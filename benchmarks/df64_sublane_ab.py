"""df64 DIA sublane-occupancy A/B (VERDICT r4 item 6).

The df64 DIA kernel is VPU-bound at ~26 ops/nnz on (m_pad, tn) tiles with
m_pad = round_up(bs, 8): at the production bs=10 that is 16 sublanes of
which 6 are padding, and the roofline section conjectured up to ~100 Gnnz/s
if the waste were recovered.  The testable form: if the kernel cost is
sublane-QUANTIZED (vreg-granular), the wall at bs=16 equals the wall at
bs=10 — the padding is architecturally unavoidable at bs=10 and the
roofline's "6/16 wasted" is not a recoverable lever; if instead the wall
scales with bs inside a vreg, packing would pay.  This driver measures the
per-matvec wall and Gnnz/s at bs in {8, 10, 16, 24, 32, 40} on the bench
operator (n=157k 27-point Laplacian) and prints the verdict.

Usage: python benchmarks/df64_sublane_ab.py
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
from gcge_tpu.ops.operators import DiaDF64Operator, DiaOperator

NX = int(os.environ.get("SUBLANE_NX", 54))


def main():
    rows, cols, vals, n = build_3d27(NX)
    nnz = len(vals)
    dia = DiaOperator.from_coo(rows, cols, vals, (n, n))
    df = DiaDF64Operator.from_dia(dia)
    rng = np.random.default_rng(0)

    def timeit(fn, x, k=30):
        def chain(xx):
            def body(i, y):
                z = fn(y)
                return z * jax.lax.rsqrt(jnp.mean(jnp.square(z)) + 1e-30)
            return jax.lax.fori_loop(0, k, body, xx)
        g = jax.jit(chain)
        fetch = lambda y: float(jnp.ravel(y)[0])
        fetch(g(x))
        t0 = time.perf_counter(); fetch(x)
        floor = time.perf_counter() - t0
        t0 = time.perf_counter(); fetch(g(x))
        return max(time.perf_counter() - t0 - floor, 1e-9) / k

    walls = {}
    for bs in (8, 10, 16, 24, 32, 40):
        xt = jnp.asarray(rng.standard_normal((bs, n)))
        t = timeit(df.matvec_t, xt)
        walls[bs] = t
        print(f"bs={bs:2d} (m_pad={-(-max(bs,8)//8)*8:2d}): {t*1e3:7.3f} ms"
              f"  {nnz*1/t/1e9:6.1f} Gnnz/s"
              f"  {nnz*bs/t/1e9:7.1f} Gnnz*col/s", flush=True)
    r = walls[16] / walls[10]
    print(f"\nwall(16)/wall(10) = {r:.3f} -> "
          + ("sublane-QUANTIZED: the 6 padded sublanes at bs=10 are free; "
             "no recoverable lever (negative result, closes r1 item 7)"
             if r < 1.15 else
             "NOT quantized: packing the 16-sublane grid would pay "
             f"({(1 - 1/r)*100:.0f}% recoverable)"), flush=True)


if __name__ == "__main__":
    main()
