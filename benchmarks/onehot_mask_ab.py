"""A/B the one-hot construction encodings on the production matrix (TPU).

Round-4 attribution: the windowed one-hot kernels are bound by one-hot
CONSTRUCTION (~900 VPU ops/nnz of iota-compare + select + bf16 pack), not
by the MXU contractions.  Round-5 levers measured here:

* ``mask='f32'``  — the round-4 form: i32 compare, f32 select, bf16 pack
  (3 register passes at f32 density).
* ``mask='bf16'`` — compare AND select in bf16 (ids < 2^8 are exact in
  bf16; the i1 mask is born in the (16,128) bf16 tiling so the select
  needs no relayout): half the registers per element.
* df64 additionally carries the deferred-lo slice peel + magnitude-split
  combine (exactness-preserving, see the kernel comments).

Usage: python benchmarks/onehot_mask_ab.py   [MASK_BS=10 IRREG_G=64]
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

G = int(os.environ.get("IRREG_G", 64))
BS = int(os.environ.get("MASK_BS", 10))
GROUP = int(os.environ.get("MASK_GROUP", 8))


def main():
    import scipy.sparse as sps
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    from gcge_tpu.ops.onehot_pallas import OneHotOperator

    d = np.load(f"/tmp/irreg_mesh_g{G}.npz")
    rows, cols, av, n = d["rows"], d["cols"], d["av"], int(d["n"])
    nnz = len(rows)
    a = sps.coo_matrix((av, (rows, cols)), shape=(n, n)).tocsr()
    perm = reverse_cuthill_mckee(a, symmetric_mode=True)
    inv = np.empty_like(perm); inv[perm] = np.arange(n)
    r2, c2 = inv[rows], inv[cols]
    print(f"n={n} nnz={nnz} bs={BS} group={GROUP}", flush=True)

    op = OneHotOperator.from_coo(r2, c2, av, (n, n), r_tile=256, w_tile=256,
                                 j_max=128, group=GROUP)
    print(f"pairs={op.stats}", flush=True)
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((BS, n)), jnp.float32)
    xt64 = jnp.asarray(rng.standard_normal((BS, n)))

    def timeit(fn, x, k=20):
        def chain(xx):
            def body(i, y):
                z = fn(y)
                z0 = z[0] if isinstance(z, tuple) else z
                return z0 * jax.lax.rsqrt(
                    jnp.mean(jnp.square(z0)) + 1e-30)
            return jax.lax.fori_loop(0, k, body, xx)
        g = jax.jit(chain)
        fetch = lambda y: float(jnp.ravel(y)[0])
        fetch(g(x))
        t0 = time.perf_counter(); fetch(x)
        floor = time.perf_counter() - t0
        t0 = time.perf_counter(); fetch(g(x))
        return max(time.perf_counter() - t0 - floor, 1e-9) / k

    y_ref = (a[perm][:, perm] @ np.asarray(xt64.T, np.float64)).T

    for mode in ("f32", "bf16"):
        os.environ["GCGE_ONEHOT_MASK"] = mode
        jax.clear_caches()
        t = timeit(lambda y: op.matvec_t(y, interpret=False), xt)
        print(f"f32  mask={mode}: {t*1e3:7.2f} ms  "
              f"{nnz/t/1e9:6.3f} Gnnz/s", flush=True)
        td = timeit(lambda y: op.matvec_t_df64(y, interpret=False), xt64)
        yd = np.asarray(op.matvec_t_df64(xt64, interpret=False))
        err = np.abs(yd - y_ref).max() / np.abs(y_ref).max()
        print(f"df64 mask={mode}: {td*1e3:7.2f} ms  "
              f"{nnz/td/1e9:6.3f} Gnnz/s  rel_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
