"""Microbench: osgemm projection pair vs emulated-f64 on the real TPU.
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))

Shapes = GCG's against-projection at the bench operator size
(n=157464, q width 110 = nevMax+2bs at nev=50, x width 10 = blockSize).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from gcge_tpu.ops.multivec import gram
from gcge_tpu.ops.osgemm import os_expand, os_gram

n, mq, mx = 157464, 110, 10
rng = np.random.default_rng(0)
q_np = np.linalg.qr(rng.standard_normal((n, mq)))[0]
x_np = rng.standard_normal((n, mx))
# make x mostly in span(q), amplified — the GCG W-block regime
x_np = 1e6 * q_np[:, :mx] + x_np

q = jnp.asarray(q_np)
x = jnp.asarray(x_np)

coef_ref = q_np.T @ x_np
upd_ref = q_np @ coef_ref


def timeit(f, *a, reps=10):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


f64_gram = jax.jit(lambda q, x: gram(q, x))
f64_exp = jax.jit(lambda q, c: q @ c)

t, c_os = timeit(os_gram, q, x)
err = np.max(np.abs(np.asarray(c_os) - coef_ref)) / np.max(np.abs(coef_ref))
print(f"os_gram   : {t*1e3:8.2f} ms  relerr {err:.2e}")

t, c_64 = timeit(f64_gram, q, x)
err = np.max(np.abs(np.asarray(c_64) - coef_ref)) / np.max(np.abs(coef_ref))
print(f"f64 gram  : {t*1e3:8.2f} ms  relerr {err:.2e}")

coef = jnp.asarray(coef_ref)
t, u_os = timeit(os_expand, q, coef)
err = np.max(np.abs(np.asarray(u_os) - upd_ref)) / np.max(np.abs(upd_ref))
print(f"os_expand : {t*1e3:8.2f} ms  relerr {err:.2e}")

t, u_64 = timeit(f64_exp, q, coef)
err = np.max(np.abs(np.asarray(u_64) - upd_ref)) / np.max(np.abs(upd_ref))
print(f"f64 expand: {t*1e3:8.2f} ms  relerr {err:.2e}")
