"""Microbench: RR-phase GEMM shapes, emulated f64 vs osgemm, real TPU."""
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gcge_tpu.ops.multivec import gram
from gcge_tpu.ops.osgemm import os_gram, os_expand

n, m, sx, bs = 157464, 120, 100, 10
rng = np.random.default_rng(0)
v = jnp.asarray(rng.standard_normal((n, m)))
aw = jnp.asarray(rng.standard_normal((n, bs)))
c = jnp.asarray(np.linalg.qr(rng.standard_normal((m, m)))[0])

def timeit(f, *a, reps=10):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out

ref_g = np.asarray(v, np.float64).T @ np.asarray(aw)
ref_e = np.asarray(v) @ np.asarray(c[:, :sx])

f_gram = jax.jit(lambda a, b: gram(a, b))
f_mm   = jax.jit(lambda a, b: a.T @ b)
f_exp  = jax.jit(lambda a, b: a @ b)
for name, f, args, ref in [
    ("gram(v,aw) chunked", f_gram, (v, aw), ref_g),
    ("v.T@aw emulated   ", f_mm, (v, aw), ref_g),
    ("os_gram(v,aw)     ", os_gram, (v, aw), ref_g),
    ("v@c emulated      ", f_exp, (v, c[:, :sx]), ref_e),
    ("os_expand(v,c)    ", os_expand, (v, c[:, :sx]), ref_e),
]:
    t, out = timeit(f, *args)
    err = np.max(np.abs(np.asarray(out) - ref)) / np.max(np.abs(ref))
    print(f"{name}: {t*1e3:8.2f} ms  relerr {err:.2e}")
