import os, time
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from gcge_tpu.ops.osgemm_pallas import os_gram_pallas, os_expand_pallas

rng = np.random.default_rng(0)
n = 157464
def t(fn, *a):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(5): o = fn(*a); jax.block_until_ready(o)
    return o, (time.perf_counter() - t0) / 5

for (p, q) in [(512, 48), (400, 400), (120, 16)]:
    a = jnp.asarray(rng.standard_normal((n, p)))
    b = jnp.asarray(rng.standard_normal((n, q)))
    got, dt = t(os_gram_pallas, a, b)
    ref = np.asarray(a).T @ np.asarray(b)
    sc = (np.linalg.norm(a, axis=0)[:, None] * np.linalg.norm(b, axis=0)[None, :])
    err = np.max(np.abs(np.asarray(got) - ref) / sc)
    print(f"gram p={p} q={q}: {dt*1e3:.1f} ms  relerr {err:.2e}", flush=True)
for (k, q) in [(480, 400), (120, 100)]:
    a = jnp.asarray(rng.standard_normal((n, k)))
    c = jnp.asarray(rng.standard_normal((k, q)))
    got, dt = t(os_expand_pallas, a, c)
    ref = np.asarray(a) @ np.asarray(c)
    sc = np.abs(np.asarray(a)).max(1)[:, None] * np.abs(np.asarray(c)).max(0)[None, :] * k
    err = np.max(np.abs(np.asarray(got) - ref) / sc)
    print(f"expand k={k} q={q}: {dt*1e3:.1f} ms  relerr {err:.2e}", flush=True)
print("HW CHECK OK")
