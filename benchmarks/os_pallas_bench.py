"""TPU microbench + accuracy: Pallas osgemm kernels vs XLA formulation."""
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from gcge_tpu.ops.osgemm import os_gram, os_expand
from gcge_tpu.ops.osgemm_pallas import os_gram_pallas, os_expand_pallas

_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
def sync(out):
    for x in jax.tree.leaves(out):
        if hasattr(x, 'shape'):
            float(_sum(x)); return
def t(name, f, *a, reps=20, **kw):
    sync(f(*a, **kw))
    t0 = time.perf_counter()
    for _ in range(reps): sync(f(*a, **kw))
    print(f"{name:26s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

rng = np.random.default_rng(0)
n, p, q = 157464, 120, 10
a = jnp.asarray(rng.standard_normal((n, p)))
b = jnp.asarray(rng.standard_normal((n, q)))
c = jnp.asarray(rng.standard_normal((p, 100)))
t("sync_overhead", lambda x: x, b)
t("os_gram xla", os_gram, a, b)
t("os_gram pallas", os_gram_pallas, a, b)
t("os_expand xla", os_expand, a, c)
t("os_expand pallas", os_expand_pallas, a, c)
# accuracy vs numpy
ref = np.asarray(a).T @ np.asarray(b)
got = np.asarray(os_gram_pallas(a, b))
print("gram relerr:", np.max(np.abs(got-ref))/np.abs(ref).max())
ref2 = np.asarray(a) @ np.asarray(c)
got2 = np.asarray(os_expand_pallas(a, c))
print("expand relerr:", np.max(np.abs(got2-ref2))/np.abs(ref2).max())
# wider shapes (nev=200 regime)
p2, q2 = 480, 40
a2 = jnp.asarray(rng.standard_normal((n, p2)))
b2 = jnp.asarray(rng.standard_normal((n, q2)))
c2 = jnp.asarray(rng.standard_normal((p2, 400)))
t("os_gram xla 480x40", os_gram, a2, b2)
t("os_gram pallas 480x40", os_gram_pallas, a2, b2)
t("os_expand xla 480x400", os_expand, a2, c2)
t("os_expand pallas 480x400", os_expand_pallas, a2, c2)
