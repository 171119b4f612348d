import os, time
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from gcge_tpu.ops.eighs import eigh as eigh_impl, jacobi_polish, eigh_jacobi

_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
def sync(out):
    for x in jax.tree.leaves(out):
        if hasattr(x, 'shape'):
            float(_sum(x)); return
def t(name, f, *a, reps=10, **kw):
    sync(f(*a, **kw))
    t0 = time.perf_counter()
    for _ in range(reps): sync(f(*a, **kw))
    print(f"{name:30s} {(time.perf_counter()-t0)/reps*1e3:8.1f} ms")

rng = np.random.default_rng(0)
base_h = {}
for m in (10, 120):
    h = rng.standard_normal((m, m)); h = 0.5*(h+h.T)
    base_h[m] = jnp.asarray(h)

t("sync_overhead", lambda x: x, base_h[10])
for m in (10, 120):
    h = base_h[m]
    t(f"xla_eigh f64 m={m}", jax.jit(lambda hh: jnp.linalg.eigh(hh)[0]), h)
    t(f"xla_eigh f32 m={m}", jax.jit(lambda hh: jnp.linalg.eigh(hh.astype(jnp.float32))[0]), h)
    t(f"eigh_jacobi(auto path) m={m}", jax.jit(lambda hh: eigh_impl(hh, "auto")[0]), h)
    # warm-started: polish from近 eigenvectors (use exact then perturb H)
    w0, u0 = np.linalg.eigh(np.asarray(h))
    hp = h + 1e-3*jnp.asarray(0.5*(lambda r: r+r.T)(rng.standard_normal((m,m))))
    t(f"jacobi_polish(warm) m={m}", jax.jit(lambda hh,w,u: jacobi_polish(hh, w, u, sweeps=3)[0]),
      hp, jnp.asarray(w0), jnp.asarray(u0))
