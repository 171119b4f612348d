import os, time
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from gcge_tpu.ops.eighs import eigh_newton, eigh_jacobi, jacobi_polish

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
m = 120
# GCG-like projected matrix: diag-dominant with clusters
lam = np.sort(np.concatenate([np.repeat(np.linspace(0.1, 3.0, 40), 3)]))[:m]
u = np.linalg.qr(rng.standard_normal((m, m)))[0]
h = jnp.asarray(u @ np.diag(lam) @ u.T)
t("sync_overhead", lambda x: x, h)
t("eigh_jacobi(m=120)", jax.jit(lambda hh: eigh_jacobi(hh)[0]), h)
t("eigh_newton(m=120)", jax.jit(lambda hh: eigh_newton(hh)[0]), h)
# accuracy check
wj, uj = jax.jit(eigh_jacobi)(h)
wn, un = jax.jit(eigh_newton)(h)
hn = np.asarray(h)
for name, w_, u_ in (("jacobi", wj, uj), ("newton", wn, un)):
    w_, u_ = np.asarray(w_), np.asarray(u_)
    res = np.linalg.norm(hn @ u_ - u_ * w_[None, :], axis=0).max()
    orth = np.abs(u_.T @ u_ - np.eye(m)).max()
    print(f"{name}: max eigres {res:.2e} orth {orth:.2e} lam err {np.abs(w_-lam).max():.2e}")
