import os, time
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from bench import build_3d27
from gcge_tpu.ops.operators import make_operator
from gcge_tpu.solvers import gcg as G
from gcge_tpu.solvers.bpcg import BlockPCGParams

rows, cols, vals, n = build_3d27(54)
a_op = make_operator(rows, cols, vals, (n, n))
size_x, bs = 100, 10
m = size_x + 2*bs
rng = np.random.default_rng(0)
v = jnp.asarray(np.linalg.qr(rng.standard_normal((n, m)))[0])
ritz = v[:, :size_x]
ss_eval = jnp.asarray(np.linspace(0.1, 3.0, m))
ss_evec = jnp.asarray(np.linalg.qr(rng.standard_normal((m, m)))[0])
h = jnp.asarray(rng.standard_normal((m, m))); h = 0.5*(h+h.T)
act_idx = jnp.arange(bs, dtype=jnp.int32)
act_cnt = jnp.int32(bs)
h_pp = jnp.asarray(rng.standard_normal((bs, bs))); h_pp = 0.5*(h_pp+h_pp.T)
cg = BlockPCGParams(max_iter=30, rate=1e-2, tol=1e-14, tol_type="abs")
sigma = jnp.asarray(-0.1)

def leaf(o):
    return [x for x in jax.tree.leaves(o) if hasattr(x, 'shape')][0]

def t(name, f, *a, reps=5, **kw):
    out = f(*a, **kw); np.asarray(leaf(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a, **kw)
        np.asarray(leaf(out))
    print(f"{name:24s} {(time.perf_counter()-t0)/reps*1e3:8.1f} ms")

t("residual_norms(cw=20)", G._residual_norms, a_op, None, v[:, :size_x], ss_eval, jnp.int32(0), size_x, 20)
t("compute_p", G._compute_p, v, ss_evec, h, act_idx, act_cnt, size_x, bs, 1e-13, 2, "evp", "osgemm")
t("set_x", G._set_x, v, ritz, size_x)
t("compute_w(mixed 2x15)", G._compute_w, a_op, None, v, ritz, ss_eval, act_idx, act_cnt, sigma,
  size_x, bs, cg, 1e-13, 2, 1, None, True, 2, None, "evp", "osgemm")
t("rayleigh_ritz", G._rayleigh_ritz, a_op, v, h_pp, ss_eval, act_cnt, act_cnt, size_x, bs, "auto", "osgemm")
from gcge_tpu.ops.osgemm import os_gram, os_expand
from gcge_tpu.ops.eighs import eigh as eigh_impl
aw = a_op.matvec(v[:, size_x+bs:])
t("  os_gram(v,aw)", os_gram, v, aw)
t("  eigh_jacobi(120)", jax.jit(lambda hh: eigh_impl(hh, "auto")), h)
t("  os_expand(v,c100)", os_expand, v, ss_evec[:, :size_x])
