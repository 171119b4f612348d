import os, time
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from bench import build_3d27
from gcge_tpu.ops.operators import make_operator, DiaDF64Operator
from gcge_tpu.solvers.bpcg import BlockPCGParams, block_pcg_t
from gcge_tpu.solvers.orth import orth_block_against, orth_within
from gcge_tpu.ops.spmm_pallas import dia_spmm_pallas_t

rows, cols, vals, n = build_3d27(54)
a_op = make_operator(rows, cols, vals, (n, n))
size_x, bs = 100, 10
rng = np.random.default_rng(0)
q = jnp.asarray(np.linalg.qr(rng.standard_normal((n, size_x+bs)))[0])
w0 = jnp.asarray(rng.standard_normal((n, bs)))
rt = jnp.asarray(rng.standard_normal((bs, n)), jnp.float32)
a32 = a_op.values_hi
offs = a_op.offsets
cgp = BlockPCGParams(max_iter=15, rate=1e-2, tol=1e-14, tol_type="abs")
def mv32_t(yt):
    return dia_spmm_pallas_t(a32, offs, yt, interpret=False)
cg_run = jax.jit(lambda r: block_pcg_t(mv32_t, r, jnp.zeros_like(r), cgp)[0])

_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
def sync(out):
    for x in jax.tree.leaves(out):
        if hasattr(x, 'shape'):
            float(_sum(x)); return
def t(name, f, *a, reps=10, **kw):
    sync(f(*a, **kw))
    t0 = time.perf_counter()
    for _ in range(reps): sync(f(*a, **kw))
    dt = (time.perf_counter()-t0)/reps*1e3
    print(f"{name:28s} {dt:8.1f} ms")
    return dt

base = t("sync_overhead", lambda x: x, w0)
t("cg_15steps_f32_pallas", cg_run, rt)
t("orth_against_osgemm_p2", jax.jit(lambda w,qq: orth_block_against(w, qq, None, zero_tol=1e-13, passes=2, method="evp", precision="osgemm")), w0, q)
t("orth_against_osgemm_p1", jax.jit(lambda w,qq: orth_block_against(w, qq, None, zero_tol=1e-13, passes=1, method="evp", precision="osgemm")), w0, q)
t("orth_within_evp", jax.jit(lambda w: orth_within(w, None, zero_tol=1e-13, passes=2, method="evp")), w0)
t("amatvec_df64_bs10", jax.jit(lambda x: a_op.matvec(x)), w0)
