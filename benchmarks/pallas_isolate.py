"""Isolate the slow component: peel-only, dot-only, full."""
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
def sync(out):
    for x in jax.tree.leaves(out):
        if hasattr(x, 'shape'):
            float(_sum(x)); return
def t(name, f, *a, reps=20, **kw):
    sync(f(*a, **kw))
    t0 = time.perf_counter()
    for _ in range(reps): sync(f(*a, **kw))
    print(f"{name:28s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

P, Q, NR = 128, 16, 1024
SP, SQ = 7*P, 7*Q
n = 157464
n_pad = -(-n // NR) * NR
G = n_pad // NR
rng = np.random.default_rng(0)
ahi = jnp.asarray(rng.standard_normal((P, n_pad)), jnp.float32)
alo = ahi * 1e-8
bhi = jnp.asarray(rng.standard_normal((Q, n_pad)), jnp.float32)
blo = bhi * 1e-8

def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)

def peel_stack(hi, lo, cat_ref, h):
    r = hi
    for k in range(3):
        u = jnp.float32(2.0 ** (-7 * (k + 1))); iu = jnp.float32(2.0 ** (7 * (k + 1)))
        s = jnp.round(r * iu) * u
        r = r - s
        cat_ref[k*h:(k+1)*h, :] = s.astype(jnp.bfloat16)
    r, rl = _two_sum(r, lo)
    for k in range(3, 7):
        u = jnp.float32(2.0 ** (-7 * (k + 1))); iu = jnp.float32(2.0 ** (7 * (k + 1)))
        s = jnp.round(r * iu) * u
        r = r - s
        if k == 4: r = r + rl
        cat_ref[k*h:(k+1)*h, :] = s.astype(jnp.bfloat16)

def make(mode):
    def kernel(ah, al, bh, bl, out, acat, bcat, acc):
        c = pl.program_id(0)
        @pl.when(c == 0)
        def _():
            acc[:] = jnp.zeros((SP, SQ), jnp.float32)
        if mode in ("peel", "full"):
            peel_stack(ah[:], al[:], acat, P)
            peel_stack(bh[:], bl[:], bcat, Q)
        else:
            acat[:P, :] = ah[:].astype(jnp.bfloat16)
            bcat[:Q, :] = bh[:].astype(jnp.bfloat16)
        if mode in ("dot", "full"):
            slab = jax.lax.dot_general(acat[:], bcat[:], (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            acc[:] = acc[:] + slab
        @pl.when(c == G - 1)
        def _():
            out[:] = acc[:]
    a_spec = pl.BlockSpec((P, NR), lambda c: (c*0, c), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((Q, NR), lambda c: (c*0, c), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((SP, SQ), lambda c: (c*0, c*0), memory_space=pltpu.VMEM)
    @jax.jit
    def run(ah, al, bh, bl):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SP, SQ), jnp.float32),
            grid=(G,),
            in_specs=[a_spec, a_spec, b_spec, b_spec],
            out_specs=o_spec,
            scratch_shapes=[pltpu.VMEM((SP, NR), jnp.bfloat16),
                            pltpu.VMEM((SQ, NR), jnp.bfloat16),
                            pltpu.VMEM((SP, SQ), jnp.float32)],
            interpret=False,
        )(ah, al, bh, bl)
    return run

t("loads_only", make("none"), ahi, alo, bhi, blo)
t("peel_only", make("peel"), ahi, alo, bhi, blo)
t("dot_only", make("dot"), ahi, alo, bhi, blo)
t("full", make("full"), ahi, alo, bhi, blo)
