"""A/B: hoisted per-tile x-split vs baseline df64 DIA kernel (round 4).

The roofline accounting (PERFORMANCE.md) charges the kernel ~26 VPU
ops/nnz of which ~4 are the per-diagonal Dekker split of the x operand;
``hoist=True`` computes the split once per tile into VMEM scratch
(bit-identical results, tests/test_spmm_pallas).  An earlier hoist
formulation hit a Mosaic compile wall, so each variant compiles under its
own wall-clock log line — if `hoist` stalls, kill and keep the baseline.
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

from bench import build_3d27
from gcge_tpu.ops import spmm_pallas as SP
from gcge_tpu.ops.operators import DiaOperator

rows, cols, vals, n = build_3d27(54)
dia = DiaOperator.from_coo(rows, cols, vals, (n, n))
vhi, vlo = SP.split_df32(dia.values)
offs = dia.offsets
nnz = len(vals)
rng = np.random.default_rng(0)
_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

for bs in (10, 24, 40):
    xt = jnp.asarray(rng.standard_normal((bs, n)))
    for hoist in (False, True):
        fn = jax.jit(lambda x, h=hoist: SP.dia_spmm_pallas_t_df64(
            vhi, vlo, offs, x, hoist=h))
        t0 = time.perf_counter()
        y0 = fn(xt); float(_sum(y0))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(30):
            y = fn(xt)
        float(_sum(y))
        dt = (time.perf_counter() - t0) / 30
        print(f"bs={bs:3d} hoist={int(hoist)}  first={t_compile:6.1f}s  "
              f"{dt*1e3:7.3f} ms  {nnz/dt/1e9:6.1f} Gnnz/s", flush=True)
        if hoist:
            d = np.max(np.abs(np.asarray(y0) - np.asarray(jax.jit(
                lambda x: SP.dia_spmm_pallas_t_df64(vhi, vlo, offs, x,
                                                    hoist=False))(xt))))
            print(f"        |hoist - base| = {d:.2e}", flush=True)
