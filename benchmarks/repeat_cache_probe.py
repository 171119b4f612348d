"""Probe: does the axon runtime cache (executable, inputs) -> results?

Symptom: repeat-same-input timings of jitted programs (eigh_newton at
m=480, osgemm grams) measure ~0.1 ms where the contained work is seconds.
If identical-input re-executions return cached buffers, every
"steady-state" number measured by re-running on the SAME inputs is
invalid; honest steady-state timing must use fresh inputs per call.
"""
import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


@jax.jit
def chain(x):
    for _ in range(100):
        x = x @ x * (0.5 / 2048.0) + x
    return x


rng = np.random.default_rng(0)
xs = [jnp.asarray(rng.standard_normal((2048, 2048)), jnp.float32)
      for _ in range(4)]

jax.block_until_ready(chain(xs[0]))          # compile + first exec

t0 = time.perf_counter()
for _ in range(3):
    jax.block_until_ready(chain(xs[0]))      # REPEAT same input
rep = (time.perf_counter() - t0) / 3

t0 = time.perf_counter()
for x in xs[1:]:
    jax.block_until_ready(chain(x))          # FRESH inputs
fresh = (time.perf_counter() - t0) / 3

t0 = time.perf_counter()
for _ in range(3):
    jax.block_until_ready(chain(xs[1]))      # repeat of a previous fresh one
rep2 = (time.perf_counter() - t0) / 3

print(f"repeat-same-input: {rep*1e3:9.2f} ms")
print(f"fresh-inputs:      {fresh*1e3:9.2f} ms")
print(f"repeat-after-seen: {rep2*1e3:9.2f} ms")
print("RESULT-CACHING" if rep < 0.3 * fresh else "no result caching detected")
