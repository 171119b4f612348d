"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md north star): wall-clock to 50 eigenpairs at
rel-residual 1e-8 on a SiO2-scale symmetric operator, one TPU chip, vs the
MEASURED reference.  SiO2 itself (SuiteSparse, n=155,331, nnz≈11.3M) is not
fetchable in this zero-egress image; the stand-in is a 3D 27-point Laplacian
on a 54^3 grid (n=157,464, nnz≈4.1M) — the same row-density regime as the
reference's benchmark family (``/root/reference/test/submit.sh:9-15``).

``vs_baseline`` is measured, not cited: ``native/ref_bench`` runs the
UNMODIFIED reference C library (GCG + CCS backend, netlib BLAS, serial — the
1-rank configuration of its rig) on the identical operator and production
parameters on this host.  The measurement is cached in
``BASELINE_MEASURED.json`` (it is a CPU-only number; re-run
``native/ref_bench -nx 54 -nev 50`` to refresh).  Both solvers converge in
the same ~60 iterations and agree on the eigenvalues to 11 digits, so the
ratio is a clean time-to-solution comparison.

Also reported on stderr: the SpMM kernel sweep (nnz/s per layout/precision,
with the scipy-CSR CPU rate for context).
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_3d27(nx: int):
    """3D 27-point Laplacian stencil on an nx^3 grid (COO, symmetric)."""
    n = nx ** 3
    idx = np.arange(n)
    i, j, k = idx // (nx * nx), (idx // nx) % nx, idx % nx
    rows, cols, vals = [], [], []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for dk in (-1, 0, 1):
                ii, jj, kk = i + di, j + dj, k + dk
                ok = (ii >= 0) & (ii < nx) & (jj >= 0) & (jj < nx) & (kk >= 0) & (kk < nx)
                w = 26.0 if (di == 0 and dj == 0 and dk == 0) else -1.0
                rows.append(idx[ok])
                cols.append((ii * nx * nx + jj * nx + kk)[ok])
                vals.append(np.full(ok.sum(), w))
    return (
        np.concatenate(rows),
        np.concatenate(cols),
        np.concatenate(vals),
        n,
    )


def reference_baseline(nx: int, nev: int) -> dict | None:
    """Measured reference wall time: cached json, else run native/ref_bench."""
    cache = os.path.join(REPO, "BASELINE_MEASURED.json")
    if os.path.exists(cache):
        with open(cache) as f:
            meta = json.load(f)
        if f"nx={nx}" in meta.get("problem", "") and f"nev={nev}" in meta.get(
            "parameters", ""
        ):
            return meta
    binary = os.path.join(REPO, "native", "ref_bench")
    try:
        if not os.path.exists(binary):
            subprocess.run(["make", "-s", "ref_bench"],
                           cwd=os.path.join(REPO, "native"), check=True,
                           capture_output=True, timeout=300)
        out = subprocess.run(
            [binary, "-nx", str(nx), "-nev", str(nev)],
            capture_output=True, text=True, timeout=3000, check=True,
        ).stdout
        for line in out.splitlines():
            if line.startswith("REF_BASELINE"):
                kv = dict(p.split("=") for p in line.split()[1:])
                return {"wall_s": float(kv["wall_s"]),
                        "num_iter": int(kv["numIter"]),
                        "nev_conv": int(kv["nevConv"])}
    except Exception as e:
        log(f"reference baseline unavailable: {e}")
    return None


def spmm_sweep(rows, cols, vals, n, nnz, bs, x_np):
    """Per-kernel SpMM throughput (stderr, informational)."""
    import jax
    import jax.numpy as jnp

    from gcge_tpu.ops.operators import DiaOperator, SparseOperator
    from gcge_tpu.ops.spmm_pallas import dia_spmm_pallas_t

    def chain_time(matvec, x, k=50):
        # norm-preserving chain: the iterate is rescaled to unit RMS every
        # step, so the kernel is always timed on full-range inputs.  (The
        # previous *0.001 decay underflowed f32 to denormals/zero within ~30
        # of the 50 chained iterations — the kernel was being timed on
        # degenerate inputs, which made the r01/r02 f32 numbers incomparable.)
        def body(i, y):
            z = matvec(y)
            return z * jax.lax.rsqrt(jnp.mean(jnp.square(z)) + 1e-30)
        g = jax.jit(lambda xx: jax.lax.fori_loop(0, k, body, xx))
        # On the tunneled runtime block_until_ready can return before the
        # device finishes (benchmarks/repeat_cache_probe.py) — a VALUE FETCH
        # is the only reliable completion barrier.  Subtract the measured
        # round-trip floor so the per-op cost is not inflated by it.
        fetch = lambda y: float(jnp.ravel(y)[0])
        fetch(g(x))
        t0 = time.perf_counter()
        fetch(x)
        floor = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(g(x))
        return max(time.perf_counter() - t0 - floor, 1e-9) / k

    results = {}
    for dt in ("float64", "float32"):
        x = jnp.asarray(x_np, dtype=dt)
        dia = DiaOperator.from_coo(rows, cols, vals, (n, n), dtype=jnp.dtype(dt))
        t = chain_time(dia.matvec, x)
        results[f"dia_{dt}"] = nnz * bs / t
        log(f"  DIA  {dt}: {t*1e3:.3f} ms -> {results[f'dia_{dt}']/1e9:.2f} Gnnz/s")
    x32 = jnp.asarray(x_np, jnp.float32)
    ell = SparseOperator.from_coo(rows, cols, vals, (n, n), dtype=jnp.float32)
    t = chain_time(ell.matvec, x32)
    results["ell_float32"] = nnz * bs / t
    log(f"  ELL  float32: {t*1e3:.3f} ms -> {results['ell_float32']/1e9:.2f} Gnnz/s")
    dia32 = DiaOperator.from_coo(rows, cols, vals, (n, n), dtype=jnp.float32)
    xt = jnp.asarray(x_np.T.copy(), jnp.float32)
    t = chain_time(lambda y: dia_spmm_pallas_t(dia32.values, dia32.offsets, y,
                                               interpret=False), xt)
    results["pallas_dia_f32"] = nnz * bs / t
    log(f"  Pallas DIA f32 (transposed): {t*1e3:.3f} ms -> "
        f"{results['pallas_dia_f32']/1e9:.2f} Gnnz/s")
    # df64 (double-f32) kernel: the f64-quality Pallas fast path
    from gcge_tpu.ops.operators import DiaDF64Operator

    dia64 = DiaOperator.from_coo(rows, cols, vals, (n, n))
    df = DiaDF64Operator.from_dia(dia64)
    xt64 = jnp.asarray(x_np.T.copy(), jnp.float64)
    t = chain_time(df.matvec_t, xt64)
    results["pallas_dia_df64"] = nnz * bs / t
    log(f"  Pallas DIA df64 (transposed): {t*1e3:.3f} ms -> "
        f"{results['pallas_dia_df64']/1e9:.2f} Gnnz/s")
    return results


def main():
    nx, nev, bs = 54, 50, 10

    log(f"building 3D 27-point Laplacian nx={nx} ...")
    rows, cols, vals, n = build_3d27(nx)
    nnz = len(vals)
    log(f"n={n} nnz={nnz}")

    # ---- scipy CPU SpMM rate (context) -----------------------------------
    import scipy.sparse as sps

    a_csr = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    x_np = np.random.default_rng(0).standard_normal((n, bs))
    a_csr @ x_np
    t0 = time.perf_counter()
    for _ in range(5):
        a_csr @ x_np
    cpu_dt = (time.perf_counter() - t0) / 5
    log(f"CPU scipy CSR SpMM (f64, bs={bs}): {cpu_dt*1e3:.2f} ms -> "
        f"{nnz * bs / cpu_dt / 1e9:.3f} Gnnz/s")

    # ---- measured reference baseline -------------------------------------
    ref = reference_baseline(nx, nev)
    if ref:
        log(f"reference GCG baseline (1 CPU core, serial C library): "
            f"{ref['wall_s']:.1f}s, {ref['num_iter']} iters, "
            f"nevConv={ref['nev_conv']}")

    # ---- TPU --------------------------------------------------------------
    import jax

    jax.config.update("jax_enable_x64", True)
    # persistent compile cache (the env var alone is not honored on this
    # runtime): repeat bench runs skip the ~60s fused-loop compile
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gcge_tpu.ops.operators import DiaOperator
    from gcge_tpu.solvers.gcg import GCGParams, gcg_solve

    log(f"device: {jax.devices()[0]}")

    spmm = spmm_sweep(rows, cols, vals, n, nnz, bs, x_np)

    # ---- headline: GCG wall-clock to nev eigenpairs at rel 1e-8 -----------
    # make_operator auto-selects the df64 double-f32 DIA on TPU: residual /
    # RR / orth matvecs then ride the Pallas kernel instead of XLA's f64
    # emulation
    from gcge_tpu.ops.operators import make_operator

    dia64 = make_operator(rows, cols, vals, (n, n))
    # cg_max_iter=30 matches the reference's compW_cg_max_iter budget
    # (test/submit.sh:18-19 uses 35-60; the driver default is 30); the mixed
    # path splits it into cg_refine f32 CG stages with f64 residual
    # refreshes between — 2 x 15 converges in FEWER outer iterations than
    # one 30-step f32 run (PERFORMANCE.md: the f32 iterate stalls past ~15
    # steps; the mid-solve f64 refresh restores progress).
    params = GCGParams(nev=nev, block_size=bs, max_iter=120, verbose=0,
                       cg_max_iter=30, fuse=20, cg_mixed=True, cg_refine=2,
                       cg_auto_shift=True)
    # label the first-call number honestly: with a populated on-disk cache
    # it measures cache-DESERIALIZATION, not compile cost — true cold
    # (empty cache) is profiled separately in benchmarks/cold_profile.py
    cache_dir = os.path.join(REPO, ".jax_cache")
    n_cached = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
    cold_kind = "cache-warm first call" if n_cached else "TRUE-cold first call"
    log(f"persistent compile cache: {n_cached} entries -> the next number "
        f"is a {cold_kind}")
    t0 = time.perf_counter()
    res = gcg_solve(dia64, None, params)
    cold = time.perf_counter() - t0
    log(f"TPU GCG nev={nev} {cold_kind} (one-time JIT compile, cached "
        f"persistently): {cold:.1f}s, {res.num_iter} iters, "
        f"nev_conv={res.nev_conv}")
    # steady state: compile amortized (persistent cache; the C reference's
    # analogous cost — gcc -O3 of the library — is likewise not timed)
    t0 = time.perf_counter()
    res = gcg_solve(dia64, None, params)
    wall = time.perf_counter() - t0
    log(f"TPU GCG nev={nev} steady-state: {wall:.1f}s, {res.num_iter} iters, "
        f"nev_conv={res.nev_conv}")

    converged = res.nev_conv >= nev
    vs = (ref["wall_s"] / wall) if (ref and converged) else 0.0
    print(json.dumps({
        "metric": "gcg_wall_s_50pairs_rel1e-8_157k",
        "value": wall,
        "unit": "s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
