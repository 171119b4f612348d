"""Exact-product sliced GEMM (ops.osgemm) accuracy tests.

The scheme must reproduce f64 matmuls to ~2^-46 relative-to-column-scale on
the distributions GCG produces: unit-norm orthonormal-ish columns,
correlated columns (Gram diagonals — the case that breaks plain f32), wide
per-column dynamic range, and huge-amplification W blocks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gcge_tpu.ops.osgemm import os_expand_xla, os_gram_xla, slice_planes


def _rel_err(approx, exact, scale=None):
    approx, exact = np.asarray(approx), np.asarray(exact)
    s = scale if scale is not None else max(np.abs(exact).max(), 1e-300)
    return np.abs(approx - exact).max() / s


def test_slice_planes_reconstruct(rng):
    a = rng.standard_normal((300, 7)) * np.exp(rng.uniform(-8, 8, (300, 7)))
    slices, sigma = slice_planes(jnp.asarray(a))
    rec = np.zeros_like(a)
    for k in range(slices.shape[0]):
        rec += np.asarray(slices[k], np.float64)
    rec *= np.asarray(sigma, np.float64)[None, :]
    # reconstruction to the scheme floor (the single f32 rounding of
    # hi_rest + lo: ~2^-46 relative to the column scale)
    err = np.abs(rec - a).max(axis=0) / np.abs(a).max(axis=0)
    assert err.max() < 5e-14, err.max()


def test_gram_random(rng):
    a = rng.standard_normal((5000, 11))
    b = rng.standard_normal((5000, 4))
    got = os_gram_xla(jnp.asarray(a), jnp.asarray(b))
    exact = a.T @ b
    assert _rel_err(got, exact) < 1e-12


def test_gram_correlated_diagonal(rng):
    """x^T x diagonals — the measured f32/TPU failure mode (no cancellation,
    long positive accumulation)."""
    x = rng.standard_normal((200_000, 3))
    x /= np.linalg.norm(x, axis=0)
    got = np.asarray(os_gram_xla(jnp.asarray(x), jnp.asarray(x)))
    exact = x.T @ x
    assert _rel_err(np.diag(got), np.diag(exact), scale=1.0) < 1e-13


def test_gram_near_orthonormal(rng):
    """Orthonormal basis Gram: off-diagonals ~1e-15 ABSOLUTE must not be
    polluted above ~1e-13 (this is what basis-orthonormality checks see)."""
    q, _ = np.linalg.qr(rng.standard_normal((20_000, 12)))
    got = np.asarray(os_gram_xla(jnp.asarray(q), jnp.asarray(q)))
    assert np.abs(got - np.eye(12)).max() < 1e-13


def test_gram_wide_dynamic_range(rng):
    """Columns spanning 12 decades; per-column scaling must hold accuracy
    relative to each column pair's own scale."""
    n = 30_000
    a = rng.standard_normal((n, 6)) * np.logspace(-9, 3, 6)[None, :]
    b = rng.standard_normal((n, 5)) * np.logspace(3, -9, 5)[None, :]
    got = np.asarray(os_gram_xla(jnp.asarray(a), jnp.asarray(b)))
    exact = a.T @ b
    sa = np.abs(a).max(axis=0)
    sb = np.abs(b).max(axis=0)
    rel = np.abs(got - exact) / (n * sa[:, None] * sb[None, :])
    assert rel.max() < 1e-13, rel.max()


def test_gram_amplified_w_block(rng):
    """GCG's auto-shifted W: a huge common component plus a ~1e-8-relative
    informative correction.  The projection coefficient must come out
    accurately enough that the correction survives (this is exactly where
    plain f32 failed end-to-end)."""
    n = 100_000
    x = rng.standard_normal((n, 1))
    x /= np.linalg.norm(x)
    corr = rng.standard_normal((n, 1))
    corr -= x * (x.T @ corr)
    corr /= np.linalg.norm(corr)
    w = 1e8 * x + corr
    coef = np.asarray(os_gram_xla(jnp.asarray(x), jnp.asarray(w)))
    exact = x.T @ w
    assert abs(coef[0, 0] - exact[0, 0]) < 1e-6   # 1e8 * 1e-14
    rem = w - x * coef
    # the correction must survive the projection essentially intact
    assert abs(rem[:, 0] @ corr[:, 0] - 1.0) < 1e-5


def test_expand_random(rng):
    a = rng.standard_normal((40_000, 120))
    c = rng.standard_normal((120, 30))
    got = os_expand_xla(jnp.asarray(a), jnp.asarray(c))
    exact = a @ c
    assert _rel_err(got, exact) < 1e-12


def test_expand_orthonormal_recombine(rng):
    """The Ritz-vector recombination case: V (orthonormal) @ C (orthonormal
    small) — the result must stay orthonormal to the f64 floor."""
    v, _ = np.linalg.qr(rng.standard_normal((20_000, 40)))
    cmat, _ = np.linalg.qr(rng.standard_normal((40, 40)))
    got = np.asarray(os_expand_xla(jnp.asarray(v), jnp.asarray(cmat)))
    g = got.T @ got
    assert np.abs(g - np.eye(40)).max() < 1e-12


def test_production_paths_match_reference(rng):
    """os_gram/os_expand (fat-einsum / multi-dot production forms) must
    agree with the per-pair reference formulations at the scheme floor."""
    from gcge_tpu.ops.osgemm import os_expand, os_gram

    a = rng.standard_normal((7000, 13)) * np.logspace(-3, 2, 13)[None, :]
    b = rng.standard_normal((7000, 6))
    g1 = np.asarray(os_gram(jnp.asarray(a), jnp.asarray(b)))
    exact = a.T @ b
    sa = np.abs(a).max(axis=0)
    sb = np.abs(b).max(axis=0)
    rel = np.abs(g1 - exact) / (7000 * sa[:, None] * sb[None, :])
    assert rel.max() < 1e-13, rel.max()

    v, _ = np.linalg.qr(rng.standard_normal((9000, 40)))
    cmat, _ = np.linalg.qr(rng.standard_normal((40, 40)))
    e1 = np.asarray(os_expand(jnp.asarray(v), jnp.asarray(cmat)))
    g = e1.T @ e1
    assert np.abs(g - np.eye(40)).max() < 1e-12
    assert np.abs(e1 - v @ cmat).max() < 1e-14


def test_os_gram_pallas_matches_oracle(rng):
    """Fused Pallas kernel (interpret mode off-TPU) vs the XLA oracle and
    numpy f64, across p-blocking and row-padding edges."""
    from gcge_tpu.ops.osgemm_pallas import os_gram_pallas

    for (n, p, q) in [(1500, 120, 10), (1030, 200, 40), (999, 7, 3)]:
        a = rng.standard_normal((n, p)) * np.exp(rng.uniform(-8, 8, (1, p)))
        b = rng.standard_normal((n, q)) * np.exp(rng.uniform(-8, 8, (1, q)))
        ref = a.T @ b
        got = np.asarray(os_gram_pallas(jnp.asarray(a), jnp.asarray(b),
                                        interpret=True))
        scale = (np.linalg.norm(a, axis=0)[:, None]
                 * np.linalg.norm(b, axis=0)[None, :]) + 1e-300
        assert np.max(np.abs(got - ref) / scale) < 5e-14


def test_os_expand_pallas_matches_oracle(rng):
    from gcge_tpu.ops.osgemm_pallas import os_expand_pallas

    for (n, k, q) in [(1500, 120, 100), (1030, 512, 17), (999, 9, 3)]:
        a = rng.standard_normal((n, k)) * np.exp(rng.uniform(-6, 6, (n, 1)))
        c = rng.standard_normal((k, q)) * np.exp(rng.uniform(-6, 6, (1, q)))
        ref = a @ c
        got = np.asarray(os_expand_pallas(jnp.asarray(a), jnp.asarray(c),
                                          interpret=True))
        scale = (np.abs(a).max(1)[:, None] * np.abs(c).max(0)[None, :]) * k \
            + 1e-300
        assert np.max(np.abs(got - ref) / scale) < 5e-14


def test_os_pallas_zero_and_tiny_columns(rng):
    """Zero columns (scale clip) and denormal-ish magnitudes survive."""
    from gcge_tpu.ops.osgemm_pallas import os_expand_pallas, os_gram_pallas

    n = 700
    a = rng.standard_normal((n, 6))
    a[:, 2] = 0.0
    a[:, 4] *= 1e-30
    b = rng.standard_normal((n, 4))
    b[:, 1] = 0.0
    ref = a.T @ b
    got = np.asarray(os_gram_pallas(jnp.asarray(a), jnp.asarray(b),
                                    interpret=True))
    assert np.max(np.abs(got - ref)) < 1e-12 * np.abs(ref).max()
    c = rng.standard_normal((6, 5))
    c[:, 3] = 0.0
    ref2 = a @ c
    got2 = np.asarray(os_expand_pallas(jnp.asarray(a), jnp.asarray(c),
                                       interpret=True))
    assert np.max(np.abs(got2 - ref2)) < 1e-12 * np.abs(ref2).max()


def test_os_pallas_wide_blocks(rng):
    """Wide shapes that exceed a single kernel block: the square
    InitializeX Gram (p = q = 400) and the wide Ritz recombination
    (q = 400) — the exact configs that blew scoped VMEM at nev=200."""
    from gcge_tpu.ops.osgemm_pallas import os_expand_pallas, os_gram_pallas

    n = 900
    a = rng.standard_normal((n, 400))
    b = rng.standard_normal((n, 400))
    ref = a.T @ b
    got = np.asarray(os_gram_pallas(jnp.asarray(a), jnp.asarray(b),
                                    interpret=True))
    scale = (np.linalg.norm(a, axis=0)[:, None]
             * np.linalg.norm(b, axis=0)[None, :]) + 1e-300
    assert np.max(np.abs(got - ref) / scale) < 5e-14
    k = 480
    a2 = rng.standard_normal((n, k))
    c2 = rng.standard_normal((k, 400))
    ref2 = a2 @ c2
    got2 = np.asarray(os_expand_pallas(jnp.asarray(a2), jnp.asarray(c2),
                                       interpret=True))
    scale2 = (np.abs(a2).max(1)[:, None] * np.abs(c2).max(0)[None, :]) * k \
        + 1e-300
    assert np.max(np.abs(got2 - ref2) / scale2) < 5e-14
