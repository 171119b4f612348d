"""Test configuration: CPU backend with 8 virtual devices, f64 enabled.

Mirrors the reference's approach of testing distributed behavior without a
cluster — here an 8-device host-platform mesh stands in for a TPU slice.
"""

import os

# The image forces JAX_PLATFORMS=axon (tunneled TPU with remote compile);
# tests run on the local CPU backend with 8 virtual devices by default, so
# hard override — setdefault is not enough.  Set GCGE_TEST_TPU=1 to run the
# single-device tests against the real TPU instead (distributed tests
# requiring 8 devices will be skipped there).
_USE_TPU = os.environ.get("GCGE_TEST_TPU", "") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NO persistent compile cache for the test suite.  Three full-suite runs
# died inside the cache layer (observed 2026-08-20): SIGSEGV deserializing
# an entry truncated by a timed-out run (get_executable_and_time), and
# SIGABRT serializing a large eigh_newton executable fresh
# (put_executable_and_time) — both in test_stress's many-variant compiles.
# CPU test compiles are cheap; stability wins.  Production/bench runs keep
# their own .jax_cache (TPU keys, different processes).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def laplacian_1d(n: int, h: float | None = None):
    """1D Laplacian (tridiag 2/h, -1/h) — the reference's CCS test operator
    (``/root/reference/test/test_app_ccs.c:142-184``) with analytic spectrum
    lam_k = (2/h) * (1 - cos(k*pi*h)), h = 1/(n+1)."""
    h = h or 1.0 / (n + 1)
    main = np.full(n, 2.0 / h)
    off = np.full(n - 1, -1.0 / h)
    a = np.diag(main) + np.diag(off, 1) + np.diag(off, -1)
    return a, h


def laplacian_1d_eigs(n: int, h: float | None = None):
    h = h or 1.0 / (n + 1)
    k = np.arange(1, n + 1)
    return (2.0 / h) * (1.0 - np.cos(k * np.pi * h))
