"""Real multi-PROCESS distributed test: two jax.distributed CPU processes on
localhost solving one problem through per-process ingestion + distributed
GCG, validated against the analytic spectrum.

The reference's counterpart is the 2-rank MPI smoke test
(``/root/reference/test/test_mpi_type.c:1-60``) run via ``mpiexec``; here the
launcher is plain ``subprocess`` + a coordinator port, exercising
``multihost.bootstrap`` / ``dia_from_host_blocks`` / cross-process
collectives for real (the rest of the suite runs single-process on a
virtual mesh).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import laplacian_1d_eigs


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(os.environ.get("GCGE_SKIP_MULTIPROC", "") == "1",
                    reason="multi-process test disabled by env")
def test_two_process_distributed_gcg(tmp_path):
    port = _free_port()
    out = tmp_path / "eigs.npy"
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", worker, str(pid), "2", str(port), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.join(os.path.dirname(__file__), ".."))
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            o, _ = p.communicate(timeout=900)
            outs.append(o)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out\n" + "\n".join(outs))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    lam = np.load(out)
    exact = laplacian_1d_eigs(256)[:4]
    np.testing.assert_allclose(lam, exact, rtol=1e-8)
