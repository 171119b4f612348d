"""Worker for the real 2-process distributed test (tests/test_multiproc.py).

Each process: bootstrap jax.distributed on CPU (2 virtual devices per
process -> 4-device global mesh), build its LOCAL row block of a 1D
Laplacian in DIA layout (no process ever holds the global matrix —
``multihost.dia_from_host_blocks``), run the distributed GCG, and have
process 0 write the eigenvalues to the output file.

This is the asserting analogue of the reference's 2-rank MPI smoke test
(``/root/reference/test/test_mpi_type.c:1-60``) — but through the full
eigensolver rather than a datatype round-trip.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from gcge_tpu.parallel.multihost import (bootstrap, dia_from_host_blocks,  # noqa: E402
                                         hybrid_row_mesh)
from gcge_tpu.solvers.gcg import GCGParams, gcg_solve  # noqa: E402

me, total = bootstrap(coordinator_address=f"localhost:{port}",
                      num_processes=nproc, process_id=pid)
assert total == nproc, f"process_count {total} != {nproc}"
assert jax.device_count() == 2 * nproc, jax.devices()

n = 256
h = 1.0 / (n + 1)
n_local = n // nproc
vals = np.zeros((3, n_local))
vals[0, :] = -1.0 / h          # offset -1
vals[1, :] = 2.0 / h           # main
vals[2, :] = -1.0 / h          # offset +1
if pid == 0:
    vals[0, 0] = 0.0           # global row 0 has no left neighbor
if pid == nproc - 1:
    vals[2, -1] = 0.0          # global row n-1 has no right neighbor

mesh = hybrid_row_mesh()
op = dia_from_host_blocks(mesh, vals, (-1, 0, 1), n_global=n)
params = GCGParams(nev=4, block_size=2, max_iter=80, verbose=0,
                   cg_max_iter=40)
res = gcg_solve(op, None, params, mesh=mesh)

if pid == 0:
    np.save(out_path, np.asarray(res.eval)[: params.nev])
print(f"[worker {pid}] nev_conv={res.nev_conv} iters={res.num_iter}",
      flush=True)
assert res.nev_conv >= params.nev
