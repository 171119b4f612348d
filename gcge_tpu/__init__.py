"""gcge_tpu — a TPU-native (JAX/XLA/Pallas) sparse eigensolver framework.

Computes the smallest ``nev`` eigenpairs of large symmetric (generalized)
eigenproblems ``A x = lambda B x`` with the GCG algorithm — a block damping
inverse-power iteration on the subspace ``V = [X, P, W]`` — re-designed
TPU-first:

* multivectors are plain ``jnp`` arrays of shape ``(n, m)`` (possibly sharded
  over a device mesh), every block op is a pure jittable function;
* all solver state is static-shape: convergence, rank deflation and the
  X/P/W bookkeeping of the reference (``/root/reference/src/ops_eig_sol_gcg.c``)
  are expressed with masks and counts instead of shrinking arrays;
* distribution is row-partitioning over a ``jax.sharding.Mesh`` with
  ``shard_map`` + ``psum``/``all_gather`` collectives (the TPU analogue of the
  reference's MPI row-blocks + ``MPI_Allreduce``);
* hot kernels (SpMM, fused QtAP) have Pallas implementations for f32 and
  XLA fallbacks for f64 (XLA:TPU emulates f64 in double-word f32).

The reference's OPS vtable (``/root/reference/src/ops.h:43-152``) maps to a
small ``LinearOperator`` protocol plus the functional multivector ops in
``gcge_tpu.ops``.
"""

from gcge_tpu.ops.operators import (
    DenseOperator,
    DiagOperator,
    IdentityOperator,
    LinearOperator,
    ShiftedOperator,
    SparseOperator,
)
from gcge_tpu.api import eigsh, solve
from gcge_tpu.ops.operators import (DiaDF64Operator, DiaOperator,
                                    FunctionOperator, make_operator)
from gcge_tpu.solvers.gcg import GCGParams, GCGResult, gcg_solve
from gcge_tpu.solvers.bpcg import BlockPCGParams, block_pcg, pcg
from gcge_tpu.solvers.orth import bgs_orth, orth_block, orth_against

__version__ = "0.1.0"

__all__ = [
    "LinearOperator",
    "DenseOperator",
    "DiagOperator",
    "FunctionOperator",
    "DiaDF64Operator",
    "DiaOperator",
    "IdentityOperator",
    "ShiftedOperator",
    "SparseOperator",
    "make_operator",
    "GCGParams",
    "GCGResult",
    "gcg_solve",
    "solve",
    "eigsh",
    "BlockPCGParams",
    "block_pcg",
    "pcg",
    "bgs_orth",
    "orth_block",
    "orth_against",
]
