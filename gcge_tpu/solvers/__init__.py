from gcge_tpu.solvers.bpcg import BlockPCGParams, block_pcg
from gcge_tpu.solvers.gcg import GCGParams, GCGResult, gcg_solve
from gcge_tpu.solvers.multigrid import (
    MGHierarchy,
    MGLevel,
    bamg_preconditioner,
    bamg_solve,
    build_hierarchy,
    chebyshev_smooth,
    multivec_from_i_to_j,
)
from gcge_tpu.solvers.orth import bgs_orth, mgs_orth, orth_against, orth_block
from gcge_tpu.solvers.pas import AugmentedOperator, PASResult, pas_solve

__all__ = [
    "BlockPCGParams",
    "block_pcg",
    "GCGParams",
    "GCGResult",
    "gcg_solve",
    "MGHierarchy",
    "MGLevel",
    "bamg_preconditioner",
    "bamg_solve",
    "build_hierarchy",
    "chebyshev_smooth",
    "multivec_from_i_to_j",
    "orth_against",
    "orth_block",
    "bgs_orth",
    "mgs_orth",
    "AugmentedOperator",
    "PASResult",
    "pas_solve",
]
