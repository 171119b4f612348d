from gcge_tpu.solvers.bpcg import BlockPCGParams, block_pcg
from gcge_tpu.solvers.gcg import GCGParams, GCGResult, gcg_solve
from gcge_tpu.solvers.orth import orth_against, orth_block, mgs_orth

__all__ = [
    "BlockPCGParams",
    "block_pcg",
    "GCGParams",
    "GCGResult",
    "gcg_solve",
    "orth_against",
    "orth_block",
    "mgs_orth",
]
