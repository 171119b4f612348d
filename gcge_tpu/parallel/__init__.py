from gcge_tpu.parallel.mesh import row_mesh, shard_rows, replicate, pad_problem
from gcge_tpu.parallel.dist_ops import RowShardedOperator, shard_operator

__all__ = [
    "row_mesh",
    "shard_rows",
    "replicate",
    "pad_problem",
    "RowShardedOperator",
    "shard_operator",
]
