from gcge_tpu.parallel.mesh import (
    grid_mesh,
    mv_spec,
    pad_problem,
    replicate,
    row_mesh,
    shard_mv,
    shard_rows,
)
from gcge_tpu.parallel.dist_ops import RowShardedOperator, shard_operator
from gcge_tpu.parallel.dist_mg import (ProlongOperator, RestrictOperator,
                                       shard_hierarchy)
from gcge_tpu.parallel.multihost import (
    bootstrap,
    dia_from_host_blocks,
    ell_from_host_blocks,
    hybrid_row_mesh,
    mv_from_host_blocks,
)

__all__ = [
    "row_mesh",
    "grid_mesh",
    "mv_spec",
    "shard_rows",
    "shard_mv",
    "replicate",
    "pad_problem",
    "RowShardedOperator",
    "shard_operator",
    "shard_hierarchy",
    "ProlongOperator",
    "RestrictOperator",
    "bootstrap",
    "hybrid_row_mesh",
    "mv_from_host_blocks",
    "dia_from_host_blocks",
    "ell_from_host_blocks",
]
