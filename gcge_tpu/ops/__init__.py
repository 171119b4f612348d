from gcge_tpu.ops.multivec import (
    axpby,
    block_inner,
    linear_comb,
    qtap,
    set_random,
)
from gcge_tpu.ops.operators import (
    DenseOperator,
    DiagOperator,
    IdentityOperator,
    LinearOperator,
    ShiftedOperator,
    SparseOperator,
)

__all__ = [
    "axpby",
    "block_inner",
    "linear_comb",
    "qtap",
    "set_random",
    "LinearOperator",
    "DenseOperator",
    "DiagOperator",
    "IdentityOperator",
    "ShiftedOperator",
    "SparseOperator",
]
