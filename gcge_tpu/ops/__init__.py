from gcge_tpu.ops.eighs import eigh, eigh_jacobi, jacobi_polish
from gcge_tpu.ops.multivec import (
    axpby,
    block_inner,
    col_dots,
    gram,
    linear_comb,
    qtap,
    set_random,
)
from gcge_tpu.ops.operators import (
    DenseOperator,
    DiaOperator,
    DiagOperator,
    HybridOperator,
    IdentityOperator,
    LinearOperator,
    ShiftedOperator,
    SparseOperator,
    make_operator,
)

__all__ = [
    "eigh",
    "eigh_jacobi",
    "jacobi_polish",
    "col_dots",
    "gram",
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
    "DiaOperator",
    "HybridOperator",
    "make_operator",
]
