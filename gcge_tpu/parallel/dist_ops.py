"""Row-sharded operators: explicit shard_map SpMM over the mesh.

The reference's distributed SpMM (PHG backend, ``app_phg.c:292-359``) scatters
the needed halo of x, runs the local SpMM, and accumulates off-process rows —
point-to-point halo exchange overlapped with compute.  On a TPU mesh the
bandwidth-optimal first cut is simpler: ``all_gather`` the (thin) multivector
over ICI once, then each device SpMMs its local row block against the global
x.  For x of shape (n, bs) with bs = O(block_size) this moves n*bs values per
device per matvec — the same volume a halo scheme moves in the worst case —
and it pipelines with the local gather-FMA work inside one fused XLA region.
A Pallas halo/overlap kernel is the planned upgrade for matrices whose
ELL column footprint is narrow (see ops/spmm_pallas.py).

``RowShardedOperator`` wraps any inner operator whose arrays are row-sharded;
``matvec`` runs under ``shard_map`` so collectives are explicit and the inner
computation uses only local shards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gcge_tpu.ops.operators import (
    DenseOperator,
    DiagOperator,
    IdentityOperator,
    LinearOperator,
    SparseOperator,
)
from gcge_tpu.parallel.mesh import ROWS, shard_rows


@jax.tree_util.register_pytree_node_class
class RowShardedOperator(LinearOperator):
    """Operator with rows sharded over the ``"rows"`` mesh axis.

    ``inner`` holds row-sharded arrays (values/indices for sparse, the row
    block for dense).  ``matvec`` all-gathers the input multivector over the
    mesh axis and applies the local row block — the explicit-collective
    equivalent of the reference's row-partitioned backends (SURVEY.md §2).
    """

    def __init__(self, inner: LinearOperator, mesh: Mesh):
        self.inner = inner
        self.mesh = mesh

    @property
    def shape(self):
        return self.inner.shape

    @property
    def dtype(self):
        return self.inner.dtype

    def matvec(self, x):
        inner = self.inner

        if isinstance(inner, (DiagOperator, IdentityOperator)):
            # purely local — no communication needed
            return inner.matvec(x)

        if isinstance(inner, SparseOperator):
            n_cols = inner.n_cols

            def f(values, indices, x_local):
                xg = jax.lax.all_gather(x_local, ROWS, axis=0, tiled=True)
                local = SparseOperator(values, indices, n_cols)
                return local.matvec(xg)

            return shard_map(
                f,
                mesh=self.mesh,
                in_specs=(P(ROWS, None), P(ROWS, None), P(ROWS, None)),
                out_specs=P(ROWS, None),
                check_vma=False,
            )(inner.values, inner.indices, x)

        if isinstance(inner, DenseOperator):

            def f(a_local, x_local):
                xg = jax.lax.all_gather(x_local, ROWS, axis=0, tiled=True)
                return a_local @ xg

            return shard_map(
                f,
                mesh=self.mesh,
                in_specs=(P(ROWS, None), P(ROWS, None)),
                out_specs=P(ROWS, None),
                check_vma=False,
            )(inner.a, x)

        raise NotImplementedError(type(inner))

    def tree_flatten(self):
        return (self.inner,), (self.mesh,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


def shard_operator(op: LinearOperator, mesh: Mesh) -> LinearOperator:
    """Row-shard an operator's storage and wrap it for mesh execution."""
    if op is None:
        return None
    if isinstance(op, SparseOperator):
        inner = SparseOperator(
            shard_rows(mesh, op.values), shard_rows(mesh, op.indices), op.n_cols
        )
    elif isinstance(op, DenseOperator):
        inner = DenseOperator(shard_rows(mesh, op.a))
    elif isinstance(op, DiagOperator):
        inner = DiagOperator(shard_rows(mesh, op.d))
    elif isinstance(op, IdentityOperator):
        inner = op
    else:
        raise NotImplementedError(type(op))
    return RowShardedOperator(inner, mesh)
