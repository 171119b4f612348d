"""Checkpoint / resume of eigensolver state.

The reference has NO checkpointing (SURVEY.md §5); the closest capability is
warm start: ``nevGiven`` initial vectors are accepted and orthonormalized
(``InitializeX``, ``ops_eig_sol_gcg.c:101-158``).  This module adds real
checkpointing as an improvement: converged eigenvalues + Ritz vectors go to a
single ``.npz``; resuming feeds them back as the warm start, which the restart
logic then treats exactly like the reference's re-entry path.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, result, params=None) -> None:
    """Persist a GCGResult (and optionally the params used)."""
    meta = {}
    if params is not None:
        import dataclasses

        meta = {
            k: v for k, v in dataclasses.asdict(params).items()
            if isinstance(v, (int, float, str, bool))
        }
    np.savez_compressed(
        path,
        eval=np.asarray(result.eval),
        evec=np.asarray(result.evec),
        nev_conv=np.asarray(result.nev_conv),
        num_iter=np.asarray(result.num_iter),
        params_json=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    )


def load_checkpoint(path: str):
    """Returns ``(eval, evec, nev_conv, params_dict)``; pass ``evec`` as
    ``x0=`` to :func:`gcge_tpu.solvers.gcg.gcg_solve` to resume."""
    with np.load(path) as z:
        eval_ = z["eval"]
        evec = jnp.asarray(z["evec"])
        nev_conv = int(z["nev_conv"])
        params = json.loads(bytes(z["params_json"].tobytes()).decode() or "{}")
    return eval_, evec, nev_conv, params
