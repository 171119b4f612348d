"""Device/host memory observability.

The reference tracks host allocations with the bundled memwatch library
(``/root/reference/test/memwatch.{c,h}``, enabled by ``OPS_USE_MEMWATCH``,
``test/main.c:28-30``) — a leak tracker for hand-managed C memory.  Under
JAX there is no manual free to forget, but the analogous operational
questions remain: how much HBM do the solver workspaces pin, and does a
solve leak live buffers between iterations?  This module answers both from
the PJRT runtime.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class MemSnapshot:
    bytes_in_use: int | None
    peak_bytes_in_use: int | None
    bytes_limit: int | None
    num_live_arrays: int
    live_array_bytes: int

    def __str__(self):
        def fmt(b):
            return "n/a" if b is None else f"{b / 2**20:.1f} MiB"

        return (
            f"in_use={fmt(self.bytes_in_use)} peak={fmt(self.peak_bytes_in_use)} "
            f"limit={fmt(self.bytes_limit)} live_arrays={self.num_live_arrays} "
            f"({fmt(self.live_array_bytes)})"
        )


def snapshot(device=None) -> MemSnapshot:
    """Current device memory use: PJRT allocator stats (when the platform
    exposes them) plus a census of live jax.Arrays on the device."""
    import jax

    device = device or jax.devices()[0]
    stats = {}
    try:
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    live = [
        a
        for a in jax.live_arrays()
        if any(d == device for d in a.devices())
    ]
    return MemSnapshot(
        bytes_in_use=stats.get("bytes_in_use"),
        peak_bytes_in_use=stats.get("peak_bytes_in_use"),
        bytes_limit=stats.get("bytes_limit"),
        num_live_arrays=len(live),
        live_array_bytes=sum(a.nbytes for a in live),
    )


def workspace_bytes(n: int, nev: int, block_size: int = 0, nev_max: int = 0,
                    dtype_bytes: int = 8) -> int:
    """Predicted GCG workspace footprint, the analogue of the reference's
    workspace sizing formulas (``ops_eig_sol_gcg.c:1624-1656``): the basis
    ``V (n, sizeX+2bs)``, the Ritz block, and the block-CG triple ``(x,r,p)``
    on the active window."""
    bs = block_size or max(nev // 5, 1)
    size_x = nev_max or 2 * nev
    m = size_x + 2 * bs
    v = n * m
    ritz = n * size_x
    cg = 4 * n * bs
    return (v + ritz + cg) * dtype_bytes


class MemWatch:
    """Context manager printing the memory delta of a region.

    >>> with MemWatch("gcg solve"):
    ...     gcg_solve(a, b, params)
    """

    def __init__(self, label: str = "", device=None, printer=print):
        self.label = label
        self.device = device
        self.printer = printer

    def __enter__(self):
        self.before = snapshot(self.device)
        return self

    def __exit__(self, *exc):
        after = snapshot(self.device)
        d_live = after.live_array_bytes - self.before.live_array_bytes
        d_cnt = after.num_live_arrays - self.before.num_live_arrays
        self.printer(
            f"[memwatch] {self.label}: live {d_cnt:+d} arrays "
            f"({d_live / 2**20:+.1f} MiB); now {after}"
        )
        return False
