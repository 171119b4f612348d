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


# --------------------------------------------------------------------------
# Leak tracking — the memwatch parity piece.
#
# The reference's memwatch records every malloc with its file:line and
# reports the ones never freed (``test/memwatch.c``).  The JAX analogue of
# "never freed" is a device buffer created inside a region that is still
# alive after it — typically a solver caching an array on ``self``, a
# module-level cache growing per call, or a jit constant pinned by a closure.
# ``LeakTracker`` diffs the live-array census by object identity between
# marks and reports the survivors grouped by (shape, dtype); ``leak_check``
# is the test-facing wrapper that runs a callable twice and asserts the
# SECOND call creates no net-new live buffers (the first call may
# legitimately populate caches — exactly how memwatch runs are read).
# --------------------------------------------------------------------------


@dataclass
class LeakReport:
    """Survivors of a tracked region, grouped by (shape, dtype)."""

    new_arrays: int
    new_bytes: int
    groups: dict  # (shape, dtype) -> (count, bytes)

    def __str__(self):
        if not self.new_arrays:
            return "[leaktracker] clean: no surviving device allocations"
        lines = [
            f"[leaktracker] {self.new_arrays} surviving arrays "
            f"({self.new_bytes / 2**20:.2f} MiB):"
        ]
        for (shape, dtype), (cnt, nbytes) in sorted(
                self.groups.items(), key=lambda kv: -kv[1][1]):
            lines.append(f"  {cnt:4d} x {dtype}{list(shape)}  "
                         f"{nbytes / 2**20:8.2f} MiB")
        return "\n".join(lines)


class LeakTracker:
    """Identity-diff leak tracker over the live jax.Array census.

    >>> lt = LeakTracker()
    >>> lt.start()
    >>> ... run the region ...
    >>> report = lt.stop()     # arrays created in the region, still alive
    """

    def __init__(self, device=None):
        self.device = device
        self._before_ids: set | None = None

    def _live(self):
        import jax

        device = self.device or jax.devices()[0]
        return [a for a in jax.live_arrays()
                if any(d == device for d in a.devices())]

    def start(self):
        self._before_ids = {id(a) for a in self._live()}
        return self

    def stop(self) -> LeakReport:
        assert self._before_ids is not None, "start() first"
        survivors = [a for a in self._live() if id(a) not in self._before_ids]
        groups: dict = {}
        for a in survivors:
            key = (tuple(a.shape), str(a.dtype))
            cnt, nbytes = groups.get(key, (0, 0))
            groups[key] = (cnt + 1, nbytes + a.nbytes)
        self._before_ids = None
        return LeakReport(
            new_arrays=len(survivors),
            new_bytes=sum(a.nbytes for a in survivors),
            groups=groups,
        )


def leak_check(fn, *args, allow_bytes: int = 0, **kwargs):
    """Assert that a steady-state call of ``fn`` leaks no device memory.

    Runs ``fn`` once un-tracked (populating jit caches, persistent-compile
    entries, operator-held constants — all legitimate one-time residents),
    then again under :class:`LeakTracker` while dropping the first call's
    result, and raises ``AssertionError`` with the grouped survivor report
    if the second call leaves more than ``allow_bytes`` of net-new live
    buffers behind.  This is the reference's memwatch workflow (run, read
    the unfreed-block report) recast for a runtime with garbage collection:
    growth per *steady-state* call is what an iterative solver must not
    have.
    """
    import gc

    result = fn(*args, **kwargs)
    del result
    gc.collect()
    lt = LeakTracker()
    lt.start()
    result = fn(*args, **kwargs)
    del result
    gc.collect()
    report = lt.stop()
    if report.new_bytes > allow_bytes:
        raise AssertionError(str(report))
    return report
