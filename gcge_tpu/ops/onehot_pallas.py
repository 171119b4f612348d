"""Windowed one-hot MXU SpMM — the gather-free irregular-matrix kernel.

The problem: on TPU, irregular sparse x dense (the reference's CCS SpMM,
``/root/reference/app/app_ccs.c:50-139``) has no hardware gather.  XLA's
row-gather ELL formulation is LATENCY-bound at ~5 ns per gathered row —
measured 0.06 Gnnz/s on a production irregular FEM matrix (n=250k, 16
nnz/row, RCM bandwidth 8.3k; benchmarks/irregular.py) — and Mosaic exposes
no in-kernel gather at all.

The TPU-native answer: turn the gather into MXU matmuls against ONE-HOT
selection matrices, windowed so the one-hots stay small and VMEM-resident:

* tile rows into blocks of R; tile columns into windows of W;
* every nonzero (r, c, v) belongs to one (row-tile, window) PAIR; pairs
  hold at most J nonzeros (bigger pairs split);
* per pair, build in-kernel (VPU iota-compare, never materialized in HBM):
    - ``Q[w, j] = (cloc[j] == w)``      (W, J) column selector
    - ``P[j, r] = (rloc[j] == r)``      (J, R) row scatterer
  and accumulate ``y_t += ((x_w @ Q) * val) @ P`` — two MXU contractions
  (W-deep and J-deep), zero gathers, zero scatters.

Layout is TRANSPOSED (grid index on lanes): x and y are ``(bs, n)``, the
native layout of the Pallas DIA kernels and the transposed inner-CG loop
(``solvers/bpcg.block_pcg_t``), so the hot consumer pays no transposes.

Cost model: per nonzero ``(W + R) * bs / fill`` MACs (fill = mean pair
occupancy J_actual/J) — compute-bound on the MXU instead of latency-bound
on the scalar gather unit.  At bs=40, W=R=256 that is ~30k MACs/nnz, i.e.
~1.5-2 Gnnz/s on a v5e — 20-30x the measured gather path.

Pair metadata rides PrefetchScalarGridSpec: the (t, w) ids are
scalar-prefetched and drive the x-window / y-tile BlockSpec index maps
(the megablox block-sparse pattern).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _onehot_mask(ids, shape, dim: int, mask_mode: str):
    """Build a one-hot bf16 matrix ``M[a, b] = (iota[dim] == ids)``.

    ``mask_mode``:

    * ``'f32'`` — i32 iota compare, f32 select, pack to bf16 (3 vreg passes
      over f32-density registers).  The original form: a direct bf16 select
      on the i1 mask of an f32/i32 compare hits a Mosaic relayout it cannot
      do ((8,128) i1 tiling -> (16,128) bf16).
    * ``'bf16'`` — compare AND select entirely in bf16: the iota and the ids
      are exact in bf16 (window/tile offsets < 2^8 <= 256, and bf16 holds
      integers to 2^8 exactly), the i1 mask is born in the (16,128) bf16
      tiling, and the select needs no relayout.  Half the vector registers
      per element -> the construction (the measured bottleneck of the
      kernel, ~60% at production shapes) runs ~2-3x cheaper.

    ``ids`` is (J,); ``dim`` is the iota dimension the ids broadcast
    against (0 -> ids along columns, 1 -> ids along rows)."""
    if mask_mode == "bf16":
        # tpu.iota only produces integer vectors — build i32 and convert
        # (the convert is loop-invariant across a grid step's pairs, so
        # CSE pays it once; the compare + select then run at bf16 register
        # density)
        iota = jax.lax.broadcasted_iota(
            jnp.int32, shape, dim).astype(jnp.bfloat16)
        idb = ids.astype(jnp.bfloat16)
        idb = idb[None, :] if dim == 0 else idb[:, None]
        return jnp.where(iota == idb, jnp.bfloat16(1), jnp.bfloat16(0))
    iota = jax.lax.broadcasted_iota(jnp.int32, shape, dim)
    idi = ids[None, :] if dim == 0 else ids[:, None]
    return jnp.where(iota == idi, jnp.float32(1.0),
                     jnp.float32(0.0)).astype(jnp.bfloat16)


def _pack_groups(rows, cols, n, r_tile: int, w_tile: int, j_max: int):
    """Shared group analysis: sort COO by (tile, window) and chunk to j_max.

    Returns the sort ``order`` plus per-group metadata; used by both the
    cheap :func:`pack_onehot_stats` estimator and the full packer."""
    rows = np.asarray(rows); cols = np.asarray(cols)
    n_pad = _round_up(n, max(r_tile, w_tile))
    t = rows // r_tile
    w = cols // w_tile
    order = np.lexsort((cols, w, t))
    t, w = t[order], w[order]
    key = t.astype(np.int64) * (n_pad // w_tile + 1) + w
    new_grp = np.r_[True, key[1:] != key[:-1]]
    grp_start = np.flatnonzero(new_grp)
    grp_len = np.diff(np.r_[grp_start, len(key)])
    # every row tile needs >= 1 pair or its output block is never visited
    # (and so never zero-initialized): an all-padded dummy pair per empty
    # tile is appended by the packer
    n_tiles = n_pad // r_tile
    empty_tiles = np.setdiff1d(np.arange(n_tiles), t[grp_start])
    n_chunks = -(-grp_len // j_max)
    P = int(n_chunks.sum()) + len(empty_tiles)
    return order, t, w, grp_start, grp_len, n_chunks, empty_tiles, n_pad, P


def pack_onehot_stats(rows, cols, n, r_tile: int = 256, w_tile: int = 256,
                      j_max: int = 128) -> dict:
    """Pair count / fill WITHOUT allocating the (P, j_max) pair arrays.

    ``make_operator`` consults this before committing to the one-hot layout:
    for scattered patterns (no RCM, wide bandwidth) P approaches nnz and the
    pair arrays would cost many GB while the kernel's cost model
    (``(W + R) * bs / fill`` MACs per nnz) collapses — the gather path must
    stay the default there."""
    *_, n_pad, P = _pack_groups(rows, cols, n, r_tile, w_tile, j_max)
    fill = len(np.asarray(rows)) / max(P * j_max, 1)
    bytes_pairs = P * j_max * 12 + P * 8
    return {"pairs": P, "fill": fill, "bytes": bytes_pairs, "n_pad": n_pad}


def pack_onehot(rows, cols, vals, n, r_tile: int = 256, w_tile: int = 256,
                j_max: int = 128):
    """Host-side packing of COO triplets into one-hot pair blocks.

    Returns ``(t_ids, w_ids, rloc, cloc, pvals, pvals_lo, n_pad, stats)``
    with pairs sorted by row tile (so the kernel's output accumulation is
    sequential per tile) then by window (so x windows stream monotonically
    within a tile).  Oversized (t, w) groups are split into multiple pairs.
    ``pvals + pvals_lo`` is the double-f32 split of the f64 values (48-bit
    effective mantissa); the f32 kernel uses ``pvals`` alone, the df64
    kernel both planes.  Fully vectorized (one fancy-indexed scatter per
    array — production matrices have millions of groups, a Python loop took
    minutes).
    """
    vals64 = np.asarray(vals, np.float64)
    vhi = vals64.astype(np.float32)
    vlo = (vals64 - vhi.astype(np.float64)).astype(np.float32)
    (order, t, w, grp_start, grp_len, n_chunks, empty_tiles, n_pad,
     P) = _pack_groups(rows, cols, n, r_tile, w_tile, j_max)
    rows = np.asarray(rows)[order]
    cols = np.asarray(cols)[order]
    vhi, vlo = vhi[order], vlo[order]
    nnz = len(vhi)
    # per-nnz pair index + slot: position within group, chunked by j_max
    grp_id = np.repeat(np.arange(len(grp_len)), grp_len)
    pos = np.arange(nnz) - grp_start[grp_id]
    pair_base = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
    pair_of = (pair_base[grp_id] + pos // j_max).astype(np.int64)
    slot = (pos % j_max).astype(np.int64)
    n_real = int(n_chunks.sum())
    t_ids = np.zeros(P, np.int32)
    w_ids = np.zeros(P, np.int32)
    rloc = np.zeros((P, j_max), np.int32)
    cloc = np.zeros((P, j_max), np.int32)
    pvals = np.zeros((P, j_max), np.float32)
    pvals_lo = np.zeros((P, j_max), np.float32)
    t_ids[pair_of] = t
    w_ids[pair_of] = w
    rloc[pair_of, slot] = rows - t * r_tile
    cloc[pair_of, slot] = cols - w * w_tile
    # padded slots keep (0, 0, 0.0): they select x[w*W] into row 0 with
    # weight 0 — exact no-ops
    pvals[pair_of, slot] = vhi
    pvals_lo[pair_of, slot] = vlo
    t_ids[n_real:] = empty_tiles
    # keep pairs sorted by tile after appending the dummies
    order_p = np.argsort(t_ids, kind="stable")
    t_ids, w_ids = t_ids[order_p], w_ids[order_p]
    rloc, cloc = rloc[order_p], cloc[order_p]
    pvals, pvals_lo = pvals[order_p], pvals_lo[order_p]
    # pad the pair count to a multiple of 8 HERE (the kernels fetch pair
    # rows in (8, J) blocks): a per-call pad inside the jitted kernel is a
    # full copy of the pair arrays (~250 MB/call at production sizes).
    # Padding rows MUST carry the LAST tile id — a 0 tile id would trip the
    # kernel's is_first test and wipe tile 0's accumulated output; their
    # zero values then contribute exact no-ops.
    P8 = _round_up(P, 8)
    if P8 != P:
        t_ids = np.concatenate([t_ids, np.full(P8 - P, t_ids[-1], np.int32)])
        w_ids = np.concatenate([w_ids, np.full(P8 - P, w_ids[-1], np.int32)])
        zpad = np.zeros((P8 - P, j_max), np.float32)
        rloc = np.concatenate([rloc, zpad.astype(np.int32)])
        cloc = np.concatenate([cloc, zpad.astype(np.int32)])
        pvals = np.concatenate([pvals, zpad])
        pvals_lo = np.concatenate([pvals_lo, zpad])
    fill = nnz / max(P * j_max, 1)
    stats = {"pairs": P, "fill": fill,
             "tiles": int(np.unique(t_ids[:P]).size)}
    return t_ids, w_ids, rloc, cloc, pvals, pvals_lo, n_pad, stats


_BF16_MASK_OK: list = []   # memoized capability probe result


def _bf16_mask_supported() -> bool:
    """One-time probe: can Mosaic lower a bf16 iota-compare-select?

    The bf16 mask form relies on bf16 broadcasted_iota + eq + select all
    lowering on the current backend; if any of them is rejected the probe
    fails once (cheap tiny kernel) and every kernel silently falls back to
    the proven f32 form rather than failing at production shapes."""
    if _BF16_MASK_OK:
        return _BF16_MASK_OK[0]
    if jax.default_backend() != "tpu":
        _BF16_MASK_OK.append(True)     # interpret mode: plain jnp semantics
        return True
    try:
        from jax.experimental import pallas as pl

        def k(ids_ref, o_ref):
            o_ref[:] = _onehot_mask(ids_ref[0, :], (8, 128), 0, "bf16")

        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16),
        )(jnp.zeros((8, 128), jnp.int32).at[0, :].set(
            jnp.arange(128, dtype=jnp.int32) % 8))
        ok = bool(jnp.sum(out) == 128)
        _BF16_MASK_OK.append(ok)
    except Exception:
        _BF16_MASK_OK.append(False)
    return _BF16_MASK_OK[0]


def _resolve_mask_mode(r_tile: int, w_tile: int) -> str:
    """Pick the one-hot construction form (see :func:`_onehot_mask`).

    bf16 compares are only exact for integer ids < 2^8, so tiles wider than
    256 fall back to the f32 form.  ``GCGE_ONEHOT_MASK`` forces a mode."""
    forced = os.environ.get("GCGE_ONEHOT_MASK", "")
    if forced in ("f32", "bf16"):
        return forced
    if max(r_tile, w_tile) > 256:
        return "f32"
    return "bf16" if _bf16_mask_supported() else "f32"


@functools.partial(jax.jit, static_argnames=(
    "r_tile", "w_tile", "n_pad", "interpret", "group", "mask_mode"))
def _onehot_spmm_t(t_ids, w_ids, rloc, cloc, pvals, xt,
                   r_tile: int, w_tile: int, n_pad: int, interpret: bool,
                   group: int = 1, mask_mode: str = "f32"):
    """Transposed one-hot SpMM: ``xt (bs, n_pad) -> y (bs, n_pad)`` f32.

    ``group`` > 1 processes that many consecutive pairs per grid step (the
    pack must come through :func:`regroup_pairs`, so a step's pairs share
    one output tile): the per-step fixed cost (DMA issue, scalar fetches,
    accumulator branch) measured ~0.3 us/step dominates the production
    matrix at group=1 — P~32k steps ~ 8 of the 15 ms.  The G selections
    stay per-pair matmuls (each needs its own x window); the G scatters
    fuse into ONE (3*bs_pad, G*J) @ (G*J, R) contraction.
    """
    P, J = rloc.shape
    if not interpret:
        assert J % 128 == 0, f"TPU lane constraint: j_max {J} % 128 != 0"
    assert 8 % group == 0, f"group={group} must divide 8"
    assert P % group == 0, f"pair count {P} not grouped (use regroup_pairs)"
    bs = xt.shape[0]
    sub = 8
    bs_pad = _round_up(max(bs, sub), sub)
    xt_p = jnp.zeros((bs_pad, n_pad), jnp.float32).at[:bs].set(
        xt.astype(jnp.float32))
    # pair arrays are fetched in (8, J) blocks (TPU sublane constraint —
    # (1, J) blocks are rejected); the kernel reads its pair's row p % 8.
    # pack_onehot pre-pads P to a multiple of 8 (per-call padding copies
    # the whole pair set); pad here only for hand-built pair sets.
    P8 = _round_up(P, 8)
    if P8 == P:
        rloc8, cloc8, pvals8 = rloc, cloc, pvals
    else:
        def pad8(a):
            return jnp.zeros((P8, J), a.dtype).at[:P].set(a)

        rloc8, cloc8, pvals8 = pad8(rloc), pad8(cloc), pad8(pvals)
        # the scalar-prefetch id arrays must be padded alongside: the grid
        # runs P8 // G steps and indexes t_ids/w_ids up to P8-1.  Padding
        # rows carry the LAST ids (a 0 tile id would trip is_first and wipe
        # tile 0); their zero values contribute exact no-ops.
        t_ids = jnp.concatenate(
            [t_ids, jnp.broadcast_to(t_ids[-1], (P8 - P,))])
        w_ids = jnp.concatenate(
            [w_ids, jnp.broadcast_to(w_ids[-1], (P8 - P,))])

    G = group

    def kernel(t_ref, w_ref, rloc_ref, cloc_ref, val_ref, *refs):
        x_refs, o_ref = refs[:G], refs[G]
        s = pl.program_id(0)
        base = s * jnp.int32(G)
        is_first = jnp.logical_or(
            base == 0, t_ref[base] != t_ref[jnp.maximum(base - 1, 0)])

        @pl.when(is_first)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        g_planes = []   # per pair: (3*bs_pad, J) bf16 planes of g
        pms = []        # per pair: (J, R) bf16 scatter one-hot
        for g in range(G):
            # stay in i32: a python-int operand promotes to i64 under x64
            # and Mosaic's convert lowering recurses on 64-bit ints
            r = jax.lax.rem(base + jnp.int32(g), jnp.int32(8))
            cl = cloc_ref[r, :]                               # (J,)
            rl = rloc_ref[r, :]
            vl = val_ref[r, :]
            q = _onehot_mask(cl, (w_tile, J), 0, mask_mode)   # (W, J)
            # precision via exact bf16 plane splits instead of HIGHEST
            # matmuls — see the module docstring cost model.  Planes are
            # STACKED along M into one (3*bs_pad, W) selection matmul and
            # one (3*bs_pad, G*J) scatter matmul; recombination order is
            # identical to per-plane dots (bit-identical results).
            h1, h2, h3 = _bf16_planes3(x_refs[g][:])
            hs = jnp.concatenate([h1, h2, h3], axis=0)        # (3*bs, W)
            gs = jnp.dot(hs, q, preferred_element_type=jnp.float32)
            gg = (gs[:bs_pad] + gs[bs_pad:2 * bs_pad]) + gs[2 * bs_pad:]
            gg = gg * vl[None, :]                             # (bs, J)
            g1, g2, g3 = _bf16_planes3(gg)
            g_planes.append(jnp.concatenate([g1, g2, g3], axis=0))
            pms.append(_onehot_mask(rl, (J, r_tile), 1, mask_mode))  # (J, R)
        gp = g_planes[0] if G == 1 else jnp.concatenate(g_planes, axis=1)
        pm = pms[0] if G == 1 else jnp.concatenate(pms, axis=0)  # (G*J, R)
        ys = jnp.dot(gp, pm, preferred_element_type=jnp.float32)
        o_ref[:] += (ys[:bs_pad] + ys[bs_pad:2 * bs_pad]) + ys[2 * bs_pad:]

    def xspec(g):
        return pl.BlockSpec(
            (bs_pad, w_tile),
            lambda p, t, w, g=g: (p * 0, w[p * jnp.int32(G) + jnp.int32(g)]),
            memory_space=pltpu.VMEM)

    pair_spec = pl.BlockSpec(
        (8, J),
        lambda p, t, w: (jax.lax.div(p * jnp.int32(G), jnp.int32(8)), p * 0),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P8 // G,),
        # index maps: all-i32 arithmetic (python-int operands promote to i64
        # under x64, which Mosaic cannot lower); zero = p * 0 keeps one
        # consistent integer type across the returned tuple
        in_specs=[pair_spec, pair_spec, pair_spec]
        + [xspec(g) for g in range(G)],
        out_specs=pl.BlockSpec(
            (bs_pad, r_tile),
            lambda p, t, w: (p * 0, t[p * jnp.int32(G)]),
            memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bs_pad, n_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=72 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * J * 3 * (w_tile + r_tile) * bs_pad,
            bytes_accessed=P * J * 12 + 2 * bs_pad * n_pad * 4,
            transcendentals=0,
        ),
    )(t_ids, w_ids, rloc8, cloc8, pvals8, *([xt_p] * G))
    return out[:bs]


# --------------------------------------------------------------------------
# df64 one-hot kernel — full f64-quality SpMM for irregular matrices.
#
# The f32 kernel above serves the mixed-CG inner stages; the ACCURACY-critical
# A-applications (residual checks near rel-tol 1e-8, the Rayleigh-Ritz W-Gram,
# the initial RR, the mixed-CG f64 residual refreshes) need ~2^-40 relative
# accuracy, which a plain f32 MXU pipeline cannot give: the scatter matmul's
# f32 accumulator rounds at 2^-24 of the row scale, so a residual of 1e-8
# relative cannot even be RESOLVED.  Without this kernel those applications
# ran the gather-ELL path at 0.03 Gnnz/s — ~1500x below the banded Pallas
# kernels and the single biggest irregular-matrix gap (VERDICT round 2).
#
# The df64 scheme keeps the selection/scatter MXU structure but makes every
# stage either exact or error-compensated:
#
# 1. SELECTION is exact by construction: each output of ``x_plane @ Q`` is a
#    SINGLE product ``x * 1``.  x (f64 = hi + lo f32 planes) enters as five
#    bf16 planes — the exact bf16 triple split of x_hi (24 mantissa bits =
#    3 x 8) plus a two-plane split of x_lo — each contracted against a bf16
#    one-hot Q in ONE MXU pass and recombined on the VPU: the selected value
#    is reproduced to 2^-48 relative.
# 2. PRODUCTS ``v * x`` run on the VPU as Dekker two-products plus the
#    hi*lo cross terms — error ~2^-48, never touching the MXU.
# 3. The SCATTER SUM (the J-deep contraction against P) is where f32
#    accumulation would round at 2^-24: it is replaced by Ozaki-style
#    BLOCK-NORMALIZED INTEGER SLICES.  Per multivector row, the product
#    plane g is peeled into K=6 slices ``c_k = round(rem / scale_k)`` with
#    per-row power-of-two scales: the c_k are integers <= 2^8 (exact in
#    bf16), their products against the 0/1 P are exact, and every partial
#    sum in the MXU's f32 accumulator is an integer < 2^24 — the contraction
#    is EXACT, slice by slice.  Peeling uses only exact ops (power-of-two
#    divides, Sterbenz subtractions, two-sums), so after 6 slices the
#    un-scattered remainder is < 2^-43 of the row scale.
# 4. Slice results and cross-pair accumulation combine by two-sums into a
#    (hi, lo) output pair, reconstructed to f64 outside.
#
# Cost model (stacked form; bs_pad = bs rounded to 8): per nonzero the MXU
# does  bs_pad*(5*W + slices*R)/fill  bf16 MACs (selection is W-deep x 5
# planes, scatter J-deep x `slices` integer planes; fill = mean pair
# occupancy).  The planes/slices are stacked along M into TWO matmuls —
# (5*bs_pad, W) @ (W, J) and (slices*bs_pad, J) @ (J, R) — so the MXU row
# utilization is min(5*bs_pad, 128)/128 ~ 62% at the production block size
# instead of 12.5% for per-plane dots (the f32 kernel stacks to (3*bs_pad)
# rows the same way).  At W=R=256, bs=10, fill~0.5 that is ~90k MACs/nnz:
# roofline ~1.1 Gnnz/s at full utilization on a v5e, vs 0.03-0.16 for the
# gather path this replaces.  HBM traffic (pair metadata 16 B/nnz/fill + x
# windows) sits far below the MXU time — the kernel is compute-bound, and
# the levers are fill (tile/j_max choice) and M-row utilization.
# --------------------------------------------------------------------------


def _two_sum32(a, b):
    """Knuth branch-free two-sum in f32 (a + b = s + err exactly)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _two_prod32(a, b):
    """Dekker two-product in f32 (split at 12 bits): a*b = p + err exactly."""
    p = a * b
    c = jnp.float32(4097.0) * a
    a_hi = c - (c - a)
    a_lo = a - a_hi
    c = jnp.float32(4097.0) * b
    b_hi = c - (c - b)
    b_lo = b - b_hi
    err = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, err


def _bf16_planes3(x):
    """Exact bf16 triple split of f32 (24 mantissa bits = 3 x 8)."""
    b1 = x.astype(jnp.bfloat16)
    r = x - b1.astype(jnp.float32)
    b2 = r.astype(jnp.bfloat16)
    b3 = (r - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    return b1, b2, b3


@functools.partial(jax.jit, static_argnames=(
    "r_tile", "w_tile", "n_pad", "slices", "interpret", "group",
    "mask_mode"))
def _onehot_spmm_t_df64(t_ids, w_ids, rloc, cloc, vhi, vlo, xhi, xlo,
                        r_tile: int, w_tile: int, n_pad: int, slices: int,
                        interpret: bool, group: int = 1,
                        mask_mode: str = "f32"):
    """df64 transposed one-hot SpMM: ``x = xhi + xlo (bs, n_pad) f32 planes
    -> (y_hi, y_lo) f32 planes`` with ``y_hi + y_lo ~ (A @ x)^T`` to ~2^-40
    relative of the per-row scale.  ``group`` as in :func:`_onehot_spmm_t`
    (pairs must come through :func:`regroup_pairs`); the slice scale is
    shared across a step's pairs (rowmax over the concatenated products),
    which keeps every contraction exact (integer partial sums
    < G*J*2^8 < 2^24) and the remainder bound at 2^(-7*slices) of the
    STEP's row scale — the same error class relative to the accumulated
    row result."""
    P, J = rloc.shape
    if not interpret:
        assert J % 128 == 0, f"TPU lane constraint: j_max {J} % 128 != 0"
    assert 8 % group == 0, f"group={group} must divide 8"
    G = group
    bs = xhi.shape[0]
    sub = 8
    bs_pad = _round_up(max(bs, sub), sub)

    def padx(x):
        return jnp.zeros((bs_pad, n_pad), jnp.float32).at[:bs].set(x)

    xhi_p, xlo_p = padx(xhi), padx(xlo)
    P8 = _round_up(P, 8)
    if P8 == P:
        rloc8, cloc8, vhi8, vlo8 = rloc, cloc, vhi, vlo
    else:
        def pad8(a):
            return jnp.zeros((P8, J), a.dtype).at[:P].set(a)

        rloc8, cloc8 = pad8(rloc), pad8(cloc)
        vhi8, vlo8 = pad8(vhi), pad8(vlo)
        # pad the scalar-prefetch ids alongside (grid indexes up to P8-1);
        # last-id padding keeps is_first from wiping tile 0
        t_ids = jnp.concatenate(
            [t_ids, jnp.broadcast_to(t_ids[-1], (P8 - P,))])
        w_ids = jnp.concatenate(
            [w_ids, jnp.broadcast_to(w_ids[-1], (P8 - P,))])

    def kernel(t_ref, w_ref, rloc_ref, cloc_ref, vh_ref, vl_ref, *refs):
        xh_refs, xl_refs = refs[:G], refs[G:2 * G]
        ohi_ref, olo_ref = refs[2 * G], refs[2 * G + 1]
        base = pl.program_id(0) * jnp.int32(G)
        is_first = jnp.logical_or(
            base == 0, t_ref[base] != t_ref[jnp.maximum(base - 1, 0)])

        @pl.when(is_first)
        def _():
            ohi_ref[:] = jnp.zeros_like(ohi_ref)
            olo_ref[:] = jnp.zeros_like(olo_ref)

        # one-hot construction: see _onehot_mask — 'f32' compares in
        # i32/f32 and packs to bf16 (the i1->bf16 select relayout Mosaic
        # cannot do is avoided by selecting in f32); 'bf16' compares in
        # bf16 directly (exact for ids < 2^8) on half the registers
        ghis, glos, pms = [], [], []
        for g in range(G):
          r = jax.lax.rem(base + jnp.int32(g), jnp.int32(8))
          cl = cloc_ref[r, :]
          rl = rloc_ref[r, :]
          vh = vh_ref[r, :]
          vl = vl_ref[r, :]
          q = _onehot_mask(cl, (w_tile, J), 0, mask_mode)     # (W, J) bf16

          # exact selection: x_hi via its exact bf16 triple, x_lo via a
          # two-plane split (error 2^-24 |x_lo| ~ 2^-48 |x|).  All five
          # planes are STACKED along M and issued as ONE (5*bs_pad, W) @
          # (W, J) matmul: separate plane dots use bs_pad/128 of the MXU's
          # rows (12.5% at the production block size); the stacked form
          # recovers 5x of that without changing a single rounding.
          h1, h2, h3 = _bf16_planes3(xh_refs[g][:])
          l1 = xl_refs[g][:].astype(jnp.bfloat16)
          l2 = (xl_refs[g][:] - l1.astype(jnp.float32)).astype(jnp.bfloat16)
          hs = jnp.concatenate([h1, h2, h3, l1, l2], axis=0)  # (5*bs, W)
          gsel = jnp.dot(hs, q, preferred_element_type=jnp.float32)
          gxh = (gsel[:bs_pad] + gsel[bs_pad:2 * bs_pad]) + gsel[
              2 * bs_pad:3 * bs_pad]                          # selected x_hi
          gxl = gsel[3 * bs_pad:4 * bs_pad] + gsel[4 * bs_pad:]  # (bs, J)

          # v * x as two-product + cross terms
          ph, pe = _two_prod32(vh[None, :], gxh)
          pe = pe + vh[None, :] * gxl + vl[None, :] * gxh
          ghi_g, glo_g = _two_sum32(ph, pe)
          ghis.append(ghi_g)
          glos.append(glo_g)
          pms.append(_onehot_mask(rl, (J, r_tile), 1, mask_mode))  # (J, R)

        g_hi = ghis[0] if G == 1 else jnp.concatenate(ghis, axis=1)
        g_lo = glos[0] if G == 1 else jnp.concatenate(glos, axis=1)
        pm = pms[0] if G == 1 else jnp.concatenate(pms, axis=0)  # (G*J, R)

        # per-row power-of-two scale: 2^floor(log2 rowmax) via exponent mask.
        # The floor must keep scale * 2^(-7*slices) NORMAL: the TPU flushes
        # denormals to zero, and an underflowed scale makes u = rem/0 = inf
        # -> NaN (observed as NaN eigenvalues on the production run; CPU
        # interpret mode keeps denormals and hid it).  2^-60 floor keeps the
        # deepest slice scale at 2^-109, far above the 2^-126 normal floor,
        # while 2^-60-scale rows contribute nothing physical anyway.
        rowmax = jnp.max(jnp.abs(g_hi), axis=1, keepdims=True)  # (bs, 1)
        rowmax = jnp.maximum(rowmax, jnp.float32(2.0 ** -60))
        bits = jax.lax.bitcast_convert_type(rowmax, jnp.int32)
        sigma = jax.lax.bitcast_convert_type(
            jnp.bitwise_and(bits, jnp.int32(0x7F800000)), jnp.float32)

        # integer-slice scatter: every MXU contraction below is EXACT
        # (integer operands <= 2^8, partial sums < 2^24 in the f32
        # accumulator); peeling uses power-of-two divides (exact), Sterbenz
        # subtractions (exact) and two-sums.  Rounding MUST be lax.round —
        # the classic (u + 1.5*2^23) - 1.5*2^23 trick is constant-folded to
        # ``u`` by XLA's algebraic simplifier (observed on XLA:CPU under
        # jit), which silently killed every slice after the first.
        # peel ALL slices on the VPU first (the peel chain is sequential),
        # then scatter them in ONE stacked (slices*bs_pad, J) @ (J, R)
        # matmul — one M=96 MXU contraction instead of six M=16 ones; the
        # per-slice integer partial sums stay exact (disjoint M rows), and
        # the scale-and-accumulate order below is identical to the fused
        # loop's, so not a single rounding changes.
        scale = sigma * jnp.float32(2.0 ** -7)
        rem_hi, rem_lo = g_hi, g_lo
        cks = []
        scales = []
        # deferred-lo peel (slices > 3): the peel bounds (|u| <= 2^8 by
        # round-to-nearest, Sterbenz subtraction exact) hold whether or not
        # the lo plane is folded in, and |rem_lo| <= 2^-24 * sigma, so ONE
        # plain fold after the 3rd peel (when |rem_hi| <= 2^-21 sigma)
        # suffices: its rounding error is <= 2^-45 sigma, below the
        # 2^(-7*slices) remainder bound — and it replaces a 6-op two-sum
        # per slice with a single add (the peel chain was ~40% of the
        # kernel's VPU work at production shapes)
        defer_lo = slices > 3
        for k in range(slices):
            u = rem_hi / scale                                 # |u| <= 2^8
            c = jax.lax.round(u, jax.lax.RoundingMethod.TO_NEAREST_EVEN)
            cks.append(c.astype(jnp.bfloat16))
            scales.append(scale)
            rem_hi = rem_hi - c * scale                        # Sterbenz
            if defer_lo:
                if k == 2:
                    rem_hi = rem_hi + rem_lo
            else:
                rem_hi, rem_lo = _two_sum32(rem_hi, rem_lo)
            scale = scale * jnp.float32(2.0 ** -7)
        ys = jnp.dot(jnp.concatenate(cks, axis=0), pm,
                     preferred_element_type=jnp.float32)       # exact ints

        def ysk(k):
            return ys[k * bs_pad:(k + 1) * bs_pad] * scales[k]  # exact 2^k

        # slice combine: compensated two-sums for the top 4 slices; the
        # deeper slices' contributions are <= G*J*2^8*scale_4 = 2^-17 sigma
        # worst-case, so plain f32 adds keep their rounding below
        # 2^-40 sigma — the compensation there tracked pure noise
        pair_hi = ysk(0)                                   # exact product
        pair_lo = jnp.zeros((bs_pad, r_tile), jnp.float32)
        for k in range(1, min(4, slices)):
            pair_hi, e = _two_sum32(pair_hi, ysk(k))
            pair_lo = pair_lo + e
        if slices > 4:
            tail = ysk(4)
            for k in range(5, slices):
                tail = tail + ysk(k)
            pair_hi, e = _two_sum32(pair_hi, tail)
            pair_lo = pair_lo + e

        ohi_ref[:], e = _two_sum32(ohi_ref[:], pair_hi)
        olo_ref[:] += e + pair_lo

    pair_spec = pl.BlockSpec(
        (8, J),
        lambda p, t, w: (jax.lax.div(p * jnp.int32(G), jnp.int32(8)), p * 0),
        memory_space=pltpu.VMEM)

    def xspec(g):
        return pl.BlockSpec(
            (bs_pad, w_tile),
            lambda p, t, w, g=g: (p * 0, w[p * jnp.int32(G) + jnp.int32(g)]),
            memory_space=pltpu.VMEM)

    o_spec = pl.BlockSpec(
        (bs_pad, r_tile), lambda p, t, w: (p * 0, t[p * jnp.int32(G)]),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P8 // G,),
        in_specs=[pair_spec] * 4
        + [xspec(g) for g in range(G)]
        + [xspec(g) for g in range(G)],
        out_specs=(o_spec, o_spec),
    )
    ohi, olo = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((bs_pad, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((bs_pad, n_pad), jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * J * (5 * w_tile + slices * r_tile) * bs_pad,
            bytes_accessed=P * J * 16 + 4 * bs_pad * n_pad * 4,
            transcendentals=0,
        ),
    )(t_ids, w_ids, rloc8, cloc8, vhi8, vlo8,
      *([xhi_p] * G), *([xlo_p] * G))
    return ohi[:bs], olo[:bs]


def regroup_pairs(t_ids, w_ids, rloc, cloc, pvals, pvals_lo, group: int):
    """Pad each tile's pair run to a multiple of ``group`` (dummy zero-value
    pairs carrying the run's tile id and last window id), so a kernel grid
    step can process ``group`` consecutive pairs that provably share one
    output tile.  ``group`` must divide 8 (pair rows are DMA'd in (8, J)
    blocks; a step's pairs must sit in one block)."""
    assert 8 % group == 0, f"group={group} must divide 8"
    if group == 1:
        return t_ids, w_ids, rloc, cloc, pvals, pvals_lo
    P = len(t_ids)
    runs = np.flatnonzero(np.r_[True, t_ids[1:] != t_ids[:-1]])
    run_lens = np.diff(np.r_[runs, P])
    pads = (-run_lens) % group
    out_idx = []   # source index per output row; -1 = dummy after run r
    src_w = []
    for start, ln, pad in zip(runs, run_lens, pads):
        out_idx.extend(range(start, start + ln))
        out_idx.extend([-(start + ln - 1) - 1] * int(pad))  # encode dummy src
    out_idx = np.asarray(out_idx)
    dummy = out_idx < 0
    src = np.where(dummy, -out_idx - 1, out_idx)

    def take(a, zero_dummy):
        out = a[src].copy()
        if zero_dummy and dummy.any():
            out[dummy] = 0
        return out

    t2 = take(t_ids, False)        # dummies keep the run's tile id
    w2 = take(w_ids, False)        # and its last window id (any valid one)
    rl2, cl2 = take(rloc, True), take(cloc, True)
    pv2, pl2 = take(pvals, True), take(pvals_lo, True)
    P2 = _round_up(len(t2), 8)
    if P2 != len(t2):
        pad = P2 - len(t2)
        t2 = np.concatenate([t2, np.full(pad, t2[-1], t2.dtype)])
        w2 = np.concatenate([w2, np.full(pad, w2[-1], w2.dtype)])
        z = np.zeros((pad,) + rloc.shape[1:], rloc.dtype)
        rl2 = np.concatenate([rl2, z])
        cl2 = np.concatenate([cl2, z.astype(cloc.dtype)])
        zf = np.zeros((pad,) + pvals.shape[1:], pvals.dtype)
        pv2 = np.concatenate([pv2, zf])
        pl2 = np.concatenate([pl2, zf])
    return t2, w2, rl2, cl2, pv2, pl2


def pack_onehot_sharded(rows, cols, vals, n: int, ndev: int,
                        r_tile: int = 256, w_tile: int = 256,
                        j_max: int = 128):
    """Per-device one-hot packs for a row-sharded irregular operator.

    Device ``s`` owns rows ``[s*ln, (s+1)*ln)`` (``ln = n / ndev``; n must
    divide) and sees x through a HALO WINDOW ``[s*ln - hl, (s+1)*ln + hr)``
    where ``hl/hr`` bound the column reach of any nonzero (RCM keeps them
    small).  Each device's nonzeros are re-indexed into *window
    coordinates* — rows shifted by ``hl`` too, so the local problem stays
    SQUARE of size ``nw = ln + hl + hr`` and the square kernels run
    unchanged; the local result is the ``[hl, hl+ln)`` slice.  All packs are
    padded to one static pair count (max over devices, zero-value pairs
    carrying each device's own last tile id) and stacked on a leading device
    axis, ready to shard with ``PartitionSpec('rows', ...)``.

    Returns ``(t_ids, w_ids, rloc, cloc, pvals, pvals_lo)`` stacked as
    ``(ndev, P_max[, J])`` plus ``(hl, hr, nw, n_pad, ln)``.
    """
    rows = np.asarray(rows); cols = np.asarray(cols)
    vals = np.asarray(vals)
    assert n % ndev == 0, f"n={n} must divide over {ndev} devices"
    ln = n // ndev
    hl = int(max(0, (rows - cols).max(initial=0)))
    hr = int(max(0, (cols - rows).max(initial=0)))
    nw = ln + hl + hr
    packs = []
    for s in range(ndev):
        sel = (rows >= s * ln) & (rows < (s + 1) * ln)
        r_loc = rows[sel] - s * ln + hl
        c_loc = cols[sel] - s * ln + hl   # window starts at s*ln - hl
        if r_loc.size == 0:
            # a device with an empty row slice (tiny n over many devices /
            # empty trailing rows) still needs a non-empty pack: one
            # zero-value pair at the window origin is an exact no-op
            r_loc = np.array([hl], rows.dtype)
            c_loc = np.array([hl], cols.dtype)
            v_loc = np.zeros(1, vals.dtype)
        else:
            v_loc = vals[sel]
        packs.append(pack_onehot(r_loc, c_loc, v_loc, nw,
                                 r_tile, w_tile, j_max))
    n_pad = packs[0][6]
    p_max = _round_up(max(p[0].shape[0] for p in packs), 8)

    def padp(a, tid_last):
        pad = p_max - a.shape[0]
        if pad == 0:
            return a
        if a.ndim == 1:
            fill = np.full(pad, tid_last, a.dtype) if a is not None else None
            return np.concatenate([a, fill])
        return np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])

    stacked = []
    for k in range(6):   # t_ids, w_ids, rloc, cloc, pvals, pvals_lo
        parts = []
        for p in packs:
            a = p[k]
            tid_last = p[0][-1] if k < 2 else 0  # pad t AND w with last ids
            if k == 1:
                tid_last = p[1][-1]
            parts.append(padp(a, tid_last))
        stacked.append(np.stack(parts))
    t_ids, w_ids, rloc, cloc, pvals, pvals_lo = stacked
    return (t_ids, w_ids, rloc, cloc, pvals, pvals_lo), (hl, hr, nw, n_pad, ln)


@jax.tree_util.register_pytree_node_class
class OneHotOperator:
    """Irregular sparse operator in windowed one-hot pair layout (f32).

    The TPU fast path for matrices the DIA/Hybrid layouts cannot carry
    (thousands of distinct diagonals after RCM — SuiteSparse-class
    patterns).  ``matvec_t`` on the transposed layout is the native entry
    (the mixed-precision inner CG's layout); ``matvec`` wraps it with
    transposes.  Off-TPU it falls back to an exact segment-sum reference
    implementation (also used by the unit tests).
    """

    def __init__(self, t_ids, w_ids, rloc, cloc, pvals, pvals_lo, n: int,
                 n_pad: int, r_tile: int, w_tile: int, group: int = 1):
        self.t_ids = t_ids
        self.w_ids = w_ids
        self.rloc = rloc
        self.cloc = cloc
        self.pvals = pvals
        self.pvals_lo = pvals_lo
        self.n = int(n)
        self.n_pad = int(n_pad)
        self.r_tile = int(r_tile)
        self.w_tile = int(w_tile)
        self.group = int(group)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return jnp.float32

    @classmethod
    def from_coo(cls, rows, cols, vals, shape, r_tile: int = 256,
                 w_tile: int = 256, j_max: int = 128, group: int = 1):
        n = shape[0]
        t_ids, w_ids, rloc, cloc, pvals, pvals_lo, n_pad, stats = pack_onehot(
            rows, cols, vals, n, r_tile, w_tile, j_max)
        if group > 1:
            t_ids, w_ids, rloc, cloc, pvals, pvals_lo = regroup_pairs(
                t_ids, w_ids, rloc, cloc, pvals, pvals_lo, group)
            stats = dict(stats, pairs_grouped=len(t_ids))
        op = cls(jnp.asarray(t_ids), jnp.asarray(w_ids), jnp.asarray(rloc),
                 jnp.asarray(cloc), jnp.asarray(pvals),
                 jnp.asarray(pvals_lo), n, n_pad, r_tile, w_tile, group)
        op.stats = stats
        return op

    def matvec_t(self, xt, interpret: bool | None = None):
        """``xt (bs, n) -> (A @ x)^T (bs, n)`` in f32."""
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        bs, n = xt.shape
        assert n == self.n
        xt_p = jnp.pad(xt, ((0, 0), (0, self.n_pad - n)))
        y = _onehot_spmm_t(self.t_ids, self.w_ids, self.rloc, self.cloc,
                           self.pvals, xt_p, self.r_tile, self.w_tile,
                           self.n_pad, interpret, self.group,
                           _resolve_mask_mode(self.r_tile, self.w_tile))
        return y[:, :n].astype(xt.dtype)

    def matvec_t_df64(self, xt, interpret: bool | None = None,
                      slices: int = 6):
        """``xt (bs, n) f64 -> (A @ x)^T (bs, n) f64`` to ~2^-40 relative.

        The f64-quality fast path for every accuracy-critical A-application
        of an irregular operator (residual checks, Rayleigh-Ritz Grams,
        initial RR, mixed-CG refreshes) — see the df64 kernel block comment.
        """
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        bs, n = xt.shape
        assert n == self.n
        x64 = jnp.pad(xt.astype(jnp.float64), ((0, 0), (0, self.n_pad - n)))
        xhi = x64.astype(jnp.float32)
        xlo = (x64 - xhi.astype(jnp.float64)).astype(jnp.float32)
        yhi, ylo = _onehot_spmm_t_df64(
            self.t_ids, self.w_ids, self.rloc, self.cloc,
            self.pvals, self.pvals_lo, xhi, xlo,
            self.r_tile, self.w_tile, self.n_pad, slices, interpret,
            self.group, _resolve_mask_mode(self.r_tile, self.w_tile))
        y = yhi.astype(jnp.float64) + ylo.astype(jnp.float64)
        return y[:, :n]

    def matvec(self, x):
        return self.matvec_t(x.T).T

    def matvec_reference(self, x):
        """Exact segment-sum reference (host/CPU correctness oracle)."""
        gr = (self.t_ids[:, None] * self.r_tile + self.rloc).reshape(-1)
        gc = (self.w_ids[:, None] * self.w_tile + self.cloc).reshape(-1)
        v = self.pvals.reshape(-1).astype(x.dtype)
        if x.dtype == jnp.float64:
            v = v + self.pvals_lo.reshape(-1).astype(jnp.float64)
        xp = jnp.pad(x, ((0, self.n_pad - self.n), (0, 0)))
        contrib = v[:, None] * xp[gc]
        return jax.ops.segment_sum(contrib, gr, num_segments=self.n_pad)[
            : self.n]

    def tree_flatten(self):
        return ((self.t_ids, self.w_ids, self.rloc, self.cloc, self.pvals,
                 self.pvals_lo),
                (self.n, self.n_pad, self.r_tile, self.w_tile, self.group))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)
