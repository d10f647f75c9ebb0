"""Exact neighbor-pruned Chamfer distance (TPU-native).

The brute-force kernel in ``ops/chamfer.py`` is at the VPU f32 roofline
(~10-12.5 s/pair at 1.24M points) — the remaining headroom is algorithmic.
This module prunes the *enumeration* of candidate pairs without changing a
single computed value: the per-pair squared-distance math, the min folds, and
the masked means are the exact same f32 expressions as the brute kernel, and a
pair is skipped only when a conservative bounding-box lower bound proves its
computed distance cannot beat the point's already-established minimum.  The
returned per-point minima (and the final scalar) are therefore bit-identical
to the brute-force path (pinned by ``tests/test_chamfer_pruned.py``).

Matches the semantics of the reference's CUDA chamfer module
(``/root/reference/heal_swin/evaluation/custom_metrics.py:471-577``): mean of
squared NN distances, both directions.

Pipeline (host numpy is cheap, device does all distance math):

1. **Morton-sort** both clouds (host): spatially local points land in the same
   fixed-size tile (``_TP`` p-side, ``_TQ`` q-side).
2. **Tile AABBs + pairwise box lower bounds** (host, f64): ``lb(i, j)`` is the
   squared distance between tile bounding boxes — a true lower bound on every
   pair distance between the tiles.
3. **Tightening rounds** (device): each tile folds its nearest boxes
   (``_ROUNDS`` nearest, cumulative) through the fold kernel; after each round
   the per-tile upper bounds ``ub = max over the tile's valid points of its
   running min`` are re-fetched, and the next round's candidates are pruned
   against them.  Every point's true-NN tile survives every prune (its lower
   bound <= the point's true min <= the tile bound), so the schedule only
   controls how tight the bounds get before the final sweep.
4. **Prune** (host): keep pair (i, j) only if ``lb(i, j) < ub_p(i) * _MARGIN``
   or ``lb(i, j) < ub_q(j) * _MARGIN`` — the RELATIVE slack over-bounds the few
   ulp of relative rounding in both the kernel's difference-form distance and
   the f32 box bound.  A pruned pair's computed distance provably exceeds the
   running min of every point it covers, so folding it in would be a no-op.
5. **Fold survivors** (device): PACK the surviving tiles into dense operands
   with fast XLA row gathers, then run a fold kernel whose block index maps
   are all STATIC (below); scatter-min merges the streamed row/col minima into
   the global running minima.
6. **Unsort + means**: minima are gathered back to the original point order and
   reduced with the same masked-mean expression (same shapes) as the brute
   path, so the scalar matches bit-for-bit.

Kernel shape — packed operands, static index maps.  Two earlier cuts indexed
the kernel's operand blocks through scalar-prefetch tables (``pid[i]``,
``qidx[i*k0+k]``): Mosaic charges a measured 40-110 us of fixed cost per grid
step for DYNAMIC block index maps vs 4.6 us for static ones
(docs/PERFORMANCE.md, r4) — ~100x the step's ~0.5 us of VPU content, which
capped the pruned pipeline at 2.2-2.4x brute force despite ~97% pair pruning.
The r5 scheme removes every dynamic map: the surviving pair list is grouped
into rows of one p-tile x ``_K0`` q-tiles (as before), but the row's operands
are first GATHERED into dense packed arrays — (R*TP, 3) p-points, (R*K0*3, TQ)
tile-transposed q-points, validity tiles, and the seeded running row minima —
by XLA row gathers from small (~15 MiB at 1.24M points, far under the ~76 MiB
gather cliff, see ops/permute.py) tile tables.  The kernel's grid is
(rows, _K0) and every BlockSpec index map is affine in (i, k): sequential
static block walks at brute-kernel step cost.  Row p-minima and per-(row, k)
q col-minima stream out and merge into the global minima with jnp scatter-mins
(exact — min is order-free).

The kernel math must stay in lock-step with ``chamfer._min_both_kernel`` —
any change to one must be mirrored in the other or bit-parity breaks.

For host/device overlap at the writer level, the host-side preprocessing
(Morton sort + tile boxes, ~0.7-0.8 s/pair at paper scale) is split out as
``chamfer_prepare``; ``chamfer_distance_pruned(..., prepared=...)`` then runs
only prune decisions + device folds, so a caller can prepare pair k+1 in a
worker thread while pair k folds on the device
(evaluation/hp_depth_pred_writers.py chamfer writer).
"""

from __future__ import annotations

import functools
import hashlib
import threading
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from heal_swin_tpu.ops.chamfer import _bucket

# Tile sizes trade pruning granularity against per-step efficiency; (1024,
# 1024) matches the brute kernel's block economics (a (256, 512) variant
# measured 2-3x more pruning but 16x more grid steps and lost end-to-end).
_TP = 1024  # p-tile rows (sublane multiple)
_TQ = 1024  # q-tile lanes (128 multiple)

# q-tiles per kernel row: amortizes the row's p-side blocks over _K0 inner
# steps and bounds the packed-operand duplication of p-side data.
_K0 = 16

# Rows per kernel launch: bounds the packed-operand HBM footprint (a row packs
# _K0 * (3 + 1) * _TQ f32 = 256 KiB of q-side data; 4096 rows ~ 1.1 GiB
# transient).  Longer lists fold launch-by-launch through the carried minima
# (order-invariant, bit-equal — pinned by
# tests/test_chamfer_pruned.py::test_pruned_chunked_launches_bit_equal).
_MAX_ROWS_PER_LAUNCH = 4096

# Above this the dense lower-bound matrix and tile tables outgrow what the
# host prep amortizes; paper full_res clouds (~1.6M bucket) are well inside.
_MAX_POINTS = 4 * 1024 * 1024


# ------------------------------------------------------------------ host: morton
def _spread_bits(x: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of x to every 3rd bit (3-D Morton interleave)."""
    u = np.uint64
    x = x.astype(np.uint64) & u(0x1FFFFF)
    x = (x | (x << u(32))) & u(0x1F00000000FFFF)
    x = (x | (x << u(16))) & u(0x1F0000FF0000FF)
    x = (x | (x << u(8))) & u(0x100F00F00F00F00F)
    x = (x | (x << u(4))) & u(0x10C30C30C30C30C3)
    x = (x | (x << u(2))) & u(0x1249249249249249)
    return x


def _morton_order(pts: np.ndarray) -> np.ndarray:
    """Sort order of (n, 3) f32 points along a 63-bit Morton curve of their
    joint-per-axis normalized grid coordinates."""
    lo = pts.min(axis=0)
    span = np.maximum(pts.max(axis=0) - lo, 1e-30)
    g = ((pts - lo) / span * (2**21 - 1)).astype(np.uint64)
    code = (
        _spread_bits(g[:, 0])
        | (_spread_bits(g[:, 1]) << np.uint64(1))
        | (_spread_bits(g[:, 2]) << np.uint64(2))
    )
    return np.argsort(code, kind="stable")


def _box_lb(plo, phi, qlo, qhi) -> np.ndarray:
    """(a, b) squared distance between AABBs: per-axis gap clamp, summed.  f32
    accumulation (its rounding is orders of magnitude under the pruning margin);
    axis-at-a-time in-place ops — an (a, b, 3) einsum measured ~20x slower."""
    acc = np.zeros((plo.shape[0], qlo.shape[0]), np.float32)
    for k in range(3):
        g = np.maximum(qlo[None, :, k] - phi[:, None, k],
                       plo[:, None, k] - qhi[None, :, k]).astype(np.float32)
        np.maximum(g, 0.0, out=g)
        g *= g
        acc += g
    return acc


def _pad_tiles(pts: np.ndarray, total: int) -> np.ndarray:
    """Pad sorted points to the bucket size by replicating the last point —
    padding is masked out of every min/mean anyway, but replication keeps the
    last tile's bounding box tight (zero-padding would drag it to the origin)."""
    out = np.empty((total, 3), np.float32)
    out[: len(pts)] = pts
    out[len(pts):] = pts[-1]
    return out


# ------------------------------------------------------------------ pallas kernel
def _packed_row_min_kernel(p_ref, qT_ref, pv_ref, qv_ref, seed_ref,
                           pmin_ref, qcol_ref):
    """One (row, k) step over PACKED operands: the (TP, TQ) squared-distance
    block between the row's p-tile and its k-th q-tile, folded into the row's
    p-side min (resident across the row's _K0 inner steps, seeded from the
    global running min at k == 0) and this (row, k)'s streamed q col-min.
    Every BlockSpec index map is affine in the grid indices — no
    scalar-prefetch, no dynamic block revisitation.  Distance math is
    bit-identical to chamfer._min_both_kernel."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _seed_row():
        pmin_ref[...] = seed_ref[...]

    p = p_ref[...]  # (TP, 3) f32
    q = qT_ref[0]  # (3, TQ) f32 (block (1, 3, TQ) of the packed (K, 3, TQ))
    pv = pv_ref[...]  # (TP, 1) f32 (1 = valid)
    qv = qv_ref[0]  # (1, TQ) f32 (block (1, 1, TQ))
    px, py, pz = p[:, 0:1], p[:, 1:2], p[:, 2:3]
    qx, qy, qz = q[0:1, :], q[1:2, :], q[2:3, :]
    dx = px - qx
    dy = py - qy
    dz = pz - qz
    d = dx * dx + dy * dy + dz * dz
    m = jnp.min(jnp.where(qv > 0.0, d, jnp.inf), axis=1, keepdims=True)
    pmin_ref[...] = jnp.minimum(pmin_ref[...], m)
    c = jnp.min(jnp.where(pv > 0.0, d, jnp.inf), axis=0)
    qcol_ref[...] = c.reshape(1, 1, -1)


@functools.lru_cache(maxsize=None)
def _make_packed_row_min(R: int, tp: int, tq: int, k0: int, interpret: bool):
    # q-side packed operands are 3-D (K, 3|1, tq) with block (1, 3|1, tq):
    # Mosaic requires a block's last two dims be (8, 128)-divisible OR equal to
    # the array's — a (3, tq) block of a tall 2-D (K*3, tq) array is rejected,
    # the (1, 3, tq) block of (K, 3, tq) is legal (trailing dims match).
    grid = (R, k0)
    in_specs = [
        pl.BlockSpec((tp, 3), lambda i, k: (i, 0)),             # packed p
        pl.BlockSpec((1, 3, tq), lambda i, k: (i * k0 + k, 0, 0)),  # packed qT
        pl.BlockSpec((tp, 1), lambda i, k: (i, 0)),             # packed p valid
        pl.BlockSpec((1, 1, tq), lambda i, k: (i * k0 + k, 0, 0)),  # packed q valid
        pl.BlockSpec((tp, 1), lambda i, k: (i, 0)),             # row min seed
    ]
    out_specs = [
        pl.BlockSpec((tp, 1), lambda i, k: (i, 0)),             # row p-min
        pl.BlockSpec((1, 1, tq), lambda i, k: (i * k0 + k, 0, 0)),  # (row, k) col-min
    ]

    def call(p, qT, pv, qv, seed):
        return pl.pallas_call(
            _packed_row_min_kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[
                jax.ShapeDtypeStruct((R * tp, 1), jnp.float32),
                jax.ShapeDtypeStruct((R * k0, 1, tq), jnp.float32),
            ],
            interpret=interpret,
        )(p, qT, pv, qv, seed)

    return call


# ------------------------------------------------------------------ device passes
@functools.partial(jax.jit, static_argnames=("tp", "tq", "k0", "interpret"))
def _fold_rows(pid, qidx, p_tiles, q3_tiles, pv_tiles, qv_tiles, pmin_in,
               qmin_in, tp: int, tq: int, k0: int, interpret: bool):
    """Pack one row table's operands (fast row gathers from the small tile
    tables), fold them through the static kernel, and merge the streamed
    minima into the running global minima with scatter-mins (min is
    order-free, so values are bit-equal to any fold order); also derives the
    per-tile upper bounds (max over each tile's VALID points of its running
    min)."""
    R = pid.shape[0]
    K = qidx.shape[0]  # R * k0
    npt_pad, nqt_pad = p_tiles.shape[0], q3_tiles.shape[0]
    bp = npt_pad * tp
    p_pack = jnp.take(p_tiles, pid, axis=0).reshape(R * tp, 3)
    pv_pack = jnp.take(pv_tiles, pid, axis=0).reshape(R * tp, 1)
    q_pack = jnp.take(q3_tiles, qidx, axis=0).reshape(K, 3, tq)
    qv_pack = jnp.take(qv_tiles, qidx, axis=0).reshape(K, 1, tq)
    seed = jnp.take(pmin_in.reshape(npt_pad, tp), pid, axis=0).reshape(R * tp, 1)
    rows, qcol = _make_packed_row_min(R, tp, tq, k0, interpret)(
        p_pack, q_pack, pv_pack, qv_pack, seed
    )
    gmin = jnp.full((npt_pad, tp), jnp.inf, jnp.float32)
    gmin = gmin.at[pid].min(rows.reshape(R, tp), mode="drop")
    pmin = jnp.minimum(pmin_in, gmin.reshape(bp, 1))
    qmin = qmin_in.at[qidx].min(qcol.reshape(K, tq), mode="drop")
    ubp = jnp.max(jnp.where(pv_tiles > 0.0, pmin.reshape(npt_pad, tp), -jnp.inf),
                  axis=1)
    ubq = jnp.max(jnp.where(qv_tiles > 0.0, qmin, -jnp.inf), axis=1)
    return pmin, qmin, ubp, ubq


@functools.partial(jax.jit, static_argnames=("tp",))
def _bounds_only(pmin, qmin, pv_tiles, qv_tiles, tp: int):
    """Per-tile upper bounds from the current minima — the empty-pair-list
    fast path (a tightening round that pruned everything still needs fresh
    bounds, but no kernel launch)."""
    npt_pad = pv_tiles.shape[0]
    ubp = jnp.max(jnp.where(pv_tiles > 0.0, pmin.reshape(npt_pad, tp), -jnp.inf),
                  axis=1)
    ubq = jnp.max(jnp.where(qv_tiles > 0.0, qmin, -jnp.inf), axis=1)
    return ubp, ubq


@jax.jit
def _means(pmin, qmin, rank_p, rank_q, n, m):
    """Gather the minima back to the original point order and reduce with the
    same masked-mean expression (and shapes) as
    chamfer.chamfer_distance_masked_pallas.  Validity masks derive on device
    from the valid counts (arange < n) — the padded bool arrays would
    otherwise re-upload per pair."""
    p_valid = jnp.arange(rank_p.shape[0]) < n
    q_valid = jnp.arange(rank_q.shape[0]) < m
    d_pq = jnp.maximum(pmin[:, 0][rank_p], 0.0)  # original order, (bp,)
    d_qp = jnp.maximum(qmin.reshape(-1)[rank_q], 0.0)  # (bq,)
    n_p = jnp.maximum(jnp.sum(p_valid), 1)
    n_q = jnp.maximum(jnp.sum(q_valid), 1)
    mean_pq = jnp.sum(jnp.where(p_valid, d_pq, 0.0)) / n_p
    mean_qp = jnp.sum(jnp.where(q_valid, d_qp, 0.0)) / n_q
    return mean_pq + mean_qp, d_pq, d_qp


# ------------------------------------------------------------------ driver
# Tightening rounds: cumulative nearest-tile counts per tile per round.  Round 1
# folds each tile's 4 nearest boxes; the re-fetched upper bounds then prune the
# round-2 candidates (the next-12 nearest), whose bounds prune the final
# survivor enumeration.  Each point's true-NN tile always survives every prune
# (its lower bound <= the point's true min <= the tile bound), so the final
# minima are exact regardless of the round schedule — the schedule only controls
# how close the bounds get to ideal before paying for the full survivor sweep.
# Schedule sweep (r5, 8 schedules on TPU, scalar identical under all): (8, 24)
# won on SYNTHETIC probe clouds (random -13%) but LOST in the real eval writer
# (0.22 -> 0.14 samples/s — real depth clouds are clumpier, so deeper rounds
# fold ~2x the round pairs for little final-set shrinkage); only the full
# writer number decides (CLAUDE.md), so (4, 16) stays.
_ROUNDS = (4, 16)

# Conservative pruning slack, RELATIVE: the kernel's difference-form f32
# distance and the f32 box lower bound are each within a few ulp RELATIVE
# error, so a pruned pair's computed distance is >= lb/_MARGIN > ub >= every
# covered running min.  (1e-5 covers ~84 ulp — orders beyond the actual ~8.)
_MARGIN = 1.0 + 1e-5


def _rows_from_pairs(pairs: np.ndarray, k0: int):
    """Group a (k, 2) pair list (sorted by p-tile) into kernel rows: one p-tile
    x up to ``k0`` q-tiles each.  Row padding repeats the chunk's first q-tile
    — a re-fold, which is a no-op on the minima.  ``k0`` is chosen per fold
    phase to match the expected candidates-per-tile (the tightening rounds
    carry ~4 / ~8 pairs per tile, the final survivor sweep fills 16): a
    16-wide row at 4 candidates wastes 3/4 of its kernel slots on re-folds."""
    if len(pairs) == 0:
        return np.zeros((0,), np.int32), np.zeros((0, k0), np.int32)
    out_pid, out_q = [], []
    bounds = np.flatnonzero(np.diff(pairs[:, 0])) + 1
    for grp in np.split(pairs, bounds):
        qs = grp[:, 1]
        for s in range(0, len(qs), k0):
            chunk = qs[s:s + k0]
            row = np.full(k0, chunk[0], np.int32)
            row[: len(chunk)] = chunk
            out_pid.append(grp[0, 0])
            out_q.append(row)
    return (np.asarray(out_pid, dtype=np.int32),
            np.asarray(np.stack(out_q), dtype=np.int32))


def _row_bucket(n: int) -> int:
    """Half-octave bucket for the row count (8·{1, 1.5}·2^k) — bounds distinct
    compiled grid shapes across samples to ~2 per octave."""
    b = 8
    while True:
        if n <= b:
            return b
        if n <= b + b // 2:
            return b + b // 2
        b *= 2


def _pad_rows(pid: np.ndarray, qidx: np.ndarray, k0: int):
    """Pad the row tables to a half-octave bucket (bounds recompiles across
    samples) by repeating the last row — a harmless re-fold."""
    b = _row_bucket(max(len(pid), 1))
    out_pid = np.empty((b,), np.int32)
    out_q = np.empty((b, k0), np.int32)
    out_pid[: len(pid)] = pid
    out_q[: len(pid)] = qidx
    out_pid[len(pid):] = pid[-1] if len(pid) else 0
    out_q[len(pid):] = qidx[-1] if len(pid) else 0
    return out_pid, np.ascontiguousarray(out_q.reshape(-1))  # flat (b*k0,)


def _best_k0(pairs: np.ndarray) -> int:
    """Row width minimizing total kernel slots (incl. per-row padding) for this
    pair list's per-tile candidate counts — the tightening rounds carry ~4-8
    candidates/tile where a fixed 16-wide row wastes 2-4x of the fold in
    re-fold padding; the final survivor sweep fills 16."""
    if len(pairs) == 0:
        return _K0
    counts = np.bincount(pairs[:, 0])
    counts = counts[counts > 0]
    slots = {k0: int(np.sum(-(-counts // k0)) * k0) for k0 in (4, 8, _K0)}
    return min(slots, key=slots.get)


def _fold_pair_list(pairs, p_tiles, q3_tiles, pv_tiles, qv_tiles, pmin, qmin,
                    interpret, k0: Optional[int] = None):
    """Fold a pair list through bounded packed launches; returns the updated
    (pmin, qmin, ubp, ubq) and the number of folded rows.  An empty list skips
    the kernel and derives the bounds from the carried minima directly."""
    if k0 is None:
        k0 = _best_k0(pairs)
    pid, qidx = _rows_from_pairs(pairs, k0)
    if len(pid) == 0:
        ubp, ubq = _bounds_only(pmin, qmin, pv_tiles, qv_tiles, _TP)
        return pmin, qmin, ubp, ubq, 0
    ubp = ubq = None
    for s in range(0, len(pid), _MAX_ROWS_PER_LAUNCH):
        pid_c, qidx_c = _pad_rows(pid[s:s + _MAX_ROWS_PER_LAUNCH],
                                  qidx[s:s + _MAX_ROWS_PER_LAUNCH], k0)
        pmin, qmin, ubp, ubq = _fold_rows(pid_c, qidx_c, p_tiles, q3_tiles,
                                          pv_tiles, qv_tiles, pmin, qmin,
                                          _TP, _TQ, k0, interpret)
    return pmin, qmin, ubp, ubq, len(pid)


class _PreparedPair(NamedTuple):
    """Preprocessing product for one (p, q) pair: Morton-sorted tile tables
    (kernel-ready layouts, device-resident + content-cached), the pairwise box
    lower bounds (host), and the unsort gather maps.  Built in a worker thread
    while the device folds a previous pair — numpy work and the device_put
    uploads both overlap the folds."""
    n: int
    m: int
    bp: int
    bq: int
    npt_v: int
    nqt_v: int
    p_tiles: jax.Array    # (bp/_TP, _TP*3) row-major (tp, 3) tiles, DEVICE
    q3_tiles: jax.Array   # (bq/_TQ, 3*_TQ) row-major (3, tq) tiles, DEVICE
    pv_tiles: jax.Array   # (bp/_TP, _TP), DEVICE
    qv_tiles: jax.Array   # (bq/_TQ, _TQ), DEVICE
    lb: np.ndarray        # (npt_v, nqt_v) f32 (host — prune decisions)
    rank_p: jax.Array     # DEVICE (cached with the side tables)
    rank_q: jax.Array
    t_prep: float


assert _TP == _TQ  # _prepare_side shares one tiling for both sides

_SIDE_CACHE: dict = {}
_SIDE_CACHE_MAX = 8
_SIDE_CACHE_LOCK = threading.Lock()


def _prepare_side(pts: np.ndarray):
    """Morton order + padded sorted points + tile AABBs + unsort rank for ONE
    cloud, cached by content hash: the chamfer writer's four variants all use
    the SAME prediction-side cloud, so its sort/bounds (the bulk of the host
    prep) compute once per sample.  Returns (key, n, b, nt_v, ps, lo, hi, rank)."""
    key = (hashlib.sha1(pts.tobytes()).hexdigest(), len(pts))
    with _SIDE_CACHE_LOCK:
        hit = _SIDE_CACHE.get(key)
    if hit is not None:
        return hit
    n = len(pts)
    order = _morton_order(pts)
    b = _bucket(n)
    ps = _pad_tiles(pts[order], b)
    nt_v = -(-n // _TP)  # tiles containing >=1 valid point
    # the final partial tile replicates its last VALID point into the padding,
    # so min/max over the full tile is tight
    t3 = ps[: nt_v * _TP].astype(np.float64).reshape(nt_v, _TP, 3)
    lo, hi = t3.min(axis=1), t3.max(axis=1)
    rank = np.zeros(b, np.int32)
    rank[order] = np.arange(n, dtype=np.int32)  # original i -> sorted row
    out = (key, n, b, nt_v, ps, lo, hi, rank)
    with _SIDE_CACHE_LOCK:
        _SIDE_CACHE[key] = out
        while len(_SIDE_CACHE) > _SIDE_CACHE_MAX:
            _SIDE_CACHE.pop(next(iter(_SIDE_CACHE)))
    return out


_DEVICE_SIDE_CACHE: dict = {}
_DEVICE_SIDE_CACHE_MAX = 8


def _device_side(key, role: str, build):
    """Device-resident per-(side, role) tables, keyed by the side's content
    hash.  The tables are ~25-35 MB per side; through the dev tunnel
    (~30-40 MiB/s host->device) re-uploading them per pair used to cost more
    than the folds themselves, and the writer's shared prediction side
    re-uploaded 4x per sample.  ``chamfer_prepare`` runs in the writer's
    worker thread, so cache misses also OVERLAP the previous variant's device
    folds."""
    ck = (key, role)
    with _SIDE_CACHE_LOCK:
        hit = _DEVICE_SIDE_CACHE.get(ck)
    if hit is not None:
        return hit
    arrs = tuple(jax.device_put(a) for a in build())
    with _SIDE_CACHE_LOCK:
        _DEVICE_SIDE_CACHE[ck] = arrs
        while len(_DEVICE_SIDE_CACHE) > _DEVICE_SIDE_CACHE_MAX:
            _DEVICE_SIDE_CACHE.pop(next(iter(_DEVICE_SIDE_CACHE)))
    return arrs


def chamfer_prepare(p: np.ndarray, q: np.ndarray) -> Optional[_PreparedPair]:
    """The preprocessing half of the pruned pipeline: Morton sort + padding +
    tile tables (device-uploaded through the per-side cache) + pairwise box
    lower bounds.  Returns None for an empty side (the distance is then NaN,
    matching ``chamfer_distance_pruned``)."""
    p = np.ascontiguousarray(np.asarray(p, dtype=np.float32).reshape(-1, 3))
    q = np.ascontiguousarray(np.asarray(q, dtype=np.float32).reshape(-1, 3))
    n, m = len(p), len(q)
    if n == 0 or m == 0:
        return None
    if max(n, m) > _MAX_POINTS:
        raise ValueError(f"pruned chamfer supports up to {_MAX_POINTS} points/side")
    t0 = time.perf_counter()

    pkey, n, bp, npt_v, ps, plo, phi, rank_p = _prepare_side(p)
    qkey, m, bq, nqt_v, qs, qlo, qhi, rank_q = _prepare_side(q)
    npt_pad, nqt_pad = bp // _TP, bq // _TQ

    lb = _box_lb(plo, phi, qlo, qhi)

    def build_p():
        p_tiles = ps.reshape(npt_pad, _TP * 3)
        pv = (np.arange(bp) < n).astype(np.float32).reshape(npt_pad, _TP)
        return p_tiles, pv, rank_p

    def build_q():
        q3 = np.ascontiguousarray(
            qs.reshape(nqt_pad, _TQ, 3).transpose(0, 2, 1)
        ).reshape(nqt_pad, 3 * _TQ)
        qv = (np.arange(bq) < m).astype(np.float32).reshape(nqt_pad, _TQ)
        return q3, qv, rank_q

    p_tiles_d, pv_d, rank_p_d = _device_side(pkey, "p", build_p)
    q3_d, qv_d, rank_q_d = _device_side(qkey, "q", build_q)

    return _PreparedPair(n, m, bp, bq, npt_v, nqt_v, p_tiles_d, q3_d,
                         pv_d, qv_d, lb, rank_p_d, rank_q_d,
                         time.perf_counter() - t0)


def chamfer_distance_pruned(p: np.ndarray, q: np.ndarray, interpret: bool = False,
                            stats: dict | None = None,
                            prepared: Optional[_PreparedPair] = None):
    """Exact Chamfer distance via neighbor-pruned enumeration.  p: (n, 3),
    q: (m, 3) float arrays of VALID points (no padding).  Returns the scalar;
    per-point minima in the ORIGINAL point order are appended to ``stats`` when
    a dict is passed (tests pin them bit-equal to the brute path).  Pass a
    ``chamfer_prepare(p, q)`` result as ``prepared`` to reuse host prep done
    elsewhere (e.g. overlapped with a previous pair's device folds)."""
    if prepared is None:
        prepared = chamfer_prepare(p, q)
        if prepared is None:
            return float("nan")
    pr = prepared
    n, m, bp, bq, npt_v, nqt_v = pr.n, pr.m, pr.bp, pr.bq, pr.npt_v, pr.nqt_v
    lb = pr.lb
    t0 = time.perf_counter()

    # the prepared tile tables are already device-resident (and cached per
    # side content hash — _device_side), so every launch reuses them with no
    # re-upload
    p_tiles, q3_tiles = pr.p_tiles, pr.q3_tiles
    pv_tiles, qv_tiles = pr.pv_tiles, pr.qv_tiles
    done = np.zeros((npt_v, nqt_v), bool)

    # -------- tightening rounds: nearest tiles first, bounds re-fetched
    pmin = jnp.full((bp, 1), jnp.inf, jnp.float32)
    qmin = jnp.full((bq // _TQ, _TQ), jnp.inf, jnp.float32)
    ubp = ubq = None
    k_lo = 0
    round_sizes = []
    for k_hi in _ROUNDS:
        pairs = _nearest_pairs(lb, k_lo, k_hi)
        if k_lo and ubp is not None:
            # bounds from the previous round already prune this round's candidates
            sel = (lb[pairs[:, 0], pairs[:, 1]]
                   < np.maximum(ubp[pairs[:, 0]], ubq[pairs[:, 1]]) * _MARGIN)
            sel &= ~done[pairs[:, 0], pairs[:, 1]]
            pairs = pairs[sel]
        done[pairs[:, 0], pairs[:, 1]] = True
        round_sizes.append(len(pairs))
        pmin, qmin, ubp_d, ubq_d = _fold_pair_list(
            pairs, p_tiles, q3_tiles, pv_tiles, qv_tiles, pmin, qmin, interpret
        )[:4]
        ubp = np.asarray(ubp_d[:npt_v], np.float64)
        ubq = np.asarray(ubq_d[:nqt_v], np.float64)
        k_lo = k_hi

    # -------- final survivors: pairs whose lower bound could still beat some
    # covered point's current minimum (in either direction)
    keep = (lb < ubp[:, None] * _MARGIN) | (lb < ubq[None, :] * _MARGIN)
    keep &= ~done
    pairs = np.argwhere(keep).astype(np.int32)  # row-major: sorted by p-tile
    t_rounds = time.perf_counter() - t0
    if stats is not None:
        total = npt_v * nqt_v
        stats.update(n=n, m=m, round_pairs=round_sizes, final_pairs=len(pairs),
                     dense_pairs=total, keep=keep,
                     work_frac=(sum(round_sizes) + len(pairs)) * _TP * _TQ / (n * m))

    pmin, qmin = _fold_pair_list(pairs, p_tiles, q3_tiles, pv_tiles, qv_tiles,
                                 pmin, qmin, interpret)[:2]

    out, d_pq, d_qp = _means(pmin, qmin, pr.rank_p, pr.rank_q, n, m)
    val = float(out)
    if stats is not None:
        stats["d_pq"] = np.asarray(d_pq)[:n]
        stats["d_qp"] = np.asarray(d_qp)[:m]
        stats["t_prep"] = pr.t_prep
        stats["t_rounds"] = t_rounds
        stats["t_final"] = time.perf_counter() - t0 - t_rounds
    return val


def _nearest_pairs(lb: np.ndarray, k_lo: int, k_hi: int) -> np.ndarray:
    """Pairs (i, j) where j is among row i's (k_lo, k_hi]-nearest columns by lb,
    or i among column j's — both directions so every tile's bounds tighten."""
    npt_v, nqt_v = lb.shape
    out = []
    if nqt_v > k_lo:
        hi = min(k_hi, nqt_v)
        jn = np.argpartition(lb, hi - 1, axis=1)[:, :hi]
        if k_lo:
            # drop the k_lo nearest (previous rounds): partial-sort the hi block
            order = np.argsort(np.take_along_axis(lb, jn, axis=1), axis=1)
            jn = np.take_along_axis(jn, order, axis=1)[:, k_lo:]
        out.append(np.stack([
            np.repeat(np.arange(npt_v), jn.shape[1]), jn.reshape(-1)
        ], axis=1))
    if npt_v > k_lo:
        hi = min(k_hi, npt_v)
        im = np.argpartition(lb, hi - 1, axis=0)[:hi, :]
        if k_lo:
            order = np.argsort(np.take_along_axis(lb, im, axis=0), axis=0)
            im = np.take_along_axis(im, order, axis=0)[k_lo:, :]
        out.append(np.stack([
            im.reshape(-1), np.tile(np.arange(nqt_v), im.shape[0])
        ], axis=1))
    if not out:
        return np.empty((0, 2), np.int64)
    return np.unique(np.concatenate(out), axis=0)  # sorted by (pt, qt)
