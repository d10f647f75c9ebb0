"""Exact neighbor-pruned Chamfer distance (TPU-native).

The brute-force kernel in ``ops/chamfer.py`` is at the VPU f32 roofline
(12.5 s/pair at 1.24M points) — the remaining headroom is algorithmic.  This
module prunes the *enumeration* of candidate pairs without changing a single
computed value: the per-pair squared-distance math, the min folds, and the
masked means are the exact same f32 expressions as the brute kernel, and a pair
is skipped only when a conservative bounding-box lower bound proves its computed
distance cannot beat the point's already-established minimum.  The returned
per-point minima (and the final scalar) are therefore bit-identical to the
brute-force path (pinned by ``tests/test_chamfer_pruned.py``).

Matches the semantics of the reference's CUDA chamfer module
(``/root/reference/heal_swin/evaluation/custom_metrics.py:471-577``): mean of
squared NN distances, both directions.

Pipeline (host numpy is cheap, device does all distance math):

1. **Morton-sort** both clouds (host): spatially local points land in the same
   fixed-size tile (``_TP`` = 256 p-side, ``_TQ`` = 512 q-side).
2. **Tile AABBs + pairwise box lower bounds** (host, f64): ``lb(i, j)`` is the
   squared distance between tile bounding boxes — a true lower bound on every
   pair distance between the tiles.
3. **Tightening rounds** (device): each tile folds its nearest boxes
   (``_ROUNDS`` nearest, cumulative) through the pair kernel; after each round
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
5. **Final pass** (device): one scalar-prefetch Pallas kernel walks the
   surviving (p-tile, q-tile) list (sorted by p-tile so each p-tile's running
   min block stays VMEM-resident across its run), folding each (TP, TQ)
   distance block into the p-side row-min AND the q-side col-min — each
   surviving block is computed once, like the fused brute kernel.
6. **Unsort + means**: minima are gathered back to the original point order and
   reduced with the same masked-mean expression (same shapes) as the brute
   path, so the scalar matches bit-for-bit.

The kernel math must stay in lock-step with ``chamfer._min_both_kernel`` —
any change to one must be mirrored in the other or bit-parity breaks.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heal_swin_tpu.ops.chamfer import _bucket

# Tile sizes trade pruning granularity against per-grid-step efficiency.  The
# first cut used (256, 512) for finer bounds — work_frac 1.4-2.6% at 1.24M
# points, but the pair-list kernel then ran ~40 us/step (vs ~0.5 us of VPU
# content: small scattered blocks are latency-bound), and the pruned pipeline
# only broke even with brute force.  (1024, 1024) matches the brute kernel's
# block economics: 16x fewer steps and 16x smaller host tile math, at a
# coarser enumeration — measured end-to-end numbers in docs/PERFORMANCE.md
# (benchmarks/chamfer_pruned_probe.py).
_TP = 1024  # p-tile rows (sublane multiple)
_TQ = 1024  # q-tile lanes (128 multiple)

# Above this the refine kernel's resident (M/_TQ, _TQ) col-min block would push
# scoped VMEM; paper full_res clouds (~1.6M bucket) are well inside.
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
def _pair_min_kernel(pt_ref, qt_ref, p_ref, qT_ref, pv_ref, qv_ref, pmin_in_ref,
                     pmin_ref, qmin_ref):
    """One pair-list step: the (TP, TQ) squared-distance block between
    p-tile pt_ref[i] and q-tile qt_ref[i], folded into the p row-min (block
    output, resident across the tile's contiguous run; seeded from pmin_in on
    the run's first step) and the q col-min (whole (nqt, TQ) array resident as
    a constant-index block, dynamic-row updated — same scheme as the brute
    kernel's col-min).  Distance math is bit-identical to
    chamfer._min_both_kernel."""
    i = pl.program_id(0)
    prev = pt_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, pt_ref[i] != prev)

    @pl.when(first)
    def _init_pmin():
        pmin_ref[...] = pmin_in_ref[...]

    @pl.when(i == 0)
    def _init_qmin():
        qmin_ref[...] = jnp.full_like(qmin_ref, jnp.inf)

    p = p_ref[...]  # (TP, 3) f32
    q = qT_ref[...]  # (3, TQ) f32
    pv = pv_ref[...]  # (TP, 1) f32 (1 = valid)
    qv = qv_ref[...]  # (1, TQ) f32
    px, py, pz = p[:, 0:1], p[:, 1:2], p[:, 2:3]
    qx, qy, qz = q[0:1, :], q[1:2, :], q[2:3, :]
    dx = px - qx
    dy = py - qy
    dz = pz - qz
    d = dx * dx + dy * dy + dz * dz
    m = jnp.min(jnp.where(qv > 0.0, d, jnp.inf), axis=1, keepdims=True)
    pmin_ref[...] = jnp.minimum(pmin_ref[...], m)
    c = jnp.min(jnp.where(pv > 0.0, d, jnp.inf), axis=0)
    j = qt_ref[i]
    qmin_ref[j, :] = jnp.minimum(qmin_ref[j, :], c)


@functools.lru_cache(maxsize=None)
def _make_pair_min(N: int, M: int, L: int, tp: int, tq: int, interpret: bool):
    nqt = M // tq
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((tp, 3), lambda i, pt, qt: (pt[i], 0)),
            pl.BlockSpec((3, tq), lambda i, pt, qt: (0, qt[i])),
            pl.BlockSpec((tp, 1), lambda i, pt, qt: (pt[i], 0)),
            pl.BlockSpec((1, tq), lambda i, pt, qt: (0, qt[i])),
            pl.BlockSpec((tp, 1), lambda i, pt, qt: (pt[i], 0)),
        ],
        out_specs=[
            pl.BlockSpec((tp, 1), lambda i, pt, qt: (pt[i], 0)),
            pl.BlockSpec((nqt, tq), lambda i, pt, qt: (0, 0)),
        ],
    )

    def call(pt, qt, p, qT, pv, qv, pmin_in):
        return pl.pallas_call(
            _pair_min_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((N, 1), jnp.float32),
                jax.ShapeDtypeStruct((nqt, tq), jnp.float32),
            ],
            interpret=interpret,
        )(pt, qt, p, qT, pv, qv, pmin_in)

    return call


# ------------------------------------------------------------------ device passes
@functools.partial(jax.jit, static_argnames=("tp", "tq", "interpret"))
def _round_pass(pt, qt, p, qT, pv, qv, pmin_in, qmin_in, tp: int, tq: int,
                interpret: bool):
    """Fold one pair list on top of the running minima and derive the per-tile
    upper bounds (max over each tile's VALID points of its running min)."""
    N, M, L = p.shape[0], qT.shape[1], pt.shape[0]
    pmin2, qmin2 = _make_pair_min(N, M, L, tp, tq, interpret)(pt, qt, p, qT, pv, qv, pmin_in)
    qmin = jnp.minimum(qmin_in, qmin2)
    ubp = jnp.max(jnp.where(pv > 0.0, pmin2, -jnp.inf).reshape(N // tp, tp), axis=1)
    ubq = jnp.max(jnp.where(qv.reshape(M // tq, tq) > 0.0, qmin, -jnp.inf), axis=1)
    return pmin2, qmin, ubp, ubq


@functools.partial(jax.jit, static_argnames=("tp", "tq", "interpret"))
def _final_pass(pt, qt, p, qT, pv, qv, pmin_in, qmin_in, rank_p, rank_q,
                p_valid, q_valid, tp: int, tq: int, interpret: bool):
    """Fold the final surviving pair list, gather the minima back to the
    original point order, and reduce with the same masked-mean expression (and
    shapes) as chamfer.chamfer_distance_masked_pallas."""
    N, M, L = p.shape[0], qT.shape[1], pt.shape[0]
    pmin2, qmin2 = _make_pair_min(N, M, L, tp, tq, interpret)(pt, qt, p, qT, pv, qv, pmin_in)
    qmin = jnp.minimum(qmin_in, qmin2)
    d_pq = jnp.maximum(pmin2[:, 0][rank_p], 0.0)  # original order, (bp,)
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
# how close the bounds get to ideal before paying for the full survivor sweep
# (measured: ideal bounds leave ~1% of dense pairs at 1.2M points).
_ROUNDS = (4, 16)

# Conservative pruning slack, RELATIVE: the kernel's difference-form f32
# distance and the f32 box lower bound are each within a few ulp RELATIVE
# error, so a pruned pair's computed distance is >= lb/_MARGIN > ub >= every
# covered running min.  (1e-5 covers ~84 ulp — orders beyond the actual ~8.)
_MARGIN = 1.0 + 1e-5


# Pair-list entries per kernel launch: the (pt, qt) lists ride the scalar-
# prefetch path, which lives in SMEM — 1 MiB total on v5e, and Mosaic rejects
# programs whose prefetched operands exceed it (measured: a 262144-pair list =
# 2 x 1 MiB operands -> "Ran out of memory in memory space smem").  49152 keeps
# each launch's two padded s32 lists at <= 2 x 256 KiB after half-octave
# bucketing + per-chunk missing-tile filler.  Longer lists fold chunk-by-chunk
# through the carried minima — the fold is order-invariant, so values are
# unchanged (pinned by tests/test_chamfer_pruned.py::test_pruned_chunked_*).
_MAX_PAIRS_PER_LAUNCH = 49152


def _bucket_pairs(n: int) -> int:
    """Half-octave bucket for the pair-list length (bounds recompiles across
    samples; padding repeats the last pair, a harmless re-fold)."""
    return _bucket(max(n, 1))


def _pad_pairs(pairs: np.ndarray, L: int):
    """(k, 2) int pair list -> two (L,) int32 scalar-prefetch arrays."""
    out = np.empty((L, 2), np.int32)
    out[: len(pairs)] = pairs
    out[len(pairs):] = pairs[-1]
    return np.ascontiguousarray(out[:, 0]), np.ascontiguousarray(out[:, 1])


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


def _chunk_pairs(pairs: np.ndarray, npt_v: int, nearest: np.ndarray):
    """Split a sorted-by-p-tile pair list into SMEM-sized launches, each with
    the every-valid-p-tile cover restored (``_fill_missing`` — an unvisited
    tile's row-min output block would come back undefined)."""
    chunks = [pairs[i:i + _MAX_PAIRS_PER_LAUNCH]
              for i in range(0, max(len(pairs), 1), _MAX_PAIRS_PER_LAUNCH)]
    return [_fill_missing(c, npt_v, nearest) for c in chunks]


def _fill_missing(pairs: np.ndarray, npt_v: int, nearest: np.ndarray) -> np.ndarray:
    """Every valid p-tile must appear in every kernel launch: the p row-min is a
    per-block OUTPUT, so an unvisited tile's rows come back undefined and would
    poison the carried minima / upper bounds.  Missing tiles re-fold their
    nearest pair — a no-op on the minima."""
    present = np.bincount(pairs[:, 0], minlength=npt_v) > 0 if len(pairs) else \
        np.zeros(npt_v, bool)
    missing = np.nonzero(~present)[0]
    if len(missing) == 0:
        return pairs
    extra = np.stack([missing, nearest[missing]], axis=1)
    merged = np.concatenate([pairs, extra]) if len(pairs) else extra
    return merged[np.lexsort((merged[:, 1], merged[:, 0]))]


def chamfer_distance_pruned(p: np.ndarray, q: np.ndarray, interpret: bool = False,
                            stats: dict | None = None):
    """Exact Chamfer distance via neighbor-pruned enumeration.  p: (n, 3),
    q: (m, 3) float arrays of VALID points (no padding).  Returns the scalar;
    per-point minima in the ORIGINAL point order are appended to ``stats`` when
    a dict is passed (tests pin them bit-equal to the brute path)."""
    p = np.asarray(p, dtype=np.float32).reshape(-1, 3)
    q = np.asarray(q, dtype=np.float32).reshape(-1, 3)
    n, m = len(p), len(q)
    if n == 0 or m == 0:
        return float("nan")
    if max(n, m) > _MAX_POINTS:
        raise ValueError(f"pruned chamfer supports up to {_MAX_POINTS} points/side")
    t0 = time.perf_counter()

    # -------- sort + pad (host)
    porder, qorder = _morton_order(p), _morton_order(q)
    bp, bq = _bucket(n), _bucket(m)
    ps = _pad_tiles(p[porder], bp)
    qs = _pad_tiles(q[qorder], bq)
    npt_v, nqt_v = -(-n // _TP), -(-m // _TQ)  # tiles containing >=1 valid point

    # -------- tile boxes + pairwise lower bounds (host)
    pt3 = ps[: npt_v * _TP].astype(np.float64).reshape(npt_v, _TP, 3)
    qt3 = qs[: nqt_v * _TQ].astype(np.float64).reshape(nqt_v, _TQ, 3)
    # the final partial tile replicates its last VALID point into the padding,
    # so min/max over the full tile is tight
    lb = _box_lb(pt3.min(axis=1), pt3.max(axis=1), qt3.min(axis=1), qt3.max(axis=1))

    pv = (np.arange(bp) < n).astype(np.float32).reshape(bp, 1)
    qv = (np.arange(bq) < m).astype(np.float32).reshape(1, bq)
    qsT = np.ascontiguousarray(qs.T)
    done = np.zeros((npt_v, nqt_v), bool)
    t_prep = time.perf_counter() - t0

    # -------- tightening rounds: nearest tiles first, bounds re-fetched
    pmin = jnp.full((bp, 1), jnp.inf, jnp.float32)
    qmin = jnp.full((bq // _TQ, _TQ), jnp.inf, jnp.float32)
    nearest = np.argmin(lb, axis=1)
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
        n_folded = 0
        for chunk in _chunk_pairs(pairs, npt_v, nearest):
            n_folded += len(chunk)
            ptx, qtx = _pad_pairs(chunk, _bucket_pairs(len(chunk)))
            pmin, qmin, ubp_d, ubq_d = _round_pass(ptx, qtx, ps, qsT, pv, qv,
                                                   pmin, qmin, _TP, _TQ, interpret)
        round_sizes.append(n_folded)
        # bounds from the LAST launch are global: its _fill_missing cover means
        # pmin2/qmin carried every tile's running min
        ubp = np.asarray(ubp_d[:npt_v], np.float64)
        ubq = np.asarray(ubq_d[:nqt_v], np.float64)
        k_lo = k_hi

    # -------- final survivors: pairs whose lower bound could still beat some
    # covered point's current minimum (in either direction)
    keep = (lb < ubp[:, None] * _MARGIN) | (lb < ubq[None, :] * _MARGIN)
    keep &= ~done
    # every valid p-tile must appear once more so its output block is written
    # (re-folding an already-done pair is a no-op on the minima)
    empty = ~keep.any(axis=1)
    keep[empty, nearest[empty]] = True
    pairs = np.argwhere(keep).astype(np.int32)  # row-major: sorted by p-tile
    t_rounds = time.perf_counter() - t0 - t_prep
    if stats is not None:
        total = npt_v * nqt_v
        stats.update(n=n, m=m, round_pairs=round_sizes, final_pairs=len(pairs),
                     dense_pairs=total,
                     work_frac=(sum(round_sizes) + len(pairs)) * _TP * _TQ / (n * m))

    rank_p = np.zeros(bp, np.int32)
    rank_p[porder] = np.arange(n, dtype=np.int32)  # original i -> sorted row
    rank_q = np.zeros(bq, np.int32)
    rank_q[qorder] = np.arange(m, dtype=np.int32)
    chunks = _chunk_pairs(pairs, npt_v, nearest)
    for chunk in chunks[:-1]:  # fold all but the last launch into the carry
        ptx, qtx = _pad_pairs(chunk, _bucket_pairs(len(chunk)))
        pmin, qmin, _, _ = _round_pass(ptx, qtx, ps, qsT, pv, qv,
                                       pmin, qmin, _TP, _TQ, interpret)
    ptx, qtx = _pad_pairs(chunks[-1], _bucket_pairs(len(chunks[-1])))
    out, d_pq, d_qp = _final_pass(ptx, qtx, ps, qsT, pv, qv, pmin, qmin,
                                  rank_p, rank_q,
                                  np.arange(bp) < n, np.arange(bq) < m,
                                  _TP, _TQ, interpret)
    val = float(out)
    if stats is not None:
        stats["d_pq"] = np.asarray(d_pq)[:n]
        stats["d_qp"] = np.asarray(d_qp)[:m]
        stats["t_prep"] = t_prep
        stats["t_rounds"] = t_rounds
        stats["t_final"] = time.perf_counter() - t0 - t_prep - t_rounds
    return val
