"""Chamfer distance, TPU-native.

The reference outsources this to a CUDA extension (the only genuinely native kernel it
uses, SURVEY.md §2.9; the pip ``chamfer_distance`` module computes plain f32
``(x1-x2)^2 + ...`` per pair).  Here the CPU-fallback O(N*M) pairwise minimum is a
tiled matmul: ||p - q||^2 = ||p||^2 + ||q||^2 - 2 p.q, so each (N, tile) block of
distances is one MXU matmul; a lax.scan over tiles keeps a running minimum without
materializing the full distance matrix.  CAVEAT of the expansion form: it cancels
catastrophically when pairs are close relative to their range (abs error ~ulp(R^2));
the TPU paths (the Pallas kernel below and ops/chamfer_pruned.py) compute the
reference's accurate DIFFERENCE form instead at the same VPU cost.  Invalid (padded)
points are masked with +inf on the q side and excluded from the mean on the p side —
so variable-size point clouds run through ONE compiled executable per bucket shape.

chamfer(p, q) = mean_i min_j ||p_i - q_j||^2 + mean_j min_i ||q_j - p_i||^2
(matching the reference's CUDA module semantics: mean of squared distances, both
directions, custom_metrics.py:569-573).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 4096

# Pallas kernel block sizes (f32 (PT, QT) distance blocks live on the VPU;
# several elementwise temporaries are alive at once, so size against the 16 MB
# scoped VMEM like the attention kernel caps in models/layers.py).  Every
# bucket from _bucket() is a multiple of both, so either cloud of a pair can
# take either side of the kernel.
_PT = 256
_QT = 1024


@functools.partial(jax.jit, static_argnames=("tile",))
def _min_sq_dists(p, q, q_valid, tile: int = TILE):
    """For each p_i: min over valid q_j of ||p_i - q_j||^2.  p: (N, 3), q: (M, 3)."""
    N = p.shape[0]
    M = q.shape[0]
    p_sq = jnp.sum(p * p, axis=1)  # (N,)

    n_tiles = -(-M // tile)
    pad = n_tiles * tile - M
    q_pad = jnp.pad(q, ((0, pad), (0, 0)))
    v_pad = jnp.pad(q_valid, (0, pad))
    q_tiles = q_pad.reshape(n_tiles, tile, 3)
    v_tiles = v_pad.reshape(n_tiles, tile)

    def body(carry, qt):
        q_t, v_t = qt
        q_sq = jnp.sum(q_t * q_t, axis=1)  # (tile,)
        # precision=HIGHEST: on TPU a plain f32 dot runs as bf16 MXU passes
        # (~1e-2 relative); the p_sq + q_sq - 2*cross cancellation amplifies that
        # into tens of m^2 at ~100 m ranges, corrupting the headline chamfer
        # metrics vs the reference's exact-f32 CUDA kernel.  preferred_element_type
        # only sets the ACCUMULATOR type, not the input rounding.
        cross = jnp.dot(p, q_t.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (N, tile)
        d = p_sq[:, None] + q_sq[None, :] - 2.0 * cross
        d = jnp.where(v_t[None, :], d, jnp.inf)
        return jnp.minimum(carry, jnp.min(d, axis=1)), None

    init = jnp.full((N,), jnp.inf, jnp.float32)
    mins, _ = jax.lax.scan(body, init, (q_tiles, v_tiles))
    return jnp.maximum(mins, 0.0)  # clamp fp negatives


@functools.partial(jax.jit, static_argnames=("tile",))
def chamfer_distance_masked(p, q, p_valid, q_valid, tile: int = TILE):
    """Symmetric Chamfer distance over valid points (see module docstring)."""
    d_pq = _min_sq_dists(p, q, q_valid, tile)
    d_qp = _min_sq_dists(q, p, p_valid, tile)
    n_p = jnp.maximum(jnp.sum(p_valid), 1)
    n_q = jnp.maximum(jnp.sum(q_valid), 1)
    mean_pq = jnp.sum(jnp.where(p_valid, d_pq, 0.0)) / n_p
    mean_qp = jnp.sum(jnp.where(q_valid, d_qp, 0.0)) / n_q
    return mean_pq + mean_qp


# --------------------------------------------------------------------------- pallas
# At paper eval scale (~1.2M foreground points per side, the
# chamfer_distance_full_res_hp_masked headline metric) the jnp path above is
# unusable: each scan step materializes an (N, tile) f32 dot output — 34 GB at
# N = 2^21 — and the K=3 matmul wastes ~40x of the MXU's K=128 tiling even
# before precision=HIGHEST multiplies passes.  The Pallas kernel instead
# computes the (PT, QT) distance block directly on the VPU in exact f32
# (3 broadcast FMAs + 2 adds per pair — no MXU, no K padding, no HIGHEST
# multiplier) and folds it into BOTH running minima in one pass — the N*M
# distance matrix is computed once, not once per direction:
#   * row-min (p side): q tiles sit on the FAST grid axis, so the (PT, 1)
#     block stays resident in VMEM across the inner q sweep (init at j == 0,
#     auto-writeout when the p tile advances).
#   * col-min (q side): its tile revisits across p tiles are non-consecutive
#     and output-block revisits round-trip through HBM with undefined reload
#     semantics, so instead the ENTIRE col-min lives in VMEM as one
#     constant-index (M/QT, QT) output block (f32, no sublane padding:
#     6.3 MB at the 1.57M-point bucket) updated per step at dynamic row j and
#     flushed once at the end.  The wrapper chunks q if M would not fit.
# Memory is O(N + M) and the arithmetic matches the reference CUDA kernel's
# plain f32 semantics exactly.

# Largest q-side chunk whose resident col-min block (M*4 bytes) fits VMEM next
# to the ~4 MB of (PT, QT) block temporaries (16 MB scoped VMEM, measured caps
# culture of models/layers.py).
_QCHUNK = 2_097_152


def _min_both_kernel(p_ref, qT_ref, pv_ref, qv_ref, pmin_ref, qmin_ref):
    """One grid step: the (PT, QT) squared-distance block between p tile i
    (slow axis) and q tile j (fast axis), folded into p's row-min and q's
    col-min.  q arrives transposed (3, QT) so each coordinate is a (1, QT)
    lane row; p is (PT, 3) so each coordinate is a (PT, 1) sublane column —
    their products broadcast to the (PT, QT) block without any relayout."""
    i = pl.program_id(0)  # p tile (slow axis)
    j = pl.program_id(1)  # q tile (fast axis)

    @pl.when(j == 0)
    def _init_pmin():
        pmin_ref[...] = jnp.full_like(pmin_ref, jnp.inf)

    @pl.when((i == 0) & (j == 0))
    def _init_qmin():
        qmin_ref[...] = jnp.full_like(qmin_ref, jnp.inf)

    p = p_ref[...]  # (PT, 3) f32
    q = qT_ref[...]  # (3, QT) f32
    pv = pv_ref[...]  # (PT, 1) f32 (1 = valid)
    qv = qv_ref[...]  # (1, QT) f32 (1 = valid)
    px, py, pz = p[:, 0:1], p[:, 1:2], p[:, 2:3]
    qx, qy, qz = q[0:1, :], q[1:2, :], q[2:3, :]
    # DIFFERENCE form, matching the reference's CUDA kernel (the pip
    # chamfer_distance extension computes (x1-x2)^2+...): the expansion
    # |p|^2+|q|^2-2p.q costs the same 8 broadcast VPU ops but catastrophically
    # cancels when pairs are close relative to their range — exactly the regime
    # of a converged depth model's pred-vs-target clouds.
    dx = px - qx  # (PT, QT)
    dy = py - qy
    dz = pz - qz
    d = dx * dx + dy * dy + dz * dz
    m = jnp.min(jnp.where(qv > 0.0, d, jnp.inf), axis=1, keepdims=True)  # (PT, 1)
    pmin_ref[...] = jnp.minimum(pmin_ref[...], m)
    c = jnp.min(jnp.where(pv > 0.0, d, jnp.inf), axis=0)  # (QT,)
    qmin_ref[j, :] = jnp.minimum(qmin_ref[j, :], c)


@functools.lru_cache(maxsize=None)
def _make_min_both(N: int, M: int, pt: int, qt: int, interpret: bool):
    grid = (N // pt, M // qt)  # q tiles iterate fastest: pmin stays resident per i
    mq = M // qt

    def call(p, qT, pv, qv):
        return pl.pallas_call(
            _min_both_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((pt, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, qt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((pt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((pt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((mq, qt), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, 1), jnp.float32),
                jax.ShapeDtypeStruct((mq, qt), jnp.float32),
            ],
            interpret=interpret,
        )(p, qT, pv, qv)

    return call


@functools.partial(jax.jit, static_argnames=("interpret",))
def chamfer_distance_masked_pallas(p, q, p_valid, q_valid, interpret: bool = False):
    """Pallas twin of ``chamfer_distance_masked`` (same semantics, exact f32).
    p: (N, 3), q: (M, 3) f32 with N % _PT == 0 and M % _QT == 0 (the host API's
    bucketing guarantees this); *_valid: (N,)/(M,) bool."""
    N, M = p.shape[0], q.shape[0]
    pv = p_valid.astype(jnp.float32).reshape(N, 1)
    qv = q_valid.astype(jnp.float32).reshape(1, M)
    d_pq = jnp.full((N, 1), jnp.inf, jnp.float32)
    d_qp_parts = []
    for lo in range(0, M, _QCHUNK):  # static chunking (shapes known at trace time)
        hi = min(lo + _QCHUNK, M)
        qT = q[lo:hi].T  # (3, chunk) — one small relayout, no per-block transposes
        pc, qc = _make_min_both(N, hi - lo, _PT, _QT, interpret)(
            p, qT, pv, qv[:, lo:hi]
        )
        d_pq = jnp.minimum(d_pq, pc)
        d_qp_parts.append(qc.reshape(-1))
    d_pq = jnp.maximum(d_pq[:, 0], 0.0)  # clamp fp negatives (matches the jnp path)
    d_qp = jnp.maximum(jnp.concatenate(d_qp_parts), 0.0)
    n_p = jnp.maximum(jnp.sum(p_valid), 1)
    n_q = jnp.maximum(jnp.sum(q_valid), 1)
    mean_pq = jnp.sum(jnp.where(p_valid, d_pq, 0.0)) / n_p
    mean_qp = jnp.sum(jnp.where(q_valid, d_qp, 0.0)) / n_q
    return mean_pq + mean_qp


def _bucket(n: int) -> int:
    """Round up to a half-octave bucket (2048·{1, 1.5}·2^k) — at most ~1.5x padded
    work instead of power-of-2's ~2x, while keeping the number of distinct
    compiled shapes across cloud sizes small (~2 per octave).  Every bucket is a
    multiple of both kernel tile sizes (_PT, _QT), so either cloud of a pair can
    take either side of the Pallas kernel."""
    b = 2048
    while True:
        if n <= b:
            return b
        if n <= b + b // 2:
            return b + b // 2
        b *= 2


# Below this pair count the brute kernel beats the pruned pipeline's host
# overhead (sort + box bounds + pair building, ~1-2 s at paper scale).
_PRUNE_MIN_PAIRS = 2.5e11


def _impl(n: int, m: int) -> str:
    env = os.environ.get("HEAL_SWIN_CHAMFER_IMPL")  # "pruned"|"pallas"|"jnp"|unset
    if env in ("pruned", "pallas", "jnp"):
        return env
    if jax.default_backend() != "tpu":
        return "jnp"
    return "pruned" if float(n) * float(m) >= _PRUNE_MIN_PAIRS else "pallas"


def prepare_pair(p: np.ndarray, q: np.ndarray):
    """Host-side preprocessing for ``chamfer_distance`` (Morton sort + tile
    tables + box bounds), so a caller can overlap it with another pair's
    device folds (run this in a worker thread, pass the result back as
    ``prepared=``).  Returns None when the pair wouldn't take the pruned path
    — ``chamfer_distance`` then just recomputes nothing extra."""
    p = np.asarray(p, dtype=np.float32).reshape(-1, 3)
    q = np.asarray(q, dtype=np.float32).reshape(-1, 3)
    if len(p) == 0 or len(q) == 0 or _impl(len(p), len(q)) != "pruned":
        return None
    from heal_swin_tpu.ops.chamfer_pruned import chamfer_prepare

    return chamfer_prepare(p, q)


def chamfer_distance(p: np.ndarray, q: np.ndarray, prepared=None) -> float:
    """Host API: p (N, 3), q (M, 3) float arrays (ragged sizes fine).  On TPU the
    paper's ~1.2M-point full_res clouds run the exact neighbor-PRUNED pipeline
    (ops/chamfer_pruned.py — bit-identical values, prunes ~97% of the pair
    enumeration), smaller clouds the brute Pallas VPU kernel; elsewhere the jnp
    tiled-matmul path.  ``prepared``: an optional ``prepare_pair(p, q)`` result
    (host prep done elsewhere, e.g. overlapped with a previous pair's folds)."""
    p = np.asarray(p, dtype=np.float32).reshape(-1, 3)
    q = np.asarray(q, dtype=np.float32).reshape(-1, 3)
    if len(p) == 0 or len(q) == 0:
        return float("nan")
    impl = _impl(len(p), len(q))
    if impl == "pruned":
        from heal_swin_tpu.ops.chamfer_pruned import chamfer_distance_pruned

        return chamfer_distance_pruned(p, q, prepared=prepared)
    bp, bq = _bucket(len(p)), _bucket(len(q))
    p_pad = np.zeros((bp, 3), np.float32)
    p_pad[: len(p)] = p
    q_pad = np.zeros((bq, 3), np.float32)
    q_pad[: len(q)] = q
    p_valid = np.arange(bp) < len(p)
    q_valid = np.arange(bq) < len(q)
    fn = chamfer_distance_masked_pallas if impl == "pallas" else chamfer_distance_masked
    return float(fn(p_pad, q_pad, p_valid, q_valid))
