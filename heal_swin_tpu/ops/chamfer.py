"""Chamfer distance, TPU-native.

The reference outsources this to a CUDA extension (the only genuinely native kernel it
uses, SURVEY.md §2.9).  Here the O(N*M) pairwise minimum is a tiled matmul:
||p - q||^2 = ||p||^2 + ||q||^2 - 2 p.q, so each (N, tile) block of distances is one
MXU matmul; a lax.scan over tiles keeps a running minimum without materializing the
full distance matrix.  Invalid (padded) points are masked with +inf on the q side and
excluded from the mean on the p side — so variable-size point clouds run through ONE
compiled executable per bucket shape.

chamfer(p, q) = mean_i min_j ||p_i - q_j||^2 + mean_j min_i ||q_j - p_i||^2
(matching the reference's CUDA module semantics: mean of squared distances, both
directions, custom_metrics.py:569-573).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE = 4096


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


def _bucket(n: int) -> int:
    """Round up to a power of two (min 512) to bound recompiles across cloud sizes."""
    b = 512
    while b < n:
        b *= 2
    return b


def chamfer_distance(p: np.ndarray, q: np.ndarray) -> float:
    """Host API: p (N, 3), q (M, 3) float arrays (ragged sizes fine)."""
    p = np.asarray(p, dtype=np.float32).reshape(-1, 3)
    q = np.asarray(q, dtype=np.float32).reshape(-1, 3)
    if len(p) == 0 or len(q) == 0:
        return float("nan")
    bp, bq = _bucket(len(p)), _bucket(len(q))
    p_pad = np.zeros((bp, 3), np.float32)
    p_pad[: len(p)] = p
    q_pad = np.zeros((bq, 3), np.float32)
    q_pad[: len(q)] = q
    p_valid = np.arange(bp) < len(p)
    q_valid = np.arange(bq) < len(q)
    return float(chamfer_distance_masked(p_pad, q_pad, p_valid, q_valid))
