"""Token-permutation primitives for the shifted-window strategies.

``permute_tokens`` gathers rows of (B, N, C) along axis 1 with a fixed permutation.
Its custom VJP uses the INVERSE permutation gather as the backward — XLA's default
backward for gather is a scatter-add, which is considerably slower than a gather on
TPU.  For a bijective index map the transpose of a gather IS the inverse gather, so
this is exact.

The gather runs on the FLAT (B*N, C) view with batch-offset row indices: XLA's
row-gather on the 2-D form measured 2.3x faster than the axis-1 gather on the 3-D
form at paper scale (0.58 vs 1.35 ms for (2, 131072, 96) bf16 — the 3-D form gets a
transposed (N, B, C) layout plus copies; benchmarks/block_gather_probe.py).

Large tables are gathered in per-batch-group chunks: XLA TPU's row gather falls
off a cliff when the SOURCE table outgrows what it can stage on-chip — measured
154 GB/s at a 72 MiB table vs 33.5 GB/s at 96 MiB (4.6x per-op, independent of
index count; benchmarks/gather_cliff_probe.py).  The permutation is per-sample,
so the flat table splits cleanly into groups of whole samples that stay under
the cliff, each gathered with the shared group-local indices — identical values,
and the in-model A/B at paper scale measured batch 4: 14.3 -> 16.66 img/s,
batch 8: 12.8 -> 15.10 (docs/PERFORMANCE.md "Batch scaling")."""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Largest source table the fast gather path handles (bytes).  Measured on v5e:
# 72 MiB tables gather at ~154 GB/s, 96 MiB at ~33.5 GB/s — the cliff sits
# between; 76 MiB keeps every measured-fast shape on the fast side.
_TABLE_BYTES_FAST = 76 * 2**20


def _flat_perm(perm, B, N):
    # (B*N,) row indices: perm offset by n*N per batch element
    return (perm[None, :] + (jnp.arange(B, dtype=perm.dtype) * N)[:, None]).reshape(-1)


def _group_size(B: int, sample_bytes: int) -> int:
    """Balanced group size (in whole samples) whose group table stays under the
    gather cliff: the fewest ceil-sized groups that fit, then re-balanced so
    e.g. B=5 with room for 3 splits 3+2 instead of five singles (ragged last
    group allowed — the permutation is per-sample, so values are identical).
    Returns 1 if even a single sample exceeds the cliff (nothing to chunk)."""
    m_max = min(B, _TABLE_BYTES_FAST // max(sample_bytes, 1))
    if m_max <= 1:
        return 1
    n_groups = -(-B // m_max)
    return -(-B // n_groups)


def _permute_gather(x, perm):
    """(B, N, C) -> (B, N, C) rows-of-flat-view gather, chunked past the cliff."""
    B, N, C = x.shape
    flat = x.reshape(B * N, C)
    m = _group_size(B, N * C * x.dtype.itemsize)
    if m >= B or m * N * C * x.dtype.itemsize > _TABLE_BYTES_FAST:
        rows = _flat_perm(perm, B, N)
        return jnp.take(flat, rows, axis=0).reshape(B, N, C)
    outs = []
    for s in range(0, B, m):
        g = min(m, B - s)
        rows = _flat_perm(perm, g, N)
        outs.append(jnp.take(flat[s * N:(s + g) * N], rows, axis=0))
    return jnp.concatenate(outs, axis=0).reshape(B, N, C)


@jax.custom_vjp
def permute_tokens(x, perm, inv_perm):
    return _permute_gather(x, perm)


def _fwd(x, perm, inv_perm):
    return permute_tokens(x, perm, inv_perm), (perm, inv_perm)


def _bwd(res, g):
    perm, inv_perm = res
    zeros = jnp.zeros(perm.shape, dtype=jax.dtypes.float0)
    return _permute_gather(g, inv_perm), zeros, zeros


permute_tokens.defvjp(_fwd, _bwd)
