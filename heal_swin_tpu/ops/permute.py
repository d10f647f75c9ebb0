"""Token-permutation primitives for the shifted-window strategies.

``permute_tokens`` gathers rows of (B, N, C) along axis 1 with a fixed permutation.
Its custom VJP uses the INVERSE permutation gather as the backward — XLA's default
backward for gather is a scatter-add, which is considerably slower than a gather on
TPU.  For a bijective index map the transpose of a gather IS the inverse gather, so
this is exact.

The gather runs on the FLAT (B*N, C) view with batch-offset row indices: XLA's
row-gather on the 2-D form measured 2.3x faster than the axis-1 gather on the 3-D
form at paper scale (0.58 vs 1.35 ms for (2, 131072, 96) bf16 — the 3-D form gets a
transposed (N, B, C) layout plus copies; benchmarks/block_gather_probe.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flat_perm(perm, B, N):
    # (B*N,) row indices: perm offset by n*N per batch element
    return (perm[None, :] + (jnp.arange(B, dtype=perm.dtype) * N)[:, None]).reshape(-1)


@jax.custom_vjp
def permute_tokens(x, perm, inv_perm):
    B, N, C = x.shape
    rows = _flat_perm(perm, B, N)
    return jnp.take(x.reshape(B * N, C), rows, axis=0).reshape(B, N, C)


def _fwd(x, perm, inv_perm):
    return permute_tokens(x, perm, inv_perm), (perm, inv_perm)


def _bwd(res, g):
    perm, inv_perm = res
    B, N, C = g.shape
    rows = _flat_perm(inv_perm, B, N)
    zeros = jnp.zeros(perm.shape, dtype=jax.dtypes.float0)
    return jnp.take(g.reshape(B * N, C), rows, axis=0).reshape(B, N, C), zeros, zeros


permute_tokens.defvjp(_fwd, _bwd)
