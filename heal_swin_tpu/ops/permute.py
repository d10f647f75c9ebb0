"""Token-permutation primitives for the shifted-window strategies.

``permute_tokens`` gathers rows of (B, N, C) along axis 1 with a fixed permutation.
Its custom VJP uses the INVERSE permutation gather as the backward — XLA's default
backward for gather is a scatter-add, which is considerably slower than a gather on
TPU.  For a bijective index map the transpose of a gather IS the inverse gather, so
this is exact."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def permute_tokens(x, perm, inv_perm):
    return jnp.take(x, perm, axis=1)


def _fwd(x, perm, inv_perm):
    return jnp.take(x, perm, axis=1), (perm, inv_perm)


def _bwd(res, g):
    perm, inv_perm = res
    zeros = jnp.zeros(perm.shape, dtype=jax.dtypes.float0)
    return jnp.take(g, inv_perm, axis=1), zeros, zeros


permute_tokens.defvjp(_fwd, _bwd)
