"""Sequence parallelism over the HEALPix token axis.

The reference handles its 524,288-pixel sequences purely algorithmically (windowed
attention + hierarchy, SURVEY.md §5.7) and distributes over devices with data
parallelism only.  On TPU the nested-order layout admits a second, orthogonal axis:
**shard the token dimension across devices**.  Every op in HEAL-SWIN is token-local
under that sharding —

- window partition/reverse: reshapes of contiguous ``window_size`` runs, local as
  long as each shard holds a whole number of windows;
- window attention: per-window, batch- and shard-local (the Pallas kernels run
  unchanged on the local window batch);
- patch merging / expanding: the 4-children-per-parent nested hierarchy is
  sequence-contiguous, so a shard boundary at any multiple of 4 stays local;
- LayerNorm / MLP / heads / losses: per-token;

— except the **shifted-window permutations** (ops/shifting.py), which route tokens
globally.  Those become the one communication point: ``sharded_permute_tokens``
all-gathers the block input along the sequence axis and gathers this shard's output
rows locally.  Its custom VJP mirrors the unsharded ``ops/permute.permute_tokens``:
for a bijective permutation, the backward is the *inverse*-permutation gather of the
all-gathered cotangent — two collectives per shifted block per direction, no
scatter-adds.

Use: run the train step under ``jax.shard_map`` over a ``('data', 'seq')`` mesh
(training/trainer.py builds this when ``PLConfig.seq_parallel_devices > 1``), pass
``seq=(axis_name, n_shards)`` into the model's ``__call__``, and reduce losses /
metric increments with ``psum`` over both axes.  Parameters stay replicated;
activation residuals scale ~1/n_shards, which is what lets a single sample's
sequence (or an nside-512, 2M-pixel one) spread over a pod slice.

The all-gather materializes one full-sequence activation transiently (it is not
saved for the backward — the VJP re-gathers), so the steady-state memory win is the
full 1/n_shards on residuals.  An all-to-all exchange with per-shard-pair index
tables would cut the transient bandwidth ~n_shards-fold; measured on real multi-chip
hardware first (this dev environment exposes a single chip).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

SEQ_AXIS = "seq"


def match_vma(ct, like):
    """psum a cotangent over the mesh axes its primal is invariant to.

    Inside ``shard_map`` with ``check_vma=True``, a ``jax.custom_vjp`` bwd rule must
    return cotangents typed exactly like the primal inputs.  A parameter that enters
    replicated (invariant) but is used in device-varying compute gets a varying
    cotangent — the bwd rule itself must insert the cross-device reduction (for
    ordinary ops JAX's vma-typed transpose does this automatically; custom rules
    are opaque).  No-op outside shard_map (vma sets are empty) and for matching
    types, so every custom VJP in the tree calls this unconditionally."""
    extra = tuple(
        a
        for a in getattr(jax.typeof(ct), "vma", frozenset())
        if a not in getattr(jax.typeof(like), "vma", frozenset())
    )
    return jax.lax.psum(ct, extra) if extra else ct


def psum_tree(tree, axis_names):
    """``lax.psum`` every leaf over ``axis_names``, promoting device-invariant leaves
    to varying first (``lax.pcast``).

    Needed because shard_map's vma typing refuses ``psum`` along an axis a value is
    invariant over — but for sums of LOCAL contributions that multiply-by-axis-size
    is exactly the intended semantics: e.g. a metric state's element count computed
    from a shard-local ``ones(target.shape)`` is the same number on every sequence
    shard, yet each shard counted *distinct* tokens, so the global count is
    n_shards times it."""
    axes = tuple(axis_names)

    def f(x):
        vma = getattr(jax.typeof(x), "vma", frozenset())
        missing = tuple(a for a in axes if a not in vma)
        if missing:
            x = jax.lax.pcast(x, missing, to="varying")
        return jax.lax.psum(x, axes)

    return jax.tree.map(f, tree)


def seq_local_slice(a, axis_name: str, n_shards: int, axis: int = 0):
    """This shard's slice of a (globally known) array along ``axis``.

    ``a`` is typically a trace-time constant (a shift permutation, window group ids,
    the absolute position embedding) of which each sequence shard needs rows
    ``[i*n_local, (i+1)*n_local)`` for ``i = axis_index(axis_name)``."""
    a = jnp.asarray(a)
    n = a.shape[axis]
    assert n % n_shards == 0, (
        f"axis {axis} of shape {a.shape} not divisible by {n_shards} sequence shards"
    )
    nl = n // n_shards
    i = lax.axis_index(axis_name)
    return lax.dynamic_slice_in_dim(a, i * nl, nl, axis=axis)


def _gather_rows(xg, rows_local, B, N, C):
    """Rows of the (B, N, C) gathered sequence on the flat (B*N, C) view (the fast
    gather form, see ops/permute.py)."""
    rows = (
        rows_local[None, :] + (jnp.arange(B, dtype=rows_local.dtype) * N)[:, None]
    ).reshape(-1)
    return jnp.take(xg.reshape(B * N, C), rows, axis=0).reshape(B, -1, C)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sharded_permute_tokens(x, perm, inv_perm, axis_name, n_shards):
    """Token-sharded ``y[j] = x_global[perm[j]]``.

    x: (B, N/n_shards, C) — this shard's tokens.  perm/inv_perm: (N,) global
    permutation + inverse (host-precomputed, trace-time constants).  Must run inside
    ``shard_map`` with ``axis_name`` in scope.  Returns this shard's (B, N/n_shards, C)
    rows of the permuted global sequence."""
    return _permute_apply(x, perm, axis_name, n_shards)


def _permute_apply(x, perm, axis_name, n_shards):
    B, Nl, C = x.shape
    N = Nl * n_shards
    xg = lax.all_gather(x, axis_name, axis=1, tiled=True)  # (B, N, C)
    rows_local = seq_local_slice(jnp.asarray(perm), axis_name, n_shards)
    return _gather_rows(xg, rows_local, B, N, C)


def _permute_fwd(x, perm, inv_perm, axis_name, n_shards):
    return _permute_apply(x, perm, axis_name, n_shards), (perm, inv_perm)


def _permute_bwd(axis_name, n_shards, res, g):
    perm, inv_perm = res
    B, Nl, C = g.shape
    N = Nl * n_shards
    gg = lax.all_gather(g, axis_name, axis=1, tiled=True)
    rows_local = seq_local_slice(jnp.asarray(inv_perm), axis_name, n_shards)
    dx = _gather_rows(gg, rows_local, B, N, C)
    zeros = jnp.zeros(np.shape(perm), dtype=jax.dtypes.float0)
    return dx, zeros, zeros


sharded_permute_tokens.defvjp(_permute_fwd, _permute_bwd)
