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
full 1/n_shards on residuals.  The HEALPix shift permutations are nearly shard-local
(3-6% of rows cross a boundary at paper scale), so a boundary all-to-all exchange
(``sharded_permute_tokens_a2a``, HEAL_SWIN_SEQ_EXCHANGE=all_to_all) is implemented
as an opt-in that moves ~16-30x fewer bytes; the all-gather stays the default until
the exchange is measured on real multi-chip hardware (this dev environment exposes
a single chip — equivalence is pinned on the CPU mesh).
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
    types, so every custom VJP in the tree calls this unconditionally.

    The axis tuple is CANONICALIZED to mesh axis-name order (fallback: sorted).
    ``vma`` is a frozenset, and a multi-axis ``psum``'s replica-group flattening
    depends on the axis ORDER (("data","seq") -> {{0..7}} ascending vs
    ("seq","data") -> {{0,2,4,6,1,3,5,7}}); frozenset iteration order is
    string-hash dependent, i.e. differs across PROCESSES under hash
    randomization, so an uncanonicalized tuple makes coordinator-connected
    processes compile different (never-matching) gloo/NCCL rendezvous keys for
    the same grad psum — the multi-process SP deadlock fixed in r5."""
    ct_vma = getattr(jax.typeof(ct), "vma", frozenset())
    like_vma = getattr(jax.typeof(like), "vma", frozenset())
    extra = ct_vma - like_vma
    if not extra:
        return ct
    return jax.lax.psum(ct, _canonical_axis_order(extra))


def _canonical_axis_order(axes) -> tuple:
    """Deterministic (process-independent) ordering for a set of mesh axis
    names: the surrounding abstract mesh's axis_name order when available,
    alphabetical otherwise."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        names = tuple(getattr(mesh, "axis_names", ()) or ())
        if all(a in names for a in axes):
            return tuple(a for a in names if a in axes)
    except Exception:
        pass
    return tuple(sorted(axes))


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


# --------------------------------------------------------------------------- a2a
# Boundary all-to-all exchange: the HEALPix shift permutations are nearly
# shard-local — at paper scale only 3.0-6.2% of rows cross a shard boundary
# (ring_shift sp=2..8; 0.01% for nest_roll) — so instead of all-gathering the
# full sequence, each shard sends ONLY the rows its peers need (padded to the
# max pair count L) through one lax.all_to_all, then assembles its output from
# [local rows ; received rows] with a single precomputed gather.  ~16-30x less
# ICI traffic than the all-gather at equal math.  Opt-in via
# HEAL_SWIN_SEQ_EXCHANGE=all_to_all until measured on real multi-chip hardware
# (this dev environment exposes one chip; equivalence is pinned on the CPU mesh).

_A2A_TABLE_CACHE: dict = {}


def _a2a_tables(perm: np.ndarray, n_shards: int):
    """(send (sp, sp, L), out (sp, Nl), L) int32 tables for y[j] = x_global[perm[j]].

    send[s][d][k]: local row of shard s shipped to shard d in slot k (0-padded);
    out[d][j]: index into shard d's pool [x_local (Nl) ; recv (sp, L) flattened]."""
    import hashlib

    key = (hashlib.sha1(perm.tobytes()).hexdigest(), int(n_shards))
    hit = _A2A_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    N = perm.size
    sp = n_shards
    Nl = N // sp
    src_shard = perm // Nl
    src_row = perm % Nl
    dst_shard = np.arange(N) // Nl

    counts = np.zeros((sp, sp), dtype=np.int64)
    np.add.at(counts, (src_shard, dst_shard), 1)
    np.fill_diagonal(counts, 0)
    L = max(int(counts.max()), 1)  # L=1 keeps shapes static for pure-local perms

    send = np.zeros((sp, sp, L), dtype=np.int32)
    out = np.zeros((sp, Nl), dtype=np.int32)
    slot = np.zeros((sp, sp), dtype=np.int64)
    for d in range(sp):
        g = slice(d * Nl, (d + 1) * Nl)
        s_arr, r_arr = src_shard[g], src_row[g]
        local = s_arr == d
        out[d, local] = r_arr[local]
        for j in np.nonzero(~local)[0]:
            s, r = int(s_arr[j]), int(r_arr[j])
            k = slot[s, d]
            send[s, d, k] = r
            slot[s, d] = k + 1
            out[d, j] = Nl + s * L + k
    _A2A_TABLE_CACHE[key] = (send, out, L)
    return send, out, L


def _a2a_apply(x, send_tbl, out_tbl, axis_name, n_shards, L):
    B, Nl, C = x.shape
    i = lax.axis_index(axis_name)
    send_rows = lax.dynamic_slice_in_dim(send_tbl, i, 1, 0)[0]  # (sp, L)
    out_rows = lax.dynamic_slice_in_dim(out_tbl, i, 1, 0)[0]  # (Nl,)
    send = jnp.take(x, send_rows.reshape(-1), axis=1).reshape(B, n_shards, L, C)
    recv = lax.all_to_all(send, axis_name, split_axis=1, concat_axis=1)
    pool = jnp.concatenate([x, recv.reshape(B, n_shards * L, C)], axis=1)
    return _gather_rows(pool, out_rows, B, Nl + n_shards * L, C)


_A2A_FN_CACHE: dict = {}


def sharded_permute_tokens_a2a(x, perm, inv_perm, axis_name, n_shards):
    """Token-sharded ``y[j] = x_global[perm[j]]`` via the boundary all-to-all
    (see module comment).  perm/inv_perm: HOST numpy arrays — the exchange tables
    are precomputed from their concrete values, so the permutation is baked into
    a cached custom-VJP closure (stable identity across jit traces)."""
    perm = np.asarray(perm)
    inv_perm = np.asarray(inv_perm)
    import hashlib

    key = (hashlib.sha1(perm.tobytes()).hexdigest(), axis_name, int(n_shards))
    fn = _A2A_FN_CACHE.get(key)
    if fn is None:
        send, out, L = _a2a_tables(perm, n_shards)
        send_i, out_i, L_i = _a2a_tables(inv_perm, n_shards)

        @jax.custom_vjp
        def fn(x):
            return _a2a_apply(x, jnp.asarray(send), jnp.asarray(out),
                              axis_name, n_shards, L)

        def fwd(x):
            return fn(x), None

        def bwd(_, g):
            # bijective permutation: the cotangent routes through the SAME
            # exchange with the INVERSE tables (padded slots are never read,
            # so they contribute nothing)
            return (_a2a_apply(g, jnp.asarray(send_i), jnp.asarray(out_i),
                               axis_name, n_shards, L_i),)

        fn.defvjp(fwd, bwd)
        _A2A_FN_CACHE[key] = fn
    return fn(x)


def sharded_permute(x, perm, inv_perm, axis_name, n_shards):
    """Dispatcher used by the model: HEAL_SWIN_SEQ_EXCHANGE=all_to_all selects the
    boundary exchange; default is the measured-correct all-gather."""
    import os

    if os.environ.get("HEAL_SWIN_SEQ_EXCHANGE") == "all_to_all":
        return sharded_permute_tokens_a2a(
            x, np.asarray(perm), np.asarray(inv_perm), axis_name, n_shards
        )
    return sharded_permute_tokens(
        x, jnp.asarray(perm), jnp.asarray(inv_perm), axis_name, n_shards
    )
