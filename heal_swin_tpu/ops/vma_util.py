"""Pallas out-shape vma stamping for shard_map.

Inside ``jax.shard_map(..., check_vma=True)`` every ``pl.pallas_call`` must declare
how its outputs vary across mesh axes (``jax.ShapeDtypeStruct(..., vma=...)``), or
tracing fails with "vma on jax.ShapeDtypeStruct must not be None".  A kernel's
outputs vary exactly like its per-shard data operand (weights enter replicated, but
every output depends on the sharded activations), so stamping with the data
operand's vma is both sound and maximal.  Outside shard_map the vma set is empty
and this is a no-op — the kernels keep working under plain jit.
"""

from __future__ import annotations

import jax


def pcast_like(a, ref):
    """Promote ``a`` to vary over the manual mesh axes ``ref`` varies over
    (``lax.pcast``).  Needed when a replicated operand (weights, scalars) feeds a
    ``pallas_call`` next to sharded operands AND the call may run in INTERPRET
    mode: the interpreted kernel body executes as plain jax ops under shard_map's
    vma typing, which requires e.g. dot_general operands to agree.  On compiled
    TPU pallas the kernel body is opaque (mixed-vma inputs are fine) and the cast
    is type-only; outside shard_map this is a no-op."""
    extra = sorted(
        ax for ax in getattr(jax.typeof(ref), "vma", frozenset())
        if ax not in getattr(jax.typeof(a), "vma", frozenset())
    )  # sorted: frozenset order is per-process random (hash randomization);
    # pcast emits no collective, but deterministic HLO across processes anyway
    return jax.lax.pcast(a, tuple(extra), to="varying") if extra else a


def with_vma(structs, ref):
    """Return ``structs`` (one ShapeDtypeStruct or a list) stamped with the varying
    manual axes of the ``ref`` operand."""
    vma = getattr(jax.typeof(ref), "vma", frozenset())
    if not vma:
        return structs

    def rebuild(s):
        return jax.ShapeDtypeStruct(s.shape, s.dtype, vma=vma)

    if isinstance(structs, jax.ShapeDtypeStruct):
        return rebuild(structs)
    return [rebuild(s) for s in structs]
