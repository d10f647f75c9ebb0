#!/usr/bin/env python3
"""Feasibility + pricing probe for the standalone run-DMA shift gather at the
real model widths — the committed REJECTION measurement closing VERDICT r2
item 6's "fold the shift into the kernel operand feed" angle.

dma_gather_probe.py priced run DMAs at C=128 (1.6x faster than the XLA row
gather).  This probe establishes that the win cannot be applied at the stage
that carries the time (stage 0, C=96), because Mosaic constrains every DMA
slice to the memref tiling — exact compiler errors measured on chip:

  (NS, 16, 96) slot view  -> "Slice shape along dimension 2 must be aligned to
                              tiling (128), but is 96"
  (NS, 12, 128) slot view -> "Slice shape along dimension 1 must be aligned to
                              tiling (8), but is 12"
  1-D flat view, 1536-elem slots -> "Slice shape along dimension 0 must be
                              aligned to tiling (1024), but is 1536"

A 16-token C=96 run is 1536 bf16 elements — NO legal expression.  The only
legal granularity at C=96 is a 32-token group ((24, 128) / 3072 elems), and
the ring-shift permutation has 0.0% 32-token aligned+contiguous groups (96.6%
at 16 tokens — run starts 16-align but never 32-align; same for
nest_grid_shift: 100% at 16, 0% at 32).  C>=192 stages ARE expressible (93.3 /
87.3 / 77.3% at 16-token slots) but total ~1.5 ms/step of gather there; the
~35% DMA margin minus side-buffer + cond overhead is below the in-model noise
floor.  docs/PERFORMANCE.md "In-kernel shift DMA pricing" has the full table.

Variants measured against the XLA row gather (run at RG_C=128, the legal
shape, to price the mechanics; RG_C=96 reproduces the Mosaic rejection):
  slots       — 64 slot DMAs per 1024-token block from x3, issue-all-then-drain
                (C=128: 1.391 ms vs 2.035 ms gather, 1.46x)
  slots_cond  — same, but each DMA's source ref chosen by lax.cond on a
                prefetched flag (the side-buffer dispatch a production kernel
                would need): +13% over slots — cond-around-DMA is cheap
  fixup       — XLA .at[rows].set of the ~3.4% side rows (the cond-free
                alternative): 1.16 ms at stage-0 scale — more than the gather
                it would fix up; rejected

Usage: python benchmarks/run_gather_probe.py   (env: RG_C, RG_ITERS)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = int(os.environ.get("RG_C", 128))
T = 262144
BLK = 1024
S = 16  # slot rows
SLOTS_PER_BLK = BLK // S
NS = T // S
GRID = T // BLK


def _slots_kernel(idx_ref, x3, o_ref, sem):
    i = pl.program_id(0)
    cps = []
    for r in range(SLOTS_PER_BLK):
        src = idx_ref[i * SLOTS_PER_BLK + r]
        cp = pltpu.make_async_copy(
            x3.at[src], o_ref.at[pl.ds(r * S, S), :], sem
        )
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()


def _slots_cond_kernel(idx_ref, flag_ref, x3, side3, o_ref, sem):
    i = pl.program_id(0)
    cps = []
    for r in range(SLOTS_PER_BLK):
        src = idx_ref[i * SLOTS_PER_BLK + r]
        flag = flag_ref[i * SLOTS_PER_BLK + r]
        dst = o_ref.at[pl.ds(r * S, S), :]

        def _from_x(src=src, dst=dst):
            pltpu.make_async_copy(x3.at[src], dst, sem).start()

        def _from_side(src=src, dst=dst):
            pltpu.make_async_copy(side3.at[src], dst, sem).start()

        jax.lax.cond(flag == 0, _from_x, _from_side)
        cps.append(None)
    # drain: one wait per issued DMA on the shared semaphore
    for r in range(SLOTS_PER_BLK):
        pltpu.make_async_copy(
            x3.at[0], o_ref.at[pl.ds(0, S), :], sem
        ).wait()


def make_slots():
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(GRID,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BLK, C), lambda i, idx: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _slots_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, C), jnp.bfloat16),
    )


def make_slots_cond():
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(GRID,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BLK, C), lambda i, idx, flg: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _slots_cond_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, C), jnp.bfloat16),
    )


@functools.partial(jax.jit, static_argnames=("which", "iters"))
def bench_fn(x, idx, flags, perm, fix_rows, fix_src, which: str, iters: int):
    def body(c, _):
        xi = x + c.astype(x.dtype)
        if which == "gather":
            y = jnp.take(xi, perm, axis=0)
        elif which == "slots":
            y = make_slots()(idx, xi.reshape(NS, S, C))
        elif which == "slots_cond":
            x3 = xi.reshape(NS, S, C)
            y = make_slots_cond()(idx, flags, x3, x3)
        elif which == "fixup":
            y = xi.at[fix_rows].set(xi[fix_src])
        return jnp.float32(y[0, 0]), ()

    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
    return c


def main():
    iters = int(os.environ.get("RG_ITERS", 50))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, C)), jnp.bfloat16)
    idx = jnp.asarray(rng.permutation(NS).astype(np.int32))
    flags = jnp.asarray((rng.random(NS) < 0.034).astype(np.int32))
    perm = jnp.asarray(
        (np.asarray(idx)[:, None] * S + np.arange(S)[None, :]).reshape(-1)
        .astype(np.int32))
    nbad = int(0.034 * T)
    fix_rows = jnp.asarray(np.sort(rng.choice(T, nbad, replace=False)).astype(np.int32))
    fix_src = jnp.asarray(rng.choice(T, nbad, replace=False).astype(np.int32))

    for which in ("gather", "slots", "slots_cond", "fixup"):
        try:
            v = float(bench_fn(x, idx, flags, perm, fix_rows, fix_src, which, iters))
            t0 = time.time()
            v = float(bench_fn(x, idx, flags, perm, fix_rows, fix_src, which, iters))
            dt = (time.time() - t0) / iters
            print(f"{which:10s}: {dt*1e3:7.3f} ms  [v={v:.3f}]")
        except Exception as e:
            print(f"{which:10s}: FAILED — {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
