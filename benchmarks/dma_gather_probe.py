#!/usr/bin/env python3
"""Price the in-kernel shift gather (VERDICT r2 item 6's remaining angle).

The proposal: fold the ring-shift permutation INTO the fused attention kernel by
loading each window block's rows from HBM with scalar-prefetched per-run DMAs
(97% of 16-token runs are contiguous+aligned), removing the standalone XLA
gather and its materialized (T, C) intermediate.

The arithmetic that decides it: the stage-0 fused forward runs its 512-step grid
in 1.44 ms — **2.8 us per (16-window, 1024-token) block**.  An in-kernel gather
needs ~64 separate (16, C) DMAs per block (one per 16-token run).  This probe
measures exactly that primitive cost: a Pallas kernel whose grid step copies the
same 1024x96 bf16 slab from HBM to VMEM either as ONE contiguous DMA or as 64
scalar-indexed (16, 96) DMAs, vs the XLA row-gather baseline it would replace.

If 64 small DMAs per block cost >> the 2.8 us block budget (they issue serially
from the scalar core at ~0.5-1 us each), the fusion is priced out regardless of
the saved HBM round trip — the committed rejection measurement.

Usage: python benchmarks/dma_gather_probe.py
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

# stage-0 tokens (B=2 x 131072) x embed width.  C is the LANE-PADDED width:
# Mosaic rejects tpu.memref_slice on a 96-wide HBM memref (the bf16 tile is
# 128 lanes), so the probe prices the DMAs at C=128 — the real kernel would
# pay the same per-DMA overhead on its padded tiles, so the verdict transfers.
C = int(os.environ.get("DMA_C", 128))
T = 262144
BLK = 1024  # tokens per attention grid step (wblk=16 windows x ws=64)
RUN = 16  # contiguous-run granularity of the ring shift
RUNS_PER_BLK = BLK // RUN
GRID = T // BLK


def _copy_kernel_contig(idx_ref, x_hbm, o_ref, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(i * BLK, BLK), :], o_ref, sem)
    cp.start()
    cp.wait()


def _copy_kernel_runs(idx_ref, x_hbm, o_ref, sem):
    i = pl.program_id(0)
    for r in range(RUNS_PER_BLK):
        # run starts are RUN-aligned by construction; multiple_of lets Mosaic
        # prove tile-divisibility of the dynamic slice start
        src = pl.multiple_of(idx_ref[i * RUNS_PER_BLK + r], RUN)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(src, RUN), :], o_ref.at[pl.ds(r * RUN, RUN), :], sem
        )
        cp.start()
        cp.wait()


def _copy_kernel_runs_async(idx_ref, x_hbm, o_ref, sem):
    """Issue all runs' DMAs back-to-back, then drain — the pipelined best case."""
    i = pl.program_id(0)
    cps = []
    for r in range(RUNS_PER_BLK):
        src = pl.multiple_of(idx_ref[i * RUNS_PER_BLK + r], RUN)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(src, RUN), :], o_ref.at[pl.ds(r * RUN, RUN), :], sem
        )
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()


def make(kernel):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(GRID,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BLK, C), lambda i, idx: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, C), jnp.bfloat16),
    )


@functools.partial(jax.jit, static_argnames=("which", "iters"))
def bench_fn(x, idx, perm, which: str, iters: int):
    def body(c, _):
        xi = x + c.astype(x.dtype)
        if which == "gather":
            y = jnp.take(xi.reshape(T, C), perm, axis=0)
        else:
            kern = {"contig": _copy_kernel_contig, "runs": _copy_kernel_runs,
                    "runs_async": _copy_kernel_runs_async}[which]
            y = make(kern)(idx, xi)
        return jnp.float32(y[0, 0]), ()

    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
    return c


def main():
    iters = int(os.environ.get("DMA_ITERS", 50))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, C)), jnp.bfloat16)
    # run-aligned random sources (the shift's 97% case, made 100% for the probe)
    starts = rng.permutation(T // RUN).astype(np.int32) * RUN
    idx = jnp.asarray(starts)
    perm = jnp.asarray(
        (starts[:, None] + np.arange(RUN)[None, :]).reshape(-1).astype(np.int32)
    )

    for which in ("gather", "contig", "runs", "runs_async"):
        v = float(bench_fn(x, idx, perm, which, iters))  # compile + warm
        t0 = time.time()
        v = float(bench_fn(x, idx, perm, which, iters))
        dt = (time.time() - t0) / iters
        print(f"{which:8s}: {dt*1e3:7.3f} ms/copy of (T={T}, C={C}) bf16 "
              f"({dt*1e6/GRID:6.2f} us per {BLK}-token block)  [v={v:.3f}]")


if __name__ == "__main__":
    main()
