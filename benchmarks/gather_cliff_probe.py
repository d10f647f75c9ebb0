#!/usr/bin/env python3
"""Locate + fix the batch-scaling cliff in the flat shift-permutation gather (r4).

Batch sweep profiles (docs/PERFORMANCE.md "batch scaling") show the stage-0
shift gathers (ops/permute.py flat (B*N, C) row gather) collapse from ~212 GB/s
at B*N=262144 rows to ~36 GB/s at 524288 rows (6x per-op for 2x rows) — ~70% of
the 22% per-image throughput loss at batch 8.  This probe times the raw gather
across row counts to find the cliff, then A/Bs candidate fixes at batch 4/8:

  * flat      — the current single (B*N, C) gather
  * chunk2    — python-unrolled gathers of 2-sample (2N, C) chunks (the
                measured-fast shape), outputs concatenated
  * vmapped   — vmap the 2-sample flat gather over chunks (batched gather)

Timing: lax.scan chain via benchmarks/prof_util.device_ms (per-op device time
from the profiler; wall-clock through the tunnel is useless at this scale).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.prof_util import device_ms

N = 131072  # stage-0 tokens at nside 256
C = 96


def flat_gather(x, rows):
    out = jnp.take(x.reshape(-1, C), rows, axis=0)
    return out.reshape(x.shape)


def make_chunked(n_chunk_rows):
    def chunked(x, rows2):
        # rows2 indexes within one chunk of n_chunk_rows rows
        flat = x.reshape(-1, C)
        k = flat.shape[0] // n_chunk_rows
        outs = [
            jnp.take(
                jax.lax.dynamic_slice_in_dim(flat, i * n_chunk_rows, n_chunk_rows, 0),
                rows2, axis=0,
            )
            for i in range(k)
        ]
        return jnp.concatenate(outs, axis=0).reshape(x.shape)

    return chunked


def vmapped(x, rows2):
    flat = x.reshape(-1, C)
    k = flat.shape[0] // rows2.shape[0]
    xc = flat.reshape(k, rows2.shape[0], C)
    out = jax.vmap(lambda xi: jnp.take(xi, rows2, axis=0))(xc)
    return out.reshape(x.shape)


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  (N={N}, C={C}, bf16)", flush=True)

    print("-- cliff sweep: one flat gather, rows = B*N --")
    for B in (1, 2, 3, 4, 6, 8):
        rows_n = B * N
        perm = np.concatenate(
            [rng.permutation(N) + i * N for i in range(B)]
        ).astype(np.int32)
        x = jnp.asarray(rng.normal(size=(rows_n, C)), jnp.bfloat16)
        ms = device_ms(lambda a, r: jnp.take(a, r, axis=0), (x, jnp.asarray(perm)),
                       iters=20, tmpdir=f"/tmp/gcliff_{B}")
        gbs = 2 * rows_n * C * 2 / ms * 1e3 / 1e9
        print(f"B={B}: rows={rows_n:8d}  {ms:7.3f} ms  {gbs:6.1f} GB/s", flush=True)

    perm2 = np.concatenate([rng.permutation(N) + i * N for i in range(2)]).astype(np.int32)
    for B in (4, 8):
        print(f"-- fix A/B at batch {B} --")
        x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
        permB = np.concatenate(
            [rng.permutation(N) + i * N for i in range(B)]
        ).astype(np.int32)
        for name, fn, rows in (
            ("flat", flat_gather, permB),
            ("chunk2", make_chunked(2 * N), perm2),
            ("vmap2", vmapped, perm2),
        ):
            ms = device_ms(fn, (x, jnp.asarray(rows)), iters=20,
                           tmpdir=f"/tmp/gfix_{B}_{name}")
            gbs = 2 * B * N * C * 2 / ms * 1e3 / 1e9
            print(f"  {name:7s} {ms:7.3f} ms  {gbs:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
