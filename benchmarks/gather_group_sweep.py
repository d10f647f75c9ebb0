#!/usr/bin/env python3
"""Chunked shift-gather GROUP-SIZE sweep at stage-0 model shapes (r5).

The r4 fix chunks the flat (B*N, C) shift gather into whole-sample groups under
the ~76 MiB source-table cliff (ops/permute.py).  The r4 batch-8 profile still
showed 5.9 ms/img of shift-gather time vs batch-2's 3.8 with the same per-table
bytes — this probe prices every group size at batch 4/8 (and the over-cliff
single gather) on the REAL ``permute_tokens`` path, so the default grouping is
measured, not assumed (VERDICT r4 item 5: 24/48/72 MiB group tables).

Timing: per-op device time from the profiler (benchmarks/prof_util.device_ms);
wall-clock through the axon tunnel is useless at this scale.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.prof_util import device_ms
from heal_swin_tpu.ops import permute as pm

N = 131072  # stage-0 tokens at nside 256
C = 96


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  (N={N}, C={C}, bf16; "
          f"sample table {N * C * 2 / 2**20:.0f} MiB)", flush=True)
    saved = pm._group_size
    try:
        for B in (2, 4, 8):
            x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
            perm = jnp.asarray(rng.permutation(N).astype(np.int32))
            inv = jnp.asarray(np.argsort(np.asarray(perm)).astype(np.int32))
            for m in [m for m in (1, 2, 3, 4, 6, 8) if m <= B]:
                pm._group_size = lambda b, sb, _m=m: _m
                ms = device_ms(
                    lambda a, p, i: pm.permute_tokens(a, p, i), (x, perm, inv),
                    iters=20, tmpdir=f"/tmp/ggs_{B}_{m}",
                )
                gbs = 2 * B * N * C * 2 / ms * 1e3 / 1e9
                print(f"B={B} group={m} ({m * N * C * 2 / 2**20:3.0f} MiB tables, "
                      f"{-(-B // m)} chunks): {ms:7.3f} ms "
                      f"{ms / B:6.3f} ms/img  {gbs:6.1f} GB/s", flush=True)
    finally:
        pm._group_size = saved


if __name__ == "__main__":
    main()
