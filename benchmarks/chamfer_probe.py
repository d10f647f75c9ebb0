#!/usr/bin/env python3
"""Chamfer distance at paper eval scale on TPU (VERDICT r2 item 4).

The headline depth metric (chamfer_distance_full_res_hp_masked, reference
evaluation/custom_metrics.py:471-577) compares ~1.2M-point foreground clouds
per validation sample.  This probe times both implementations at that scale:

  * jnp tiled-matmul path (ops/chamfer.py chamfer_distance_masked) — expected
    to OOM at full scale: each scan step materializes an (N, tile) f32 dot
    output (34 GB at N = 2^21 before the fix's memory analysis).
  * Pallas VPU kernel (chamfer_distance_masked_pallas) — O(N+M) memory,
    exact f32.

Usage: python benchmarks/chamfer_probe.py [n_points [reps]]
Timing: fetch the scalar result (block_until_ready does not sync on axon).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from heal_swin_tpu.ops import chamfer as ch


def bench(impl, p, q, pv, qv, reps):
    v = float(impl(p, q, pv, qv))  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        v = float(impl(p, q, pv, qv))
    dt = (time.time() - t0) / reps
    return v, dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_240_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    print(f"backend={jax.default_backend()} n={n}", file=sys.stderr)
    rng = np.random.default_rng(0)
    b = ch._bucket(n)
    mk = lambda s: np.ascontiguousarray(  # noqa: E731
        np.pad(rng.normal(size=(n, 3)).astype(np.float32) * 20 + s, ((0, b - n), (0, 0)))
    )
    p, q = mk(0.0), mk(0.5)
    pv = np.arange(b) < n
    qv = pv.copy()

    v_pl, t_pl = bench(
        lambda *a: ch.chamfer_distance_masked_pallas(*a), p, q, pv, qv, reps
    )
    print(f"pallas: {t_pl*1e3:.1f} ms/pair  value={v_pl:.6f}  (bucket {b})")

    try:
        v_j, t_j = bench(
            lambda *a: ch.chamfer_distance_masked(*a), p, q, pv, qv, max(1, reps // 3)
        )
        print(f"jnp:    {t_j*1e3:.1f} ms/pair  value={v_j:.6f}  "
              f"(|diff| {abs(v_j - v_pl):.2e})")
    except Exception as e:  # noqa: BLE001 — expected OOM at full scale
        print(f"jnp:    FAILED at this scale: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
