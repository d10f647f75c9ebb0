#!/usr/bin/env python3
"""Neighbor-pruned Chamfer vs brute force at paper eval scale on TPU (r4).

Times ops/chamfer_pruned.py against the brute Pallas kernel at the headline
metric's ~1.24M-point clouds, on both a random volumetric cloud and a
surface-like cloud shaped like real unprojected depth maps (ground plane +
smoothly-varying building depths — the clustered regime the pruning exploits).
Verifies bit-equality of the scalar against the brute kernel on the same
padded clouds.

Usage: python benchmarks/chamfer_pruned_probe.py [n_points [reps]]
Timing: fetch values to sync (block_until_ready does not sync on axon).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from heal_swin_tpu.ops import chamfer as ch
from heal_swin_tpu.ops.chamfer_pruned import chamfer_distance_pruned


def make_depth_cloud(n, seed, shift=0.0):
    """Surface-like: fisheye-ish ray grid hitting a ground plane + buildings."""
    rng = np.random.default_rng(seed)
    side = int(np.sqrt(n))
    u, v = np.meshgrid(np.linspace(-0.8, 0.8, side), np.linspace(-0.6, 0.6, side))
    dirs = np.stack([u, v, np.ones_like(u)], -1).reshape(-1, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    depth = np.where(dirs[:, 1] > 0.05, 1.5 / np.maximum(dirs[:, 1], 0.05),
                     rng.uniform(5, 80, len(dirs)))
    d2 = depth.reshape(side, side)
    for _ in range(3):
        d2 = 0.25 * (np.roll(d2, 1, 0) + np.roll(d2, -1, 0)
                     + np.roll(d2, 1, 1) + np.roll(d2, -1, 1))
    depth = np.where(dirs[:, 1] > 0.05, depth, d2.reshape(-1))
    return (dirs * depth[:, None] + shift).astype(np.float32)[: (side * side)]


def brute(p, q):
    b_p, b_q = ch._bucket(len(p)), ch._bucket(len(q))
    pp = np.zeros((b_p, 3), np.float32)
    pp[: len(p)] = p
    qp = np.zeros((b_q, 3), np.float32)
    qp[: len(q)] = q
    pv, qv = np.arange(b_p) < len(p), np.arange(b_q) < len(q)
    return float(ch.chamfer_distance_masked_pallas(pp, qp, pv, qv))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_240_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    print(f"backend={jax.default_backend()} n={n}", flush=True)
    rng = np.random.default_rng(0)

    clouds = {
        "random": (rng.normal(size=(n, 3)).astype(np.float32) * 20,
                   rng.normal(size=(n, 3)).astype(np.float32) * 20 + 0.5),
        "depth-like": (make_depth_cloud(n, 1),
                       make_depth_cloud(n, 2, shift=0.02)),
    }
    for name, (p, q) in clouds.items():
        stats = {}
        v0 = chamfer_distance_pruned(p, q, stats=stats)  # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            st = {}
            v = chamfer_distance_pruned(p, q, stats=st)
            times.append(time.perf_counter() - t0)
        assert v == v0
        t0 = time.perf_counter()
        vb = brute(p, q)
        tb = time.perf_counter() - t0
        bit_eq = np.float32(v).tobytes() == np.float32(vb).tobytes()
        print(f"{name}: pruned {min(times):.2f}s (warm best of {reps}; "
              f"prep {st['t_prep']:.2f} rounds {st['t_rounds']:.2f} "
              f"final {st['t_final']:.2f}) vs brute {tb:.2f}s -> "
              f"{tb / min(times):.1f}x; work_frac {st['work_frac']:.3%} "
              f"rounds {st['round_pairs']} final {st['final_pairs']}; "
              f"value {v!r} bit_eq_brute={bit_eq}", flush=True)


if __name__ == "__main__":
    main()
