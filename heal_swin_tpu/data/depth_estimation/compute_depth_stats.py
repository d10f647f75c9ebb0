"""Compute depth dataset statistics (reference
heal_swin/data/depth_estimation/compute_depth_stats.py): max/min/mean/std per transform
(None/log/inv) x masked/unmasked, printed in the form of normalize_depth_data's
hardcoded DataStats classes."""

from __future__ import annotations

import argparse

import numpy as np

from heal_swin_tpu.data import normalize_depth_data as ndd
from heal_swin_tpu.data.depth_estimation.flat_depth_datasets import WoodscapeDepthMaskDataset


def compute_stats(woodscape_version="synwoodscape", data_transform=None,
                  mask_background=False):
    ds = WoodscapeDepthMaskDataset(
        part="train", train_share=1.0, woodscape_version=woodscape_version
    )
    total = 0.0
    total_sq = 0.0
    n = 0
    vmax, vmin = -np.inf, np.inf
    total_pixels = 0
    total_background = 0
    tf = ndd.mask_transform_fcn(data_transform)
    for i in range(len(ds)):
        d = np.asarray(ds[i], dtype=np.float64)
        total_pixels += d.size
        bg = d == 1000
        total_background += int(bg.sum())
        d = d.copy()
        d[d == 0] = np.inf
        if mask_background:
            d[bg] = np.inf
        d = np.asarray(tf(d))
        finite = np.isfinite(d)
        vals = d[finite]
        total += vals.sum()
        total_sq += (vals**2).sum()
        n += vals.size
        if vals.size:
            vmax = max(vmax, vals.max())
            vmin = min(vmin, vals.min())
    mean = total / max(n, 1)
    std = np.sqrt(max(total_sq / max(n, 1) - mean**2, 0.0))
    stats = ndd.DataStats(
        name=f"{'Masked ' if mask_background else ''}{data_transform or ''} depth data stats",
        max=vmax, min=vmin, mean=mean, std=std,
        total_pixels=total_pixels, total_background=total_background,
    )
    print(stats)
    return stats


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--woodscape_version", default="synwoodscape")
    args = parser.parse_args()
    for transform in [None, "log", "inv"]:
        for masked in [False, True]:
            print(f"--- transform={transform} mask_background={masked}")
            compute_stats(args.woodscape_version, transform, masked)


if __name__ == "__main__":
    main()
    print("Done.")
