"""Class-prevalence statistics for CE weights (reference
heal_swin/data/segmentation/data_stats.py): prints the train-set class distribution and
saves a histogram."""

from __future__ import annotations

import argparse
import os

import numpy as np

from heal_swin_tpu.data.segmentation.flat_datasets import WoodscapeSemanticMasksDataset
from heal_swin_tpu.data.segmentation.hp_datamodule import get_seg_info
from heal_swin_tpu.utils.utils import get_datasets_path


def get_class_distribution(woodscape_version):
    ds = WoodscapeSemanticMasksDataset(part="train", train_share=1.0,
                                       woodscape_version=woodscape_version)
    class_names = get_seg_info(woodscape_version)["class_names"]
    n = len(class_names)
    counts = np.zeros(n, dtype=np.int64)
    total = 0
    for i in range(len(ds)):
        mask = np.asarray(ds[i])
        counts += np.bincount(mask.reshape(-1), minlength=n)[:n]
        total += mask.size
    dist = 100.0 * counts / max(total, 1)
    print(f"in total, there are {total} pixels in the train dataset")
    print("distribution of classes:")
    for i in range(n):
        print(f"{i}\t{class_names[i]: <25}\t{dist[i]:.3f}%")
    return dist


def plot_hist(class_freqs, file_name, woodscape_version):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    class_names = get_seg_info(woodscape_version)["class_names"]
    order = np.flip(np.argsort(class_freqs))
    fig, ax = plt.subplots(figsize=(15, 5))
    bars = ax.bar(range(len(class_freqs)), np.asarray(class_freqs)[order], 0.8)
    for rect, v in zip(bars, np.asarray(class_freqs)[order]):
        ax.annotate(f"{v:.3f}%", xy=(rect.get_x() + rect.get_width() / 2, v),
                    xytext=(0, 3), textcoords="offset points", ha="center", fontsize=5)
    ax.set_xticks(range(len(class_freqs)))
    ax.set_xticklabels(np.asarray(class_names)[order], rotation="vertical", fontsize=8)
    ax.set_ylabel("percent of total pixels in subset")
    path = os.path.join(
        get_datasets_path() / woodscape_version, "semantic_annotations", file_name
    )
    print(f"saving histogram at {path}")
    fig.savefig(path, bbox_inches="tight")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--woodscape_version", type=str, required=True)
    args = parser.parse_args()
    dist = get_class_distribution(args.woodscape_version)
    plot_hist(dist, "class_hist.pdf", args.woodscape_version)


if __name__ == "__main__":
    main()
    print("Done.")
