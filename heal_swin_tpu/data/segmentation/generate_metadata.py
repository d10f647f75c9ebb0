"""Dataset metadata tooling (reference heal_swin/data/segmentation/generate_metadata.py):
per-camera calibration-cluster pickles (used by the HP-masked IoU writers), class color
legend, and dataset overview."""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from heal_swin_tpu.data.segmentation import flat_datasets
from heal_swin_tpu.data.segmentation.hp_datamodule import get_seg_info
from heal_swin_tpu.utils.utils import get_datasets_path

_CAL_FIELDS = [
    "aspect_ratio", "cx_offset", "cy_offset", "height",
    "k1", "k2", "k3", "k4", "poly_order", "width",
]


def get_cal_distributions(pos, path, woodscape_version):
    """Cluster samples by identical intrinsic calibration; pickle
    [{cal_info, file_names}] (reference :156-210)."""
    cal_dataset = flat_datasets.WoodscapeCalibrationDataset(
        cam_pos=pos, train_share=1.0, part="train", woodscape_version=woodscape_version
    )
    data = np.zeros((len(cal_dataset), len(_CAL_FIELDS)))
    for idx in range(len(cal_dataset)):
        intr = cal_dataset[idx]["intrinsic"]
        data[idx] = [intr[f] for f in _CAL_FIELDS]
    unique, u_idcs, u_inverse, u_counts = np.unique(
        data, axis=0, return_counts=True, return_index=True, return_inverse=True
    )
    print(f"Unique calibration data of {pos} dataset: {len(unique)} different calibrations")

    samples_by_cal_data = []
    for i in range(len(unique)):
        cal_info = cal_dataset[int(u_idcs[i])]
        cal_info.pop("file_name", None)
        names = np.asarray(cal_dataset.paths)[np.where(u_inverse == i)]
        names = np.array([os.path.splitext(os.path.basename(n))[0] for n in names])
        assert len(names) == u_counts[i]
        samples_by_cal_data.append({"cal_info": cal_info, "file_names": names})

    with open(path, "wb") as f:
        pickle.dump(samples_by_cal_data, f)


def gen_cal_distribution_data(woodscape_version):
    for pos in ["fv", "rv", "mvr", "mvl"]:
        path = os.path.join(
            get_datasets_path() / woodscape_version, f"{pos}_samples_by_cal_data.pickle"
        )
        if not os.path.isfile(path):
            get_cal_distributions(pos, path, woodscape_version)


def gen_class_legend(woodscape_version):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    seg_info = get_seg_info(woodscape_version)
    class_names = [f"{i}: {n}" for i, n in enumerate(seg_info["class_names"])]
    class_colors = seg_info["class_colors"]
    fig, ax = plt.subplots(1, 1)
    size = 1
    for idx, name in enumerate(class_names):
        y = idx * 1.25 * size
        color = np.asarray(class_colors[idx]) / 255
        ax.add_patch(Rectangle((0, y), size, size, edgecolor="black", facecolor=color))
        ax.text(1.25 * size, y + 0.5 * size, name, va="center")
    ax.set_ylim(-0.25 * size, len(class_names) * 1.25 * size)
    ax.set_xlim(-0.25 * size, size + 5)
    ax.set_aspect(1)
    ax.set_axis_off()
    path = os.path.join(
        get_datasets_path() / woodscape_version, "semantic_annotations", "class_color_legend.pdf"
    )
    fig.savefig(path, bbox_inches="tight", pad_inches=0)
    plt.close(fig)


def print_overview(woodscape_version):
    """Dataset overview: per-camera image counts and shapes (reference :223-240)."""
    from heal_swin_tpu.data.segmentation.flat_datasets import (
        WoodscapeImagesDataset,
        WoodscapeSemanticMasksDataset,
    )

    imgs = WoodscapeImagesDataset(part="train", train_share=1.0,
                                  woodscape_version=woodscape_version)
    total = 0
    for cam, paths in imgs.get_paths().items():
        print(f"{len(paths)} images in {cam} data")
        total += len(paths)
    print(f"In total: {total} images")
    sample = imgs[0]
    print(f"The images have shape {sample.shape} and dtype {sample.dtype}")
    masks = WoodscapeSemanticMasksDataset(part="train", train_share=1.0,
                                          woodscape_version=woodscape_version)
    m = masks[0]
    print(f"The labels have shape {m.shape} and dtype {m.dtype}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--woodscape_version", type=str, required=True)
    parser.add_argument(
        "--task",
        choices=["gen_cal_distribution_data", "gen_class_legend", "print_overview"],
        required=True,
    )
    args = parser.parse_args()
    if args.task == "gen_cal_distribution_data":
        gen_cal_distribution_data(args.woodscape_version)
    elif args.task == "gen_class_legend":
        gen_class_legend(args.woodscape_version)
    else:
        print_overview(args.woodscape_version)
    print("Done.")


if __name__ == "__main__":
    main()
