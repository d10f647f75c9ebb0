"""Build a merged-class version of SynWoodScape (25 -> 8 classes)
(reference heal_swin/data/segmentation/synwoodscape_merge_classes.py).

Creates ``synwoodscape_large`` next to ``synwoodscape``: remapped label PNGs, symlinked
images/calibrations, and an updated seg_annotation_info.json."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
from PIL import Image

from heal_swin_tpu.data.segmentation.flat_datasets import WoodscapeSemanticMasksDataset
from heal_swin_tpu.data.segmentation.hp_datamodule import get_seg_info
from heal_swin_tpu.utils.utils import get_datasets_path

CLASS_MAPPING = [0, 1, 0, 0, 0, 0, 2, 3, 4, 0, 5, 0, 0, 6, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 7]
NEW_CLASS_NAMES = [
    "void", "building", "road line", "road", "sidewalk",
    "four-wheeler vehicle", "sky", "ego-vehicle",
]
DATASET_NAME = "synwoodscape_large"


def main(source_version="synwoodscape", dataset_name=DATASET_NAME,
         class_mapping=CLASS_MAPPING, new_class_names=NEW_CLASS_NAMES):
    ds = WoodscapeSemanticMasksDataset(
        part="train", train_share=1.0, woodscape_version=source_version
    )
    old_root = get_datasets_path() / source_version
    new_root = get_datasets_path() / dataset_name

    label_dir = new_root / "semantic_annotations" / "semantic_annotations" / "gtLabels"
    label_dir.mkdir(parents=True)
    for sub in ["calibration", "rgb_images", "calibration(test_set)", "rgb_images(test_set)"]:
        if (old_root / sub / sub).exists():
            (new_root / sub).mkdir(parents=True, exist_ok=True)
            os.symlink(old_root / sub / sub, new_root / sub / sub)
    if (old_root / "depth_maps").exists():
        os.symlink(old_root / "depth_maps", new_root / "depth_maps")

    mapping = np.asarray(class_mapping, dtype=np.uint8)
    for idx in range(len(ds)):
        mask = ds[idx]
        new_mask = mapping[np.asarray(mask, dtype=np.int64)]
        Image.fromarray(new_mask.astype(np.uint8)).save(label_dir / str(ds.file_names[idx]))

    seg_info = get_seg_info(source_version)
    seg_info["class_names"] = list(new_class_names)
    seg_info["class_colors"] = seg_info["class_colors"][: len(new_class_names)]
    seg_info["class_indexes"] = list(range(len(new_class_names)))
    with open(new_root / "semantic_annotations" / "seg_annotation_info.json", "w") as f:
        json.dump(seg_info, f, indent=2)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--source_version", default="synwoodscape")
    parser.add_argument("--dataset_name", default=DATASET_NAME)
    args = parser.parse_args()
    main(args.source_version, args.dataset_name)
    print("Done.")
