"""Mask/image overlays and image grids (reference utils.get_overlay /
overlay_from_seg_info, utils.py:70-106, torchvision-free)."""

from __future__ import annotations

import numpy as np
from PIL import Image

from heal_swin_tpu.data.segmentation.hp_datamodule import get_seg_info


def gen_mask_img(mask, class_indexes, class_colors) -> np.ndarray:
    """(H, W)-or-(N,) int mask -> (3, ...) uint8 colored mask."""
    mask = np.asarray(mask)
    out = np.zeros((3,) + mask.shape, dtype=np.int64)
    for value, color in zip(class_indexes, class_colors):
        out += (mask == value) * np.reshape(np.asarray(color), (3,) + (1,) * mask.ndim)
    return out.astype(np.uint8)


def overlay_from_seg_info(mask, img, seg_info, mask_opacity=0.4) -> np.ndarray:
    """(reference utils.py:87-99): blend colored mask over img where colored != 0."""
    mask_img = gen_mask_img(mask, seg_info["class_indexes"], seg_info["class_colors"])
    img = np.asarray(img, dtype=np.float64)
    overlay = (mask_img != 0) * ((1.0 - mask_opacity) * img + mask_opacity * mask_img)
    overlay = overlay + (mask_img == 0) * img
    return np.clip(overlay, 0, 255).astype(np.uint8)


def get_overlay(woodscape_version, mask, img, mask_opacity=0.4) -> np.ndarray:
    return overlay_from_seg_info(mask, img, get_seg_info(woodscape_version), mask_opacity)


def save_image_grid(images, path, nrow=2):
    """Save a list of (3, H, W) uint8 images as a grid PNG (torchvision save_image
    analogue).  Images are resized to the first image's size if needed."""
    imgs = [np.asarray(im, dtype=np.uint8) for im in images]
    H, W = imgs[0].shape[-2:]
    pil = []
    for im in imgs:
        p = Image.fromarray(im.transpose(1, 2, 0))
        if p.size != (W, H):
            p = p.resize((W, H), Image.BILINEAR)
        pil.append(p)
    ncol = nrow
    nrows = -(-len(pil) // ncol)
    grid = Image.new("RGB", (ncol * W, nrows * H))
    for i, p in enumerate(pil):
        grid.paste(p, ((i % ncol) * W, (i // ncol) * H))
    grid.save(path)
