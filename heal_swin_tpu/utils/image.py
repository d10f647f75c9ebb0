"""Image ops replacing torchvision transforms (numpy, torch-semantics).

- resize_bilinear: F.interpolate(..., mode="bilinear", align_corners=False) semantics
  (what torchvision Resize does on tensors, used for images in the reference)
- resize_nearest: legacy torch "nearest" (src = floor(dst * scale)), used for masks
  (reference flat_datasets.py:103, interpolation=0)
- center_crop / pad: torchvision CenterCrop / Pad([l, t, r, b]) semantics
- read_image: PNG -> (C, H, W) uint8 like torchvision.io.read_image
"""

from __future__ import annotations

import struct

import numpy as np
from PIL import Image

try:  # OpenCV decodes PNG 2-3x faster than PIL AND releases the GIL, so the
    # loader's decode thread pool (data/loading.py num_workers) actually scales;
    # PIL's decoder holds the GIL (measured flat at any pool size).
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover - cv2 is in the image, PIL path is tested
    _HAS_CV2 = False


def _png_color_type(path) -> int:
    """PNG IHDR color type (byte 25): 3 = palette (cv2 expands palettes to BGR,
    PIL keeps the index semantics the mask datasets rely on). -1: not a PNG."""
    with open(path, "rb") as f:
        head = f.read(26)
    if len(head) < 26 or head[:8] != b"\x89PNG\r\n\x1a\n":
        return -1
    return struct.unpack("B", head[25:26])[0]


def read_image(path) -> np.ndarray:
    """PNG -> (C, H, W) uint8 RGB, torchvision.io.read_image semantics."""
    if _HAS_CV2:
        bgr = cv2.imread(str(path), cv2.IMREAD_COLOR)  # palette/alpha -> 8-bit BGR
        if bgr is not None:
            return np.ascontiguousarray(bgr[:, :, ::-1].transpose(2, 0, 1))
    img = np.asarray(Image.open(path).convert("RGB"))
    return img.transpose(2, 0, 1).copy()  # (C, H, W)


def read_mask(path) -> np.ndarray:
    """Label PNG -> (H, W) (or (H, W, C)) uint8, PIL raw-array semantics:
    paletted PNGs decode to palette INDICES (the class ids), so those take the
    PIL path; plain grayscale/color masks take the GIL-free cv2 path."""
    if _HAS_CV2 and _png_color_type(path) not in (3, -1):
        raw = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if raw is not None:
            if raw.ndim == 3 and raw.shape[2] >= 3:  # BGR(A) -> RGB(A)
                raw = raw[:, :, [2, 1, 0] + ([3] if raw.shape[2] == 4 else [])]
            return np.ascontiguousarray(raw)
    return np.asarray(Image.open(path)).copy()  # (H, W)


def resize_bilinear(img: np.ndarray, size) -> np.ndarray:
    """img: (..., H, W) float/uint8 -> (..., h, w); align_corners=False, no antialias."""
    h_out, w_out = size
    *lead, H, W = img.shape
    x = img.reshape(-1, H, W).astype(np.float64)

    def coords(n_out, n_in):
        scale = n_in / n_out
        c = (np.arange(n_out) + 0.5) * scale - 0.5
        c0 = np.floor(c).astype(int)
        frac = c - c0
        c0c = np.clip(c0, 0, n_in - 1)
        c1c = np.clip(c0 + 1, 0, n_in - 1)
        return c0c, c1c, frac

    r0, r1, fr = coords(h_out, H)
    c0, c1, fc = coords(w_out, W)
    top = x[:, r0][:, :, c0] * (1 - fc) + x[:, r0][:, :, c1] * fc
    bot = x[:, r1][:, :, c0] * (1 - fc) + x[:, r1][:, :, c1] * fc
    out = top * (1 - fr)[None, :, None] + bot * fr[None, :, None]
    out = out.reshape(*lead, h_out, w_out)
    if np.issubdtype(img.dtype, np.integer):
        out = np.clip(np.round(out), 0, 255)
    return out.astype(img.dtype)


def resize_nearest(img: np.ndarray, size) -> np.ndarray:
    """Legacy torch 'nearest': src index = floor(dst * in/out)."""
    h_out, w_out = size
    *lead, H, W = img.shape
    rows = np.minimum((np.arange(h_out) * (H / h_out)).astype(int), H - 1)
    cols = np.minimum((np.arange(w_out) * (W / w_out)).astype(int), W - 1)
    return img[..., rows[:, None], cols[None, :]]


def center_crop(img: np.ndarray, size) -> np.ndarray:
    h, w = size
    H, W = img.shape[-2:]
    top = (H - h) // 2
    left = (W - w) // 2
    return img[..., top : top + h, left : left + w]


def pad(img: np.ndarray, padding) -> np.ndarray:
    """torchvision Pad([l, t, r, b]) (or int) with zeros."""
    if isinstance(padding, int):
        padding = [padding] * 4
    left, top, right, bottom = padding
    if not any(padding):
        return img
    spec = [(0, 0)] * (img.ndim - 2) + [(top, bottom), (left, right)]
    return np.pad(img, spec)
