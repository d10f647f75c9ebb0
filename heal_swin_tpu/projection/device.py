"""On-device fisheye -> HEALPix projection (batched XLA gathers).

The reference pre-materializes every projected sample as an .npz on disk
(project_on_s2.py:361-372) because its projection runs on CPU per calibration.  Here
the geometry is frozen into per-calibration-cluster tables (projection/tables.py) and
the actual projection is a batched gather that runs INSIDE the jitted input step on
TPU: the host only decodes flat images; bilinear sampling onto the sphere rides HBM at
memory speed (SURVEY.md §7.3.6 "input pipeline throughput" north star).

WoodScape has a handful of distinct intrinsic calibrations per camera
(generate_metadata.py's cal clusters), so all tables for a camera stack into one
(K, 4, npix) tensor and a per-sample ``cal_id`` selects the row — no retrace per
calibration, no host round-trip per batch.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from heal_swin_tpu.projection import tables as T


@functools.partial(jax.jit, donate_argnums=())
def _project_images(idx, w, imgs_flat, cal_ids):
    """idx/w: (K, 4, npix); imgs_flat: (B, H*W, C) float; cal_ids: (B,) int32.
    Returns (B, npix, C) bilinear HP samples (OOB weights are 0)."""
    ib = jnp.take(idx, cal_ids, axis=0)  # (B, 4, npix)
    wb = jnp.take(w, cal_ids, axis=0)
    B, _, npix = ib.shape
    g = jnp.take_along_axis(imgs_flat, ib.reshape(B, 4 * npix)[..., None], axis=1)
    g = g.reshape(B, 4, npix, imgs_flat.shape[-1])
    return jnp.einsum("bkp,bkpc->bpc", wb, g)


def _remap_wide(t: "T.ForwardTable"):
    """Remap the 4 clipped bilinear neighbors to (base index, 4 slot weights) in an
    edge-replicated (H+1, W+1) padded geometry.

    ``tables.py`` clips each neighbor independently (``_clip_flat_idx``), but the
    clipped positions always stay inside the 2x2 patch anchored at the clipped
    floor corner: rows {r00, r00+1} x cols {c00, c00+1}, where the +1 entries are
    edge-replicated when the corner sits on the last row/column (clip-to-edge and
    replicate-pad read the same pixel).  So one gather of the 4C-wide patch row
    replaces four C-wide gathers — the TPU gather emitter charges per ROW, so this
    is ~4x fewer gather descriptors for the same useful bytes.  Degenerate
    neighbors (ceil==floor) land on the same slot and their weights fold (adds,
    order-insensitive up to f32 rounding)."""
    W1 = t.W + 1

    def padded(idx):
        return (idx // t.W) * W1 + (idx % t.W)

    a = padded(t.idx00).astype(np.int32)
    w4 = np.zeros((4, t.npix_used), np.float32)
    slot_of = {0: 0, 1: 1, W1: 2, W1 + 1: 3}
    cols = np.arange(t.npix_used)
    for idx, w in ((t.idx00, t.w00), (t.idx10, t.w10), (t.idx01, t.w01),
                   (t.idx11, t.w11)):
        off = padded(idx) - a
        slots = np.full(off.shape, -1, np.int64)
        for o, s in slot_of.items():
            slots[off == o] = s
        assert (slots >= 0).all(), "bilinear neighbor outside the 2x2 padded patch"
        np.add.at(w4, (slots, cols), w)
    return a, w4


@functools.partial(jax.jit, donate_argnums=())
def _project_images_wide(a, w4, imgs, cal_ids):
    """a: (K, npix) int32 padded-geometry base indices; w4: (K, 4, npix) f32 slot
    weights (see _remap_wide); imgs: (B, H, W, C) float; cal_ids: (B,) int32.
    Returns (B, npix, C).  One 4C-wide row gather instead of four C-wide ones."""
    B, H, W, C = imgs.shape
    W1 = W + 1
    M = (H + 1) * W1
    pad = jnp.pad(imgs, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    flat = pad.reshape(B, M, C)
    # row f of q = the 2x2 patch whose corners sit at padded flat offsets
    # {f, f+1, f+W1, f+W1+1}; built with four shifted views fused into one copy
    q = jnp.concatenate(
        [flat[:, : M - W1 - 1], flat[:, 1 : M - W1],
         flat[:, W1 : M - 1], flat[:, W1 + 1 :]],
        axis=-1,
    )  # (B, M - W1 - 1, 4C)
    ab = jnp.take(a, cal_ids, axis=0)  # (B, npix)
    wb = jnp.take(w4, cal_ids, axis=0)  # (B, 4, npix)
    g = jnp.take_along_axis(q, ab[..., None], axis=1)  # (B, npix, 4C)
    g = g.reshape(B, ab.shape[1], 4, C)
    return jnp.einsum("bkp,bpkc->bpc", wb, g)


@functools.partial(jax.jit, static_argnums=(4,))
def _project_masks(nearest, valid, masks_flat, cal_ids, bkgd):
    """nearest: (K, npix) int32; valid: (K, npix) bool; masks_flat: (B, H*W) int.
    Returns (B, npix) nearest-sample class ids, background where off-image."""
    nb = jnp.take(nearest, cal_ids, axis=0)  # (B, npix)
    vb = jnp.take(valid, cal_ids, axis=0)
    out = jnp.take_along_axis(masks_flat, nb, axis=1)
    return jnp.where(vb, out, bkgd)


class DeviceProjector:
    """Stacked forward tables for a set of calibration clusters; batched jitted apply.

    ``project_images`` consumes channels-last (B, H, W, C) float images (any float
    dtype) and returns (B, npix_used, C); ``project_masks`` consumes (B, H, W) int
    masks.  Bit-compatible with ForwardTable.apply_image/apply_mask (tested)."""

    def __init__(self, cal_infos: List[dict], nside: int, base_pix: int = 8,
                 rotate_pole: bool = False):
        tabs = [T.forward_table(c, nside, base_pix, rotate_pole) for c in cal_infos]
        t0 = tabs[0]
        assert all((t.H, t.W, t.npix_used) == (t0.H, t0.W, t0.npix_used) for t in tabs), (
            "all calibrations in one projector must share image size and grid"
        )
        self.H, self.W, self.npix_used = t0.H, t0.W, t0.npix_used
        self.n_cals = len(tabs)
        # keep tables as NUMPY: a DeviceProjector may be constructed lazily inside a
        # jit trace (trainer input transform) and jnp constants created there would be
        # tracers — caching them on self leaks the trace.  numpy operands are lifted
        # to on-device constants at each jit call site instead.
        self.idx = np.stack(
            [np.stack([t.idx00, t.idx10, t.idx01, t.idx11]) for t in tabs]
        )  # (K, 4, npix) int32
        self.w = np.stack(
            [np.stack([t.w00, t.w10, t.w01, t.w11]) for t in tabs]
        )  # (K, 4, npix) f32
        wide = [_remap_wide(t) for t in tabs]
        self.wide_a = np.stack([a for a, _ in wide])  # (K, npix) int32
        self.wide_w4 = np.stack([w4 for _, w4 in wide])  # (K, 4, npix) f32
        self.nearest = np.stack([t.nearest_idx for t in tabs])
        self.valid = np.stack([t.nearest_valid for t in tabs])

    def project_images(self, imgs, cal_ids: Optional[jnp.ndarray] = None):
        B, H, W, C = imgs.shape
        assert (H, W) == (self.H, self.W), ((H, W), (self.H, self.W))
        if cal_ids is None:
            cal_ids = jnp.zeros((B,), jnp.int32)
        cal_ids = jnp.asarray(cal_ids, jnp.int32)
        # wide (default): one 4C-wide patch-row gather — ~4x fewer gather rows on
        # TPU (the gather emitter is row-count-bound).  narrow: the original four
        # C-wide gathers, kept for A/B (HEAL_SWIN_PROJECT_GATHER=narrow).
        if os.environ.get("HEAL_SWIN_PROJECT_GATHER", "wide") != "narrow":
            return _project_images_wide(self.wide_a, self.wide_w4,
                                        jnp.asarray(imgs), cal_ids)
        flat = jnp.asarray(imgs).reshape(B, H * W, C)
        return _project_images(self.idx, self.w, flat, cal_ids)

    def project_masks(self, masks, cal_ids: Optional[jnp.ndarray] = None,
                      s2_bkgd_class: int = 0):
        B, H, W = masks.shape
        assert (H, W) == (self.H, self.W)
        if cal_ids is None:
            cal_ids = jnp.zeros((B,), jnp.int32)
        flat = jnp.asarray(masks).reshape(B, H * W)
        return _project_masks(
            self.nearest, self.valid, flat, jnp.asarray(cal_ids, jnp.int32),
            int(s2_bkgd_class),
        )
