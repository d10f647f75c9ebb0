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
        self.nearest = np.stack([t.nearest_idx for t in tabs])
        self.valid = np.stack([t.nearest_valid for t in tabs])

    def project_images(self, imgs, cal_ids: Optional[jnp.ndarray] = None):
        B, H, W, C = imgs.shape
        assert (H, W) == (self.H, self.W), ((H, W), (self.H, self.W))
        if cal_ids is None:
            cal_ids = jnp.zeros((B,), jnp.int32)
        flat = jnp.asarray(imgs).reshape(B, H * W, C)
        return _project_images(self.idx, self.w, flat, jnp.asarray(cal_ids, jnp.int32))

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
