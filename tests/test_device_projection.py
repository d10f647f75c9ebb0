"""On-device batched projection vs the host forward tables (projection/device.py).

The DeviceProjector is the north-star input pipeline (SURVEY.md §7.3.6): host decodes
flat images, the fisheye->HEALPix bilinear gather runs inside jit.  Must be
bit-compatible with ForwardTable.apply_image / apply_mask per calibration."""

import numpy as np

from heal_swin_tpu.data.synthetic_woodscape import make_cal_info
from heal_swin_tpu.projection.device import DeviceProjector
from heal_swin_tpu.projection.tables import forward_table

W, H, NSIDE, BASE = 96, 80, 8, 8

CALS = [
    make_cal_info("FV", W=W, H=H, k_scale=W / 3.5),
    make_cal_info("RV", W=W, H=H, k_scale=W / 3.1),
]


import pytest


@pytest.mark.parametrize("gather", ["wide", "narrow"])
def test_device_projection_matches_tables(gather, monkeypatch):
    monkeypatch.setenv("HEAL_SWIN_PROJECT_GATHER", gather)
    rng = np.random.RandomState(0)
    imgs = rng.rand(4, H, W, 3).astype(np.float32) * 255.0
    cal_ids = np.array([0, 1, 1, 0], np.int32)

    proj = DeviceProjector(CALS, NSIDE, BASE)
    out = np.asarray(proj.project_images(imgs, cal_ids))  # (4, npix, 3)

    for b in range(4):
        tab = forward_table(CALS[cal_ids[b]], NSIDE, BASE, rotate_pole=False)
        ref = tab.apply_image(imgs[b].transpose(2, 0, 1))  # (3, npix)
        np.testing.assert_allclose(out[b], ref.T, rtol=1e-5, atol=1e-4)


def test_wide_remap_covers_degenerate_neighbors():
    """Exact-integer sample coordinates make ceil==floor (degenerate neighbors
    folding onto one slot) and edge clips replicate — the wide remap must stay
    bit-compatible with the narrow 4-gather form on such grids too."""
    from heal_swin_tpu.projection.device import _remap_wide

    for cal in CALS:
        tab = forward_table(cal, NSIDE, BASE, rotate_pole=False)
        a, w4 = _remap_wide(tab)
        # every base stays a valid patch row of the padded (H+1, W+1) geometry
        W1 = tab.W + 1
        assert a.min() >= 0 and a.max() <= (tab.H + 1) * W1 - W1 - 2
        # total weight per pixel is preserved (pure reassignment); folding
        # degenerate neighbors onto one slot reorders the f32 sum, so allow ULPs
        np.testing.assert_allclose(
            w4.sum(0), tab.w00 + tab.w10 + tab.w01 + tab.w11, rtol=0, atol=1e-6
        )


def test_device_mask_projection_matches_tables():
    rng = np.random.RandomState(1)
    masks = rng.randint(0, 7, size=(3, H, W)).astype(np.int32)
    cal_ids = np.array([1, 0, 1], np.int32)

    proj = DeviceProjector(CALS, NSIDE, BASE)
    out = np.asarray(proj.project_masks(masks, cal_ids, s2_bkgd_class=7))

    for b in range(3):
        tab = forward_table(CALS[cal_ids[b]], NSIDE, BASE, rotate_pole=False)
        ref = tab.apply_mask(masks[b], s2_bkgd_class=7)
        np.testing.assert_array_equal(out[b], ref)


def test_device_projection_default_cal_ids():
    imgs = np.ones((2, H, W, 3), np.float32)
    proj = DeviceProjector(CALS[:1], NSIDE, BASE)
    out = np.asarray(proj.project_images(imgs))
    tab = forward_table(CALS[0], NSIDE, BASE, rotate_pole=False)
    # all-ones image -> projected value equals the bilinear weight sum (0 where OOB)
    wsum = tab.w00 + tab.w10 + tab.w01 + tab.w11
    np.testing.assert_allclose(out[0, :, 0], wsum, rtol=1e-6, atol=1e-6)
