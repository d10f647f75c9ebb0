"""Projection pipeline tests: forward/inverse fisheye model, round-trip accuracy
(reference test_projection_accuracy_hp, project_on_s2.py:290-299), gather-table parity
with the direct implementation, and back-projection semantics."""

import numpy as np
import pytest

from heal_swin_tpu.data.synthetic_woodscape import make_cal_info
from heal_swin_tpu.ops import healpix as hpx
from heal_swin_tpu.projection import fisheye, tables

CAL = make_cal_info("FV", W=96, H=80, k_scale=96 / 3.5)


def test_projection_roundtrip_accuracy():
    """img -> sphere -> img must be near-exact inside the fisheye FoV."""
    u, v = fisheye.get_uv_from_hw(80, 96, 1.0)
    theta, phi = fisheye.project_img_points_to_s2(u, v, CAL, rotate_pole=False)
    u_new, v_new = fisheye.project_s2_points_to_img(theta, phi, CAL, rotate_pole=False)
    assert ((u_new - u) ** 2).mean() < 1e-4
    assert ((v_new - v) ** 2).mean() < 1e-4


def test_projection_roundtrip_rotate_pole():
    u, v = fisheye.get_uv_from_hw(80, 96, 1.0)
    theta, phi = fisheye.project_img_points_to_s2(u, v, CAL, rotate_pole=True)
    u_new, v_new = fisheye.project_s2_points_to_img(theta, phi, CAL, rotate_pole=True)
    assert ((u_new - u) ** 2).mean() < 1e-4


def test_sphere_roundtrip():
    """sphere -> img -> sphere on the HP grid pixels that land inside the image."""
    nside = 32
    theta, phi = fisheye.hp_grid_angles(nside, 8)
    u, v = fisheye.project_s2_points_to_img(theta, phi, CAL, rotate_pole=False)
    inside = (0 <= u) & (u < 96) & (0 <= v) & (v < 80) & (theta < 1.8)
    t2, p2 = fisheye.project_img_points_to_s2(u[inside], v[inside], CAL, rotate_pole=False)
    assert np.abs(t2 - theta[inside]).max() < 1e-3
    dphi = np.abs((p2 - phi[inside] + np.pi) % (2 * np.pi) - np.pi)
    assert dphi.max() < 1e-3


def test_forward_table_matches_direct_sampling():
    nside = 16
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (3, 80, 96)).astype(np.float64)
    mask = rng.integers(0, 4, (80, 96)).astype(np.uint8)

    theta, phi = fisheye.hp_grid_angles(nside, 8)
    u, v = fisheye.project_s2_points_to_img(theta, phi, CAL, rotate_pole=False)
    hp_img_direct = fisheye.sample_bilinear(img, v, u)
    hp_mask_direct = fisheye.sample_mask(mask, v, u, s2_bkgd_class=0)

    tbl = tables.forward_table(CAL, nside, 8, rotate_pole=False)
    np.testing.assert_allclose(tbl.apply_image(img), hp_img_direct, atol=1e-3)
    np.testing.assert_array_equal(tbl.apply_mask(mask, 0), hp_mask_direct)


def test_backward_table_matches_direct():
    nside = 16
    npix_used = 8 * nside * nside
    rng = np.random.default_rng(1)
    hp_img = rng.uniform(0, 255, (3, npix_used))
    hp_mask = rng.integers(0, 4, npix_used).astype(np.uint8)

    direct_img = fisheye.project_hp_img_back(hp_img, CAL, 0.5, False, 8)
    direct_mask = fisheye.project_hp_mask_back(hp_mask, CAL, 0.5, False, nside, 8, 0)

    tbl = tables.backward_table(CAL, 0.5, nside, 8, rotate_pole=False)
    np.testing.assert_allclose(tbl.apply_image(hp_img), direct_img, atol=1e-6)
    np.testing.assert_array_equal(tbl.apply_mask(hp_mask, 0), direct_mask)


def test_back_projection_identity_of_constant_classes():
    """A constant-class HP mask back-projects to that class inside the HP footprint."""
    nside = 16
    npix_used = 8 * nside * nside
    hp_mask = np.full(npix_used, 2, dtype=np.uint8)
    flat = fisheye.project_hp_mask_back(hp_mask, CAL, 1.0, False, nside, 8, s2_bkgd_class=9)
    vals = np.unique(flat)
    assert set(vals.tolist()) <= {2, 9}
    assert (flat == 2).mean() > 0.5  # fisheye covers most of the frame


def test_projection_content_roundtrip():
    """Project a smooth image onto HP and back: content must correlate strongly."""
    nside = 64
    yy, xx = np.meshgrid(np.arange(80), np.arange(96), indexing="ij")
    img = np.stack([128 + 100 * np.sin(xx / 10), 128 + 100 * np.cos(yy / 10),
                    np.full_like(xx, 50, dtype=float)])
    tbl = tables.forward_table(CAL, nside, 8, rotate_pole=False)
    hp_img = tbl.apply_image(img)
    back = fisheye.project_hp_img_back(hp_img, CAL, 1.0, False, 8)
    # compare on the central region (inside footprint, away from border effects)
    c = (slice(None), slice(20, 60), slice(28, 68))
    corr = np.corrcoef(back[c].ravel(), img[c].ravel())[0, 1]
    assert corr > 0.98, f"correlation {corr}"
