"""Unit tests for the from-scratch HEALPix grid math (heal_swin_tpu/ops/healpix.py).

The reference outsources this to healpy (C++); healpy is used only as an offline oracle
— these tests pin the conventions via roundtrips, analytic nside=1 values, and geometric
invariants instead (SURVEY.md §7.1 step 1).
"""

import numpy as np
import pytest

from heal_swin_tpu.ops import healpix as hpx


NSIDES = [1, 2, 4, 16, 64, 256]


@pytest.mark.parametrize("nside", NSIDES)
def test_nest_ring_roundtrip(nside):
    pix = np.arange(hpx.nside2npix(nside))
    r = hpx.nest2ring(nside, pix)
    assert np.array_equal(np.sort(r), pix)
    assert np.array_equal(hpx.ring2nest(nside, r), pix)


@pytest.mark.parametrize("nside", NSIDES)
@pytest.mark.parametrize("nest", [True, False])
def test_ang2pix_pix2ang_roundtrip(nside, nest):
    pix = np.arange(hpx.nside2npix(nside))
    theta, phi = hpx.pix2ang(nside, pix, nest=nest)
    assert np.array_equal(hpx.ang2pix(nside, theta, phi, nest=nest), pix)


def test_nside1_analytic():
    # At nside=1 the 12 base pixels are the pixels; ring ordering: 4 at z=2/3
    # (phi = pi/4 + k pi/2), 4 at z=0 (phi = k pi/2), 4 at z=-2/3.
    th, ph = hpx.pix2ang(1, np.arange(12), nest=False)
    assert np.allclose(np.cos(th[:4]), 2 / 3)
    assert np.allclose(ph[:4], [np.pi / 4, 3 * np.pi / 4, 5 * np.pi / 4, 7 * np.pi / 4])
    assert np.allclose(np.cos(th[4:8]), 0, atol=1e-15)
    assert np.allclose(ph[4:8], [0, np.pi / 2, np.pi, 3 * np.pi / 2])
    assert np.allclose(np.cos(th[8:]), -2 / 3)
    # nest ordering equals ring ordering at nside=1 (faces in ring order)
    assert np.array_equal(hpx.nest2ring(1, np.arange(12)), np.arange(12))


def test_nested_children_contiguity():
    """The 4 children of nested parent p at nside are pixels 4p..4p+3 at 2*nside and
    lie inside the parent pixel — the invariant behind PatchMerging-as-reshape."""
    nside = 8
    parents = np.arange(hpx.nside2npix(nside))
    pt, pp = hpx.pix2ang(nside, parents, nest=True)
    for c in range(4):
        children = 4 * parents + c
        ct, cp = hpx.pix2ang(2 * nside, children, nest=True)
        # child center must map back to the parent pixel
        back = hpx.ang2pix(nside, ct, cp, nest=True)
        assert np.array_equal(back, parents)


def test_pix2vec_symmetry():
    x, y, z = hpx.pix2vec(16, np.arange(hpx.nside2npix(16)), nest=True)
    assert abs(x.sum()) < 1e-8 and abs(y.sum()) < 1e-8 and abs(z.sum()) < 1e-8
    assert np.allclose(x * x + y * y + z * z, 1.0)


def test_equal_area_property():
    """ang2pix of uniform sphere samples must hit all pixels ~uniformly."""
    rng = np.random.default_rng(0)
    nside = 4
    n = 200_000
    theta = np.arccos(rng.uniform(-1, 1, n))
    phi = rng.uniform(0, 2 * np.pi, n)
    pix = hpx.ang2pix(nside, theta, phi, nest=True)
    counts = np.bincount(pix, minlength=hpx.nside2npix(nside))
    expected = n / hpx.nside2npix(nside)
    assert np.all(np.abs(counts - expected) < 6 * np.sqrt(expected))


def test_interp_weights_properties():
    rng = np.random.default_rng(1)
    nside = 32
    npix = hpx.nside2npix(nside)
    theta = np.arccos(rng.uniform(-1, 1, 5000))
    phi = rng.uniform(-np.pi, np.pi, 5000)  # negative phi must be handled (atan2 output)
    for nest in [False, True]:
        pix, wgt = hpx.get_interp_weights(nside, theta, phi, nest=nest)
        assert pix.shape == (4, 5000) and wgt.shape == (4, 5000)
        assert pix.min() >= 0 and pix.max() < npix
        assert np.allclose(wgt.sum(0), 1.0, atol=1e-12)
        assert wgt.min() >= -1e-12


def test_interp_weights_poles():
    nside = 16
    theta = np.array([0.0, 1e-9, 1e-4, np.pi - 1e-4, np.pi - 1e-9, np.pi])
    phi = np.linspace(0, 5, 6)
    pix, wgt = hpx.get_interp_weights(nside, theta, phi, nest=False)
    assert np.allclose(wgt.sum(0), 1.0)
    assert pix.min() >= 0 and pix.max() < hpx.nside2npix(nside)


def test_interp_val_smooth_function():
    nside = 32
    npix = hpx.nside2npix(nside)
    m = np.cos(hpx.pix2ang(nside, np.arange(npix), nest=False)[0])
    rng = np.random.default_rng(2)
    theta = np.arccos(rng.uniform(-1, 1, 2000))
    phi = rng.uniform(0, 2 * np.pi, 2000)
    vals = hpx.get_interp_val(m, theta, phi, nest=False)
    assert np.abs(vals - np.cos(theta)).max() < 5e-3


def test_interp_val_at_pixel_centers_nest():
    """Interpolating a map at its own pixel centers reproduces smooth values well and
    the nearest-pixel (max-weight) index equals the pixel itself (used by sample_mask)."""
    nside = 16
    npix = hpx.nside2npix(nside)
    theta, phi = hpx.pix2ang(nside, np.arange(npix), nest=True)
    pix, wgt = hpx.get_interp_weights(nside, theta, phi, nest=True)
    nearest = pix[np.argmax(wgt, axis=0), np.arange(npix)]
    assert np.array_equal(nearest, np.arange(npix))


def test_npix2nside_and_validation():
    assert hpx.npix2nside(12) == 1
    assert hpx.npix2nside(786432) == 256
    with pytest.raises(ValueError):
        hpx.npix2nside(100)
    assert hpx.isnsideok(64)
    assert not hpx.isnsideok(48)
