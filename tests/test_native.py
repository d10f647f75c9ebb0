"""C++ native HEALPix library: build, cross-check against the numpy implementation,
and verify the dispatch path in ops/healpix.py."""

import numpy as np
import pytest

from heal_swin_tpu.ops import native


@pytest.fixture(scope="module")
def lib():
    if native.get_lib() is None:
        pytest.skip("native library could not be built (no compiler?)")
    return native


NSIDES = [1, 4, 32, 256]


@pytest.mark.parametrize("nside", NSIDES)
def test_native_matches_numpy_ring_nest(lib, nside):
    import heal_swin_tpu.ops.healpix as hpx

    npix = hpx.nside2npix(nside)
    pix = np.arange(npix)
    # force numpy paths by computing directly via xyf
    x, y, f = hpx.nest2xyf(nside, pix)
    np_ring = hpx.xyf2ring(nside, x, y, f)
    np.testing.assert_array_equal(lib.nest2ring(nside, pix), np_ring)
    x, y, f = hpx.ring2xyf(nside, pix)
    np_nest = hpx.xyf2nest(nside, x, y, f)
    np.testing.assert_array_equal(lib.ring2nest(nside, pix), np_nest)


@pytest.mark.parametrize("nside", NSIDES)
@pytest.mark.parametrize("nest", [True, False])
def test_native_matches_numpy_pix2ang_ang2pix(lib, nside, nest):
    import heal_swin_tpu.ops.healpix as hpx

    npix = hpx.nside2npix(nside)
    pix = np.arange(npix)
    if nest:
        x, y, f = hpx.nest2xyf(nside, pix)
    else:
        x, y, f = hpx.ring2xyf(nside, pix)
    z, phi_np = hpx._xyf2loc(nside, x, y, f)
    theta_np = np.arccos(np.clip(z, -1, 1))
    theta, phi = lib.pix2ang(nside, pix, nest)
    np.testing.assert_allclose(theta, theta_np, atol=1e-13)
    np.testing.assert_allclose(phi, phi_np, atol=1e-13)
    np.testing.assert_array_equal(lib.ang2pix(nside, theta, phi, nest), pix)


def test_native_matches_numpy_interp_weights(lib):
    import heal_swin_tpu.ops.healpix as hpx

    rng = np.random.default_rng(0)
    nside = 64
    theta = np.arccos(rng.uniform(-1, 1, 3000))
    phi = rng.uniform(-np.pi, np.pi, 3000)
    # polar edge cases
    theta[:4] = [0.0, 1e-9, np.pi - 1e-9, np.pi]
    for nest in [False, True]:
        # numpy reference path (size below dispatch threshold would use numpy anyway;
        # be explicit via the private implementation by slicing under threshold)
        p_np = []
        w_np = []
        for start in range(0, 3000, 1000):
            sl = slice(start, start + 1000)
            p, w = hpx.get_interp_weights(nside, theta[sl], phi[sl], nest=nest)
            p_np.append(p)
            w_np.append(w)
        p_np = np.concatenate(p_np, axis=1)
        w_np = np.concatenate(w_np, axis=1)
        p_nat, w_nat = lib.get_interp_weights(nside, theta, phi, nest)
        np.testing.assert_array_equal(p_nat, p_np)
        np.testing.assert_allclose(w_nat, w_np, atol=1e-12)


def test_dispatch_uses_native_for_large_inputs(lib, monkeypatch):
    """Large inputs route through native and agree with forced-numpy results."""
    import heal_swin_tpu.ops.healpix as hpx

    nside = 128
    pix = np.arange(hpx.nside2npix(nside))
    via_dispatch = hpx.nest2ring(nside, pix)
    monkeypatch.setattr(hpx, "_native", lambda: None)
    via_numpy = hpx.nest2ring(nside, pix)
    np.testing.assert_array_equal(via_dispatch, via_numpy)
