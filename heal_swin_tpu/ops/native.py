"""ctypes loader for the C++ HEALPix core (heal_swin_tpu/native/healpix_native.cpp).

The library is optional: built via ``make -C heal_swin_tpu/native`` (attempted
automatically once per process if a compiler is present); the pure-numpy implementation
in ops/healpix.py is the fallback and the cross-check oracle.  Disable with
HEAL_SWIN_NO_NATIVE=1."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libhealpix_native.so"
_lib = None
_tried = False


def _build():
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("HEAL_SWIN_NO_NATIVE") == "1":
        return None
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.hpx_nest2ring.argtypes = [ctypes.c_int64, i64p, ctypes.c_int64, i64p]
    lib.hpx_ring2nest.argtypes = [ctypes.c_int64, i64p, ctypes.c_int64, i64p]
    lib.hpx_pix2ang.argtypes = [ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int, f64p, f64p]
    lib.hpx_ang2pix.argtypes = [ctypes.c_int64, f64p, f64p, ctypes.c_int64, ctypes.c_int, i64p]
    lib.hpx_get_interp_weights.argtypes = [
        ctypes.c_int64, f64p, f64p, ctypes.c_int64, ctypes.c_int, i64p, f64p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def _f64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def _ptr_i(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _ptr_f(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def nest2ring(nside, pix):
    lib = get_lib()
    pix = _i64(pix)
    out = np.empty_like(pix)
    lib.hpx_nest2ring(nside, _ptr_i(pix), pix.size, _ptr_i(out))
    return out


def ring2nest(nside, pix):
    lib = get_lib()
    pix = _i64(pix)
    out = np.empty_like(pix)
    lib.hpx_ring2nest(nside, _ptr_i(pix), pix.size, _ptr_i(out))
    return out


def pix2ang(nside, pix, nest):
    lib = get_lib()
    pix = _i64(pix)
    theta = np.empty(pix.shape, np.float64)
    phi = np.empty(pix.shape, np.float64)
    lib.hpx_pix2ang(nside, _ptr_i(pix), pix.size, int(nest), _ptr_f(theta), _ptr_f(phi))
    return theta, phi


def ang2pix(nside, theta, phi, nest):
    lib = get_lib()
    theta, phi = _f64(theta), _f64(phi)
    out = np.empty(theta.shape, np.int64)
    lib.hpx_ang2pix(nside, _ptr_f(theta), _ptr_f(phi), theta.size, int(nest), _ptr_i(out))
    return out


def get_interp_weights(nside, theta, phi, nest):
    lib = get_lib()
    theta, phi = _f64(theta), _f64(phi)
    n = theta.size
    pix = np.empty((4, n), np.int64)
    wgt = np.empty((4, n), np.float64)
    lib.hpx_get_interp_weights(
        nside, _ptr_f(theta), _ptr_f(phi), n, int(nest), _ptr_i(pix), _ptr_f(wgt)
    )
    return pix.reshape((4,) + theta.shape), wgt.reshape((4,) + theta.shape)
