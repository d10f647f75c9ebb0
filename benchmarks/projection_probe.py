#!/usr/bin/env python3
"""On-device fisheye->HEALPix projection: wide (4C patch-row) vs narrow (4x C) gather.

The TPU gather emitter is row-count-bound (~44 GB/s regardless of row width,
block_gather_probe.py), so replacing the four C-wide bilinear-neighbor gathers
with ONE 4C-wide gather of the 2x2 patch row (projection/device.py _remap_wide)
should cut the gather cost ~4x.  This probe prices both at paper scale
(966x1280 RGB -> nside=256 x 8 base pixels = 524,288 px) on the real device.

Run on a quiet machine: python benchmarks/projection_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from benchmarks.prof_util import device_ms
from heal_swin_tpu.data.synthetic_woodscape import make_cal_info
from heal_swin_tpu.projection.device import (
    DeviceProjector,
    _project_images,
    _project_images_wide,
)

W, H, NSIDE, BASE = 1280, 966, 256, 8
B = int(os.environ.get("PROBE_BATCH", "2"))

CALS = [
    make_cal_info("FV", W=W, H=H, k_scale=W / 3.5),
    make_cal_info("RV", W=W, H=H, k_scale=W / 3.1),
]


def main():
    proj = DeviceProjector(CALS, NSIDE, BASE)
    npix = proj.idx.shape[-1]
    print(f"paper scale: {H}x{W} -> npix={npix}, batch={B}")

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255.0)
    cal_ids = jnp.asarray(np.arange(B) % len(CALS), jnp.int32)

    idx = jnp.asarray(proj.idx)
    w = jnp.asarray(proj.w)
    wa = jnp.asarray(proj.wide_a)
    ww = jnp.asarray(proj.wide_w4)

    def narrow(c, idx, w, cal_ids):
        out = _project_images(idx, w, c.reshape(B, H * W, 3), cal_ids)
        return c + 1e-30 * jnp.sum(out)

    def wide(c, wa, ww, cal_ids):
        out = _project_images_wide(wa, ww, c, cal_ids)
        return c + 1e-30 * jnp.sum(out)

    ms_n = device_ms(narrow, (imgs, idx, w, cal_ids), iters=20)
    ms_w = device_ms(wide, (imgs, wa, ww, cal_ids), iters=20)
    print(f"narrow (4x C-wide gathers): {ms_n:.2f} ms/batch "
          f"({1e3 * B / ms_n:.1f} img/s)")
    print(f"wide  (1x 4C patch gather): {ms_w:.2f} ms/batch "
          f"({1e3 * B / ms_w:.1f} img/s)  [{ms_n / ms_w:.2f}x]")


if __name__ == "__main__":
    main()
