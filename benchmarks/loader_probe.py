#!/usr/bin/env python3
"""Loader-only throughput at paper scale: how fast can the HOST feed the device?

Measures `DataLoader` iteration (no device work) over the full-resolution
(966x1280) synthetic WoodScape fixture in both input modes, sweeping the decode
pool size (``num_workers`` = the reference's ``train_worker`` knob,
data_config.py:5-21):

- device-projection mode (``project_on_device=True``): per-sample work is the
  full-res PNG decode — the mode the VERDICT flagged as host-decode-bound with
  one worker (~65 ms/sample decode vs 58.5 ms/sample train step).
- disk-projected mode: per-sample work is a npz read of the (3, npix) uint8
  HEALPix projection (the reference's training pipeline shape).

The loader is fast enough when its img/s is ~2x the train step's consumption
rate (17 img/s at paper scale), so the input pipeline stays compute-bound.

Usage: python benchmarks/loader_probe.py  (env: LOADER_N_PER_CAM, LOADER_EPOCHS)
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_per_cam = int(os.environ.get("LOADER_N_PER_CAM", 16))
root = Path(os.environ.get("LOADER_DATA_DIR", f"/tmp/heal_swin_loader_data{n_per_cam}"))
os.environ["HEAL_SWIN_DATA_ROOT"] = str(root)

from heal_swin_tpu.data.synthetic_woodscape import generate  # noqa: E402

if not (root / "woodscape").exists():
    print(f"generating full-res (966x1280) fixture, {n_per_cam}/cam ...", file=sys.stderr)
    generate(root, version="woodscape", n_per_cam=n_per_cam, W=1280, H=966, seed=0)

from heal_swin_tpu.data.data import get_data_module  # noqa: E402
from heal_swin_tpu.data.data_config import (  # noqa: E402
    WoodscapeCommonConfig,
    WoodscapeHPConfig,
)


def sweep(on_device: bool):
    mode = "device-projection (PNG decode)" if on_device else "disk-projected (npz read)"
    print(f"\n== {mode} ==")
    for workers in (1, 2, 4, 8):
        cfg = WoodscapeHPConfig(
            common=WoodscapeCommonConfig(
                version="woodscape", batch_size=2, train_share=0.75,
                train_worker=workers,
            ),
            input_nside=256, input_base_pix=8, project_on_device=on_device,
        )
        dm, _ = get_data_module(cfg)
        loader = dm.train_dataloader()
        n_epochs = int(os.environ.get("LOADER_EPOCHS", 3))
        # warm epoch (page cache, pool spin-up), then timed epochs
        n = 0
        for e in range(n_epochs + 1):
            loader.set_epoch(e)
            if e == 1:
                t0 = time.time()
                n = 0
            for batch in loader:
                n += batch[0].shape[0] if isinstance(batch, tuple) else batch.shape[0]
        dt = time.time() - t0
        print(f"  workers={workers}: {n / dt:7.1f} img/s  ({1000 * dt / n:.1f} ms/sample)")


if __name__ == "__main__":
    sweep(on_device=True)
    sweep(on_device=False)
