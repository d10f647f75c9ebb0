#!/usr/bin/env -S python3 -u
"""Paper run config (reference run_configs/segmentation/swin_synwoodscape_large_plus_AD_train_run_config.py)."""

import os
import sys
from pathlib import Path

_d = Path(__file__).resolve().parent
while _d.name != "run_configs":
    _d = _d.parent
sys.path.insert(0, str(_d))  # _common helpers
sys.path.insert(0, str(_d.parent))  # repo root


def get_train_run_config():
    import _common

    return _common.flat_seg_train_run(
        version="synwoodscape_large_plus_AD",
        expmt="synwoodscape_large_plus_AD",
        class_weights=_common.SYNWOODSCAPE_LARGE_PLUS_AD_WEIGHTS,
    )


def get_pl_config():
    import _common

    return _common.paper_pl_config()


def main():
    import _common
    _common.submit_self(__file__, "train")


if __name__ == "__main__":
    main()
