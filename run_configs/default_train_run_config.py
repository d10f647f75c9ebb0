#!/usr/bin/env -S python3 -u
"""Default train run config (reference run_configs/default_train_run_config.py)."""

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
    from heal_swin_tpu.training.train_config import SingleModelTrainRun, TrainConfig

    return SingleModelTrainRun(train=TrainConfig(job_id=_common.job_id()))


def get_pl_config():
    from heal_swin_tpu.training.train_config import PLConfig

    return PLConfig()


def main():
    import _common
    _common.submit_self(__file__, "train")


if __name__ == "__main__":
    main()
