#!/usr/bin/env -S python3 -u
"""Default resume config for crashed runs: reloads run_config/pl_config from the\nrun's artifacts via RUN_ID (reference run_configs/default_resume_config.py)."""

import os
import sys
from pathlib import Path

_d = Path(__file__).resolve().parent
while _d.name != "run_configs":
    _d = _d.parent
sys.path.insert(0, str(_d))  # _common helpers
sys.path.insert(0, str(_d.parent))  # repo root

RUN_ID = os.getenv("RUN_ID", default="")
EPOCH = "last"
EPOCH_NUMBER = None


def get_resume_run_config():
    from heal_swin_tpu.training.train_config import ResumeConfig
    from heal_swin_tpu.utils import utils

    if not RUN_ID:
        raise SystemExit(
            "default_resume_config: set the RUN_ID env var to the MLflow run id "
            "to resume (RUN_ID=<id> python run.py resume --config_path ...)"
        )
    train_run_config = utils.load_config(RUN_ID, "run_config")
    return ResumeConfig(
        path=RUN_ID, epoch=EPOCH, epoch_number=EPOCH_NUMBER,
        train_run_config=train_run_config,
    )


def get_pl_config():
    from heal_swin_tpu.utils import utils

    return utils.load_config(RUN_ID, "pl_config")


def main():
    import _common
    _common.submit_self(__file__, "resume")


if __name__ == "__main__":
    main()
