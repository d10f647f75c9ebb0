#!/usr/bin/env -S python3 -u
"""Default evaluate config: reconstructs everything from the RUN_ID env var\n(reference run_configs/default_evaluate_run_config.py)."""

import os
import sys
from pathlib import Path

_d = Path(__file__).resolve().parent
while _d.name != "run_configs":
    _d = _d.parent
sys.path.insert(0, str(_d))  # _common helpers
sys.path.insert(0, str(_d.parent))  # repo root

RUN_ID = os.getenv("RUN_ID", default="")
EPOCH = "best"


def get_eval_run_config():
    from heal_swin_tpu.evaluation.evaluate_config import EvaluateConfig
    from heal_swin_tpu.utils import utils

    train_run_config = utils.load_config(RUN_ID, "run_config")
    return EvaluateConfig(
        path=RUN_ID, epoch=EPOCH,
        data_config=train_run_config.data, train_config=train_run_config.train,
    )


def get_pl_config():
    from heal_swin_tpu.utils import utils

    pl_config = utils.load_config(RUN_ID, "pl_config")
    pl_config.gpus = 1
    return pl_config


def main():
    import _common
    _common.submit_self(__file__, "evaluate")


if __name__ == "__main__":
    main()
