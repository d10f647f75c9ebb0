#!/usr/bin/env -S python3 -u
"""Data-efficiency array-job config: SLURM_ARRAY_TASK_ID selects the training\ndata fraction (reference run_configs/segmentation/swin_hp_synwoodscape_large_plus_AD_data_efficiency_train_run_config.py)."""

import os
import sys
from pathlib import Path

_d = Path(__file__).resolve().parent
while _d.name != "run_configs":
    _d = _d.parent
sys.path.insert(0, str(_d))  # _common helpers
sys.path.insert(0, str(_d.parent))  # repo root

TRAINING_DATA_FRACTIONS = [0.01, 0.05, 0.1, 0.2, 0.3, 0.5, 0.7, 0.9, 1.0]
DATA_FRACTION_SEED = 2


def get_train_run_config():
    import _common

    task_id = int(os.environ.get("SLURM_ARRAY_TASK_ID", "0"))
    fraction = TRAINING_DATA_FRACTIONS[task_id]
    run = _common.hp_seg_train_run(
        version="synwoodscape_large_plus_AD",
        expmt="synwoodscape_large_plus_AD_data_efficiency",
        class_weights=_common.SYNWOODSCAPE_LARGE_PLUS_AD_WEIGHTS,
        training_data_fraction=fraction,
        data_fraction_seed=DATA_FRACTION_SEED,
    )
    run.train.description = (run.train.description or "") + f" fraction={fraction}"
    return run


def get_pl_config():
    import _common

    return _common.paper_pl_config()


def main():
    import _common
    _common.submit_self(__file__, "train")


if __name__ == "__main__":
    main()
