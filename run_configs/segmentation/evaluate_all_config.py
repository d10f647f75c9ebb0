#!/usr/bin/env -S python3 -u
"""Evaluate-all array job: SLURM_ARRAY_TASK_ID selects the writer; runs the full\nevaluation suite for one run id (reference run_configs/segmentation/evaluate_all_config.py)."""

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
EPOCH_NUMBER = None


def get_eval_run_config():
    from heal_swin_tpu.data.data_config import WoodscapeFlatConfig, WoodscapeHPConfig
    from heal_swin_tpu.evaluation.evaluate_config import EvaluateConfig
    from heal_swin_tpu.utils import utils

    train_run_config = utils.load_config(RUN_ID, "run_config")
    data_config = train_run_config.data
    train_config = train_run_config.train
    flat_hp = "flat" if isinstance(data_config, WoodscapeFlatConfig) else "hp"

    metric_prefix = EPOCH if EPOCH in ["best", "last"] else f"epoch_{EPOCH_NUMBER}"

    ranking_metric = "iou_ignored"
    proj_res = 966
    pred_part = "val"
    pred_samples = 1.0
    predict = True
    validate = False

    task_id = os.environ.get("SLURM_ARRAY_TASK_ID", "0")
    job_id = f"{os.environ.get('SLURM_ARRAY_JOB_ID', 'no_job_id')}_{task_id}"
    if task_id == "0":
        eval_config_name = f"{metric_prefix}_validation_{job_id}"
        pred_writer = "base_writer"
        pred_samples = 10
        validate = True
    elif task_id == "1":
        eval_config_name = f"{metric_prefix}_val_best_worst_{job_id}"
        pred_writer = "best_worst_preds"
    elif task_id == "2":
        eval_config_name = f"{metric_prefix}_train_best_worst_{job_id}"
        pred_writer = "best_worst_preds"
        pred_part = "train"
    elif flat_hp == "flat" and task_id == "3":
        eval_config_name = f"{metric_prefix}_projected_to_hp_{job_id}"
        pred_writer = "val_on_hp_projected"
    elif flat_hp == "flat" and task_id == "4":
        eval_config_name = f"{metric_prefix}_hp_masked_iou_{job_id}"
        pred_writer = "hp_masked_iou"
    elif flat_hp == "hp" and task_id == "3":
        eval_config_name = f"{metric_prefix}_back_projected_{job_id}"
        pred_writer = "val_on_back_projected"
    elif flat_hp == "hp" and task_id == "4":
        eval_config_name = f"{metric_prefix}_back_projected_flat_res_{job_id}"
        pred_writer = "val_on_back_projected"
        proj_res = (640, 768)
    elif flat_hp == "hp" and task_id == "5":
        eval_config_name = f"{metric_prefix}_back_projected_hp_masked_iou_{job_id}"
        pred_writer = "back_projected_hp_masked_iou"
        proj_res = (640, 768)
    else:
        raise ValueError(f"unexpected SLURM_ARRAY_TASK_ID {task_id} for {flat_hp}")

    data_config.common.pred_samples = pred_samples
    data_config.pred_part = pred_part

    return EvaluateConfig(
        path=RUN_ID, epoch=EPOCH, epoch_number=EPOCH_NUMBER,
        eval_config_name=eval_config_name, pred_writer=pred_writer, validate=validate,
        predict=predict, proj_res=proj_res, ranking_metric=ranking_metric,
        data_config=data_config, train_config=train_config,
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
