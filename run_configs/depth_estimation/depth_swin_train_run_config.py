#!/usr/bin/env -S python3 -u
"""Paper flat depth run config (reference run_configs/depth_estimation/depth_swin_train_run_config.py)."""

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
    from heal_swin_tpu.data.data_config import (
        WoodscapeCommonConfig,
        WoodscapeDepthCommonConfig,
        WoodscapeDepthFlatConfig,
    )
    from heal_swin_tpu.models.tasks import CommonDepthConfig, WoodscapeDepthSwinConfig
    from heal_swin_tpu.training.optimizer import OptimizerConfig
    from heal_swin_tpu.training.train_config import SingleModelTrainRun, TrainConfig

    data_transform = None
    learning_rate = 0.005
    loss = "l2"
    mask_background = True
    normalize_data = "standardize"

    train_config = TrainConfig(
        ckpt_metric="val_mse",
        ckpt_mode="min",
        description="SWIN flat depth: lr 0.005, l2 loss, standardize, no transform",
        early_stopping=False,
        early_stopping_mode="min",
        early_stopping_monitor="val_mse",
        eval_after_train=False,
        job_id=_common.job_id(),
        mlflow_expmt="depth_estimation",
    )
    data_config = WoodscapeDepthFlatConfig(
        common=WoodscapeCommonConfig(
            train_worker=5, val_worker=5, shuffle=True, batch_size=2, val_batch_size=4,
            pred_batch_size=4, manual_overfit_batches=0, pred_samples=10,
            rotate_pole=False, seed=42, cam_pos=None, train_share=0.8, crop_green=False,
            version="synwoodscape",
        ),
        common_depth=WoodscapeDepthCommonConfig(
            mask_background=mask_background,
            data_transform=data_transform,
            normalize_data=normalize_data,
        ),
        pred_part="val",
        input_width=768,
        input_height=640,
        shuffle_train_val_split=True,
    )
    model_config = WoodscapeDepthSwinConfig(
        swin_transformer_config=_common.paper_swin_flat_config(),
        optimizer_config=OptimizerConfig(learning_rate=learning_rate, scheduler=None,
                                         weight_decay=0.0),
        common_depth_config=CommonDepthConfig(
            loss=loss, use_logvar=False, train_uncertainty_after=-1, huber_delta=1
        ),
    )
    return SingleModelTrainRun(train=train_config, data=data_config, model=model_config)


def get_pl_config():
    import _common

    pl = _common.paper_pl_config()
    pl.gradient_clip_val = 0
    return pl


def main():
    import _common
    _common.submit_self(__file__, "train")


if __name__ == "__main__":
    main()
