#!/usr/bin/env -S python3 -u
"""Paper-scale TPU depth smoke: HEAL-SWIN depth estimation (nside=256, paper
capacity, l2 loss, standardize normalization — reference
run_configs/depth_estimation/depth_swin_hp_train_run_config.py:14-135) trained for
~100 real steps on an auto-generated full-resolution (966x1280) synthetic
SynWoodScape fixture with depth maps, through the on-device projection input path.

Doubles as the evaluation config: after training,
``RUN_ID=<id> python run.py evaluate --config_path run_configs/smoke_tpu_depth_run_config.py``
runs the Chamfer-distance writer suite (the paper's headline depth metric,
`chamfer_distance_full_res_hp_masked`) on the best checkpoint, on hardware.
Results are committed in docs/TPU_SMOKE.md.
"""

import os
import sys
from pathlib import Path

_d = Path(__file__).resolve().parent
while _d.name != "run_configs":
    _d = _d.parent
sys.path.insert(0, str(_d))
sys.path.insert(0, str(_d.parent))

_root = Path(os.environ.setdefault("HEAL_SWIN_DATA_ROOT", "/tmp/heal_swin_smoke_depth"))
os.environ.setdefault("HEAL_SWIN_MLRUNS", str(_root / "mlruns"))

N_PER_CAM = int(os.environ.get("SMOKE_N_PER_CAM", 8))  # 4 cams -> 24 train / 8 val
MAX_EPOCHS = int(os.environ.get("SMOKE_EPOCHS", 8))  # 12 steps/epoch @ batch 2


def _ensure_fixture():
    from heal_swin_tpu.data.synthetic_woodscape import generate

    if not (_root / "synwoodscape").exists():
        generate(_root, version="synwoodscape", n_per_cam=N_PER_CAM, W=1280, H=966,
                 seed=0, with_depth=True)


def _data_config():
    from heal_swin_tpu.data.data_config import (
        WoodscapeCommonConfig,
        WoodscapeDepthCommonConfig,
        WoodscapeHPDepthConfig,
    )

    return WoodscapeHPDepthConfig(
        common=WoodscapeCommonConfig(
            version="synwoodscape",
            batch_size=2,
            val_batch_size=2,
            pred_batch_size=2,
            pred_samples=4,
            train_share=0.75,
        ),
        common_depth=WoodscapeDepthCommonConfig(
            mask_background=True, data_transform=None, normalize_data="standardize",
        ),
        input_nside=256,
        input_base_pix=8,
        project_on_device=True,
    )


def get_train_run_config():
    import _common
    from heal_swin_tpu.models.tasks import CommonDepthConfig, WoodscapeDepthSwinHPConfig
    from heal_swin_tpu.training.optimizer import OptimizerConfig
    from heal_swin_tpu.training.train_config import SingleModelTrainRun, TrainConfig

    _ensure_fixture()
    return SingleModelTrainRun(
        train=TrainConfig(
            mlflow_expmt="tpu_smoke_depth",
            job_id="smoke_tpu_depth",
            seed=42,
            ckpt_metric="val_mse",
            ckpt_mode="min",
            eval_after_train=False,  # run the chamfer evaluate explicitly (below)
        ),
        data=_data_config(),
        model=WoodscapeDepthSwinHPConfig(
            swin_hp_transformer_config=_common.paper_swin_hp_config(),
            optimizer_config=OptimizerConfig(learning_rate=0.005, scheduler=None,
                                             weight_decay=0.0),
            common_depth_config=CommonDepthConfig(
                loss="l2", use_logvar=False, train_uncertainty_after=-1, huber_delta=1
            ),
        ),
    )


def get_eval_run_config():
    from heal_swin_tpu.evaluation.evaluate_config import EvaluateConfig
    from heal_swin_tpu.training.train_config import TrainConfig

    _ensure_fixture()
    return EvaluateConfig(
        path=os.environ["RUN_ID"],
        epoch="best",
        pred_writer="chamfer_distance",
        validate=True,
        predict=True,
        top_k=1,
        ranking_metric="mse",
        sort_dir="asc",
        train_config=TrainConfig(mlflow_expmt="tpu_smoke_depth"),
        data_config=_data_config(),
    )


def get_pl_config():
    from heal_swin_tpu.training.train_config import PLConfig

    return PLConfig(
        max_epochs=MAX_EPOCHS,
        check_val_every_n_epoch=4,
        limit_val_batches=2,
        limit_predict_batches=2,
        log_every_n_steps=10**6,
        num_sanity_val_steps=0,
    )
