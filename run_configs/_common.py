"""Shared builders for the ported reference run configs
(reference heal_swin/run_configs/**; paper hyperparameters from
swin_hp_synwoodscape_large_train_run_config.py:48-92 and siblings).

Each run config module stays a standalone ``get_*_config()`` + self-submitting
``main()`` (the reference's files double as SLURM jobscripts; here main() invokes
run.py locally and still reads SLURM_* env vars when present)."""

from __future__ import annotations

import os
import subprocess
from pathlib import Path

# class weights from the reference run configs (CE class balancing)
SYNWOODSCAPE_LARGE_WEIGHTS = [
    0.62990112, 0.5111932, 0.88803174, 0.39921158,
    0.75032628, 0.88420746, 0.67315916, 0.43332322,
]
WOODSCAPE_WEIGHTS = [
    0.34876218, 0.44370147, 0.89928661, 1.1544441, 1.3193849,
    1.7061983, 0.73121492, 1.2444171, 1.6885881, 2.364354,
]
SYNWOODSCAPE_LARGE_PLUS_AD_WEIGHTS = [
    0.64988532, 0.5111932, 1.18160048, 0.88803174, 0.39921158, 0.75032628,
    0.88420746, 1.91088558, 0.67315916, 2.34623503, 1.67844596, 0.43332322,
]

PAPER_LR = 0.000954993


def job_id():
    return os.environ.get("SLURM_JOB_ID", "no_job_id")


def paper_swin_hp_config():
    """HEAL-SWIN paper architecture (reference :48-65)."""
    from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig

    return SwinHPTransformerConfig(
        window_size=64, drop_rate=0.1, attn_drop_rate=0.1, patch_size=4, shift_size=4,
        embed_dim=96, depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24], mlp_ratio=4.0,
        qkv_bias=True, ape=False, use_cos_attn=True, use_v2_norm_placement=True,
        shift_strategy="ring_shift", rel_pos_bias="flat",
    )


def paper_swin_flat_config():
    """Flat SWIN paper architecture (reference swin_synwoodscape_large...:48-63)."""
    from heal_swin_tpu.models.swin_flat import SwinTransformerConfig

    return SwinTransformerConfig(
        window_size=8, drop_rate=0.1, attn_drop_rate=0.1, patch_size=2, shift_size=2,
        embed_dim=96, depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24], mlp_ratio=4.0,
        qkv_bias=True, ape=False, use_cos_attn=True, use_v2_norm_placement=True,
    )


def hp_seg_train_run(version, expmt, class_weights, training_data_fraction=1.0,
                     data_fraction_seed=42, nside=256, batch_size=2):
    from heal_swin_tpu.data.data_config import WoodscapeCommonConfig, WoodscapeHPConfig
    from heal_swin_tpu.models.tasks import WoodscapeSegmenterSwinHPConfig
    from heal_swin_tpu.training.optimizer import OptimizerConfig
    from heal_swin_tpu.training.train_config import SingleModelTrainRun, TrainConfig

    return SingleModelTrainRun(
        train=TrainConfig(
            job_id=job_id(), mlflow_expmt=expmt, description="swin-hp",
            eval_after_train=False, early_stopping=False,
        ),
        data=WoodscapeHPConfig(
            common=WoodscapeCommonConfig(
                version=version, batch_size=batch_size, val_batch_size=4,
                pred_batch_size=4,
                train_worker=5, val_worker=5,
                training_data_fraction=training_data_fraction,
                data_fraction_seed=data_fraction_seed,
            ),
            input_nside=nside,
            input_base_pix=8,
        ),
        model=WoodscapeSegmenterSwinHPConfig(
            swin_hp_transformer_config=paper_swin_hp_config(),
            optimizer_config=OptimizerConfig(scheduler=None, learning_rate=PAPER_LR),
            class_weights=class_weights,
        ),
    )


def flat_seg_train_run(version, expmt, class_weights, training_data_fraction=1.0,
                       data_fraction_seed=42):
    from heal_swin_tpu.data.data_config import WoodscapeCommonConfig, WoodscapeFlatConfig
    from heal_swin_tpu.models.tasks import WoodscapeSegmenterSwinConfig
    from heal_swin_tpu.training.optimizer import OptimizerConfig
    from heal_swin_tpu.training.train_config import SingleModelTrainRun, TrainConfig

    return SingleModelTrainRun(
        train=TrainConfig(
            job_id=job_id(), mlflow_expmt=expmt, description="swin-unet",
            eval_after_train=False, early_stopping=False,
        ),
        data=WoodscapeFlatConfig(
            common=WoodscapeCommonConfig(
                version=version, batch_size=2, val_batch_size=4, pred_batch_size=4,
                train_worker=5, val_worker=5,
                training_data_fraction=training_data_fraction,
                data_fraction_seed=data_fraction_seed,
            ),
            input_width=768,
            input_height=640,
            padding=[0, 0, 0, 0],
        ),
        model=WoodscapeSegmenterSwinConfig(
            swin_transformer_config=paper_swin_flat_config(),
            optimizer_config=OptimizerConfig(scheduler=None, learning_rate=PAPER_LR),
            class_weights=class_weights,
        ),
    )


def paper_pl_config():
    """max 1000 epochs, 4 devices DP (reference :85-92; gpus -> mesh size)."""
    from heal_swin_tpu.training.train_config import PLConfig

    return PLConfig(max_epochs=1000, gpus=4, accelerator="ddp")


def submit_self(config_path, command):
    base_path = Path(config_path).resolve()
    while base_path.name != "run_configs" and base_path.parent != base_path:
        base_path = base_path.parent
    repo = base_path.parent
    cmd = ["python3", "-u", str(repo / "run.py"), command, "--config_path", str(config_path)]
    print(" ".join(cmd))
    subprocess.run(cmd)
