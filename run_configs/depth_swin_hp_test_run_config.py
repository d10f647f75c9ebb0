"""Tiny HEAL-SWIN depth train config on synthetic data (reference testing style)."""

from heal_swin_tpu.data.data_config import (
    WoodscapeCommonConfig,
    WoodscapeDepthCommonConfig,
    WoodscapeHPDepthConfig,
)
from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig
from heal_swin_tpu.models.tasks import CommonDepthConfig, WoodscapeDepthSwinHPConfig
from heal_swin_tpu.training.optimizer import OptimizerConfig
from heal_swin_tpu.training.train_config import PLConfig, SingleModelTrainRun, TrainConfig


def get_train_run_config():
    return SingleModelTrainRun(
        train=TrainConfig(
            mlflow_expmt="test_experiment_depth",
            seed=42,
            eval_after_train=True,
            ckpt_metric="val_mse",
            ckpt_mode="min",
        ),
        data=WoodscapeHPDepthConfig(
            common=WoodscapeCommonConfig(
                version="synthetic",
                batch_size=1,
                val_batch_size=2,
                pred_batch_size=2,
                synthetic_train_samples=8,
                synthetic_val_samples=4,
            ),
            common_depth=WoodscapeDepthCommonConfig(
                mask_background=False, data_transform="log", normalize_data="standardize",
            ),
            input_nside=32,
            input_base_pix=8,
        ),
        model=WoodscapeDepthSwinHPConfig(
            swin_hp_transformer_config=SwinHPTransformerConfig(
                patch_size=4,
                window_size=16,
                shift_size=8,
                shift_strategy="ring_shift",
                embed_dim=4,
                depths=[2, 1],
                num_heads=[2, 2],
            ),
            optimizer_config=OptimizerConfig(learning_rate=1e-4),
            common_depth_config=CommonDepthConfig(loss="l2"),
        ),
    )


def get_pl_config():
    return PLConfig(
        max_epochs=1,
        limit_train_batches=2,
        limit_val_batches=2,
        limit_predict_batches=1,
        log_every_n_steps=1,
        num_sanity_val_steps=0,
    )
