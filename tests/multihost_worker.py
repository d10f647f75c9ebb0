"""Standalone worker for the multi-host (multi-process) trainer test.

Launched by tests/test_multihost.py as N coordinator-connected CPU processes,
each with 4 virtual XLA devices — the no-cluster analogue of a multi-host TPU
pod (SURVEY.md §5.8: DCN data parallelism; reference DDP `num_nodes`,
train_config.py:68).  Trains the tiny synthetic HEAL-SWIN config through the
REAL train_model entry; rank 0 owns the MLflow run and checkpoints.

Env (set by the launcher): JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
JAX_PROCESS_ID, HEAL_SWIN_MLRUNS, XLA_FLAGS (device count).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def tiny_run_config(max_epochs):
    from heal_swin_tpu.data.data_config import WoodscapeCommonConfig, WoodscapeHPConfig
    from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig
    from heal_swin_tpu.models.tasks import WoodscapeSegmenterSwinHPConfig
    from heal_swin_tpu.training.optimizer import OptimizerConfig
    from heal_swin_tpu.training.train_config import (
        PLConfig,
        SingleModelTrainRun,
        TrainConfig,
    )

    run_config = SingleModelTrainRun(
        train=TrainConfig(mlflow_expmt="mh_test", seed=7, eval_after_train=False),
        data=WoodscapeHPConfig(
            common=WoodscapeCommonConfig(
                version="synthetic",
                batch_size=1,  # per device -> global batch 8 on the 8-device mesh
                val_batch_size=2,
                pred_batch_size=2,
                synthetic_train_samples=16,
                synthetic_val_samples=4,
            ),
            input_nside=32,
            input_base_pix=8,
        ),
        model=WoodscapeSegmenterSwinHPConfig(
            swin_hp_transformer_config=SwinHPTransformerConfig(
                patch_size=4, window_size=16, shift_size=8,
                shift_strategy="ring_shift", embed_dim=4, depths=[2, 1],
                num_heads=[2, 2],
            ),
            optimizer_config=OptimizerConfig(learning_rate=1e-3),
        ),
    )
    pl_config = PLConfig(
        max_epochs=max_epochs, log_every_n_steps=1, num_sanity_val_steps=0,
        check_val_every_n_epoch=1,
        seq_parallel_devices=int(os.environ.get("HEAL_SWIN_TEST_SP", "1")),
    )
    return run_config, pl_config


def main():
    from heal_swin_tpu.train import train_model

    run_config, pl_config = tiny_run_config(max_epochs=int(sys.argv[1]))
    run_id, result = train_model(run_config, pl_config)
    if jax.process_index() == 0:
        print(f"MH_RUN_ID={run_id}", flush=True)
    print(f"MH_OK process={jax.process_index()}", flush=True)


if __name__ == "__main__":
    main()
