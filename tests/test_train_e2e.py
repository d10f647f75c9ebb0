"""End-to-end training tests in the reference's style (SURVEY.md §4): run a tiny train,
then validate the MLflow run — status FINISHED, expected metrics/params/tags/files —
like reference testing/validate_mlflow.py.  Runs in-process (not subprocess) so the
8-virtual-device CPU mesh from conftest is exercised, plus resume and evaluate flows."""

import re
from pathlib import Path

import numpy as np
import pytest

from heal_swin_tpu.tracking.mlflow_store import MlflowFileStore


@pytest.fixture()
def mlruns(tmp_path, monkeypatch):
    d = tmp_path / "mlruns"
    monkeypatch.setenv("HEAL_SWIN_MLRUNS", str(d))
    return d


def _train(config="run_configs/swin_hp_test_run_config.py"):
    from heal_swin_tpu.train import train_model
    from heal_swin_tpu.utils.utils import get_config_from_config_path

    run_config = get_config_from_config_path(config, "get_train_run_config")
    pl_config = get_config_from_config_path(config, "get_pl_config")
    run_id, result = train_model(run_config, pl_config, config_path=config)
    return run_id, result, run_config, pl_config


def _validate_run(mlruns, run_id, expect_metrics, expect_params, depth=False):
    """Mirror of reference ValidateMlflowRun (testing/validate_mlflow.py:10-104)."""
    store = MlflowFileStore(mlruns)
    run = store.get_run(run_id)
    assert run.status == "FINISHED"
    assert run.artifact_dir.is_dir()
    for m in expect_metrics:
        hist = run.get_metric_history(m)
        assert hist, f"metric {m} missing"
        assert all(np.isfinite(v) for _, v, _ in hist), f"metric {m} non-finite"
    for p in expect_params:
        assert (run.run_dir / "params" / p).exists(), f"param {p} missing"
    assert (run.run_dir / "tags" / "cmd").exists()
    # artifacts: dill configs + checkpoints
    for f in ["train_config", "pl_config", "model_config", "data_spec", "data_config",
              "run_config"]:
        assert (run.artifact_dir / f).exists(), f"artifact {f} missing"
    ckpts = list((run.artifact_dir / "checkpoints").glob("*.ckpt"))
    names = [c.name for c in ckpts]
    assert "last.ckpt" in names
    assert "best.ckpt" in names
    assert any(re.match(r"epoch=\d+_.*\.ckpt", n) for n in names), names
    return run


SEG_METRICS = [
    "train_loss", "train_acc", "train_acc_ignored", "train_iou_global",
    "train_iou_global_ignored", "val_loss", "val_acc", "val_iou_global",
    "val_iou_global_ignored", "val_iou_global_class_0_background",
    "train_time_per_sample in ms", "lr-Adam", "evaluate_best_val_iou_global",
]

SEG_PARAMS = [
    "batch_size", "effective_batch_size", "total_params",
    "model.swin_hp_transformer_config.patch_size",
    "model.swin_hp_transformer_config.window_size",
    "model.swin_hp_transformer_config.shift_strategy",
    "model.swin_hp_transformer_config.embed_dim",
    "train.ckpt_metric", "data.input_nside", "data_spec.f_out",
]


def test_train_swin_hp_e2e(mlruns):
    run_id, result, *_ = _train()
    assert result.epochs_run == 1
    _validate_run(mlruns, run_id, SEG_METRICS, SEG_PARAMS)


@pytest.mark.slow
def test_resume_e2e(mlruns):
    """Train, then resume from last.ckpt (reference testing/test_resume.py:9-41)."""
    run_id, result, run_config, pl_config = _train()

    from heal_swin_tpu.resume import main as resume_main
    from heal_swin_tpu.training.train_config import ResumeConfig

    pl_config.max_epochs = 2  # resume config bumps max_epochs (resume_test_run_config.py)
    resume_config = ResumeConfig(path=run_id, epoch="last", train_run_config=run_config)
    new_run_id, new_result = resume_main(None, pl_config, resume_config)

    assert new_run_id != run_id
    assert new_result.epochs_run == 1  # epoch 1 only (epoch 0 done in first run)
    _validate_run(mlruns, new_run_id, ["train_loss", "val_loss"], ["batch_size"])


@pytest.mark.slow
def test_resume_finished_run_e2e(mlruns):
    """Resume a run whose max_epochs is already reached (the default crashed-run
    resume config reuses the saved pl_config): zero epochs run, but the restored
    state is still saved as last.ckpt in the new run so eval_after_train and later
    resumes resolve a checkpoint."""
    run_id, result, run_config, pl_config = _train()

    from heal_swin_tpu.resume import main as resume_main
    from heal_swin_tpu.training.checkpoint import find_checkpoint
    from heal_swin_tpu.training.train_config import ResumeConfig
    from heal_swin_tpu.tracking.mlflow_store import MlflowFileStore

    # max_epochs stays 1 -> start_epoch == max_epochs -> no training
    resume_config = ResumeConfig(path=run_id, epoch="last", train_run_config=run_config)
    new_run_id, _ = resume_main(None, pl_config, resume_config)

    run = MlflowFileStore(mlruns).get_run(new_run_id)
    ckpt = find_checkpoint(run.artifact_dir, epoch="last")
    assert ckpt.name == "last.ckpt"
    assert run.status == "FINISHED"


@pytest.mark.slow
def test_evaluate_e2e(mlruns, tmp_path):
    run_id, *_ = _train()

    from heal_swin_tpu.data.data_config import WoodscapeCommonConfig, WoodscapeHPConfig
    from heal_swin_tpu.evaluate import evaluate
    from heal_swin_tpu.evaluation.evaluate_config import EvaluateConfig
    from heal_swin_tpu.training.train_config import PLConfig, TrainConfig

    eval_config = EvaluateConfig(
        path=run_id,
        epoch="best",
        validate=True,
        predict=True,
        train_config=TrainConfig(mlflow_expmt="test_experiment"),
        data_config=WoodscapeHPConfig(
            common=WoodscapeCommonConfig(
                version="synthetic", batch_size=1, val_batch_size=2, pred_batch_size=2,
                synthetic_train_samples=8, synthetic_val_samples=4,
            ),
            input_nside=32,
        ),
    )
    evaluate(eval_config, PLConfig(limit_val_batches=2, limit_predict_batches=1))

    store = MlflowFileStore(mlruns)
    run = store.get_run(run_id)
    # eval metrics land in the ORIGINAL run with the evaluate_ prefix
    assert run.get_metric_history("evaluate_best_val_iou_global")
    # the predict writer wrote prediction files
    preds = list((run.artifact_dir / "predictions").glob("*.npz"))
    assert preds, "predict writer produced no files"


def test_train_overfits_synthetic(mlruns):
    """Sanity: a few epochs on a 1-batch overfit subset must drive accuracy up —
    verifies gradients flow through the full model."""
    from heal_swin_tpu.train import train_model
    from heal_swin_tpu.utils.utils import get_config_from_config_path

    cfg = "run_configs/swin_hp_test_run_config.py"
    run_config = get_config_from_config_path(cfg, "get_train_run_config")
    pl_config = get_config_from_config_path(cfg, "get_pl_config")
    run_config.data.common.manual_overfit_batches = 1
    run_config.train.eval_after_train = False
    run_config.model.optimizer_config.learning_rate = 1e-2
    pl_config.max_epochs = 12
    pl_config.limit_train_batches = 1.0
    pl_config.check_val_every_n_epoch = 100  # skip val for speed
    pl_config.num_sanity_val_steps = 0

    run_id, result = train_model(run_config, pl_config)
    store = MlflowFileStore(mlruns)
    run = store.get_run(run_id)
    accs = [v for _, v, _ in run.get_metric_history("train_acc")]
    assert accs[-1] > accs[0] + 0.05, f"train_acc did not improve: {accs}"
    losses = [v for _, v, _ in run.get_metric_history("train_loss")]
    assert losses[-1] < losses[0] - 0.02, f"train_loss did not drop: {losses}"
