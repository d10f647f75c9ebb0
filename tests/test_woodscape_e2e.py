"""End-to-end tests on a fabricated on-disk WoodScape: file listing, auto-projection
dataset generation, HP + flat datamodules, training, and the full writer suite
including the paper metrics (val_iou_projected_to_hp, val_hp_masked_iou,
val_back_projected_hp_masked_iou_res_*)."""

import numpy as np
import pytest

from heal_swin_tpu.data.synthetic_woodscape import generate
from heal_swin_tpu.tracking.mlflow_store import MlflowFileStore

pytestmark = pytest.mark.slow  # full WoodScape-format e2e trainings, ~2 min (fast tier: run.py test-repo)

NSIDE = 16


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    data_root = root / "datasets"
    mlruns = root / "mlruns"
    generate(data_root, version="woodscape_test", n_per_cam=3, W=96, H=80)
    return {"data_root": data_root, "mlruns": mlruns}


@pytest.fixture(autouse=True)
def _paths(env, monkeypatch):
    monkeypatch.setenv("HEAL_SWIN_DATA_ROOT", str(env["data_root"]))
    monkeypatch.setenv("HEAL_SWIN_MLRUNS", str(env["mlruns"]))


def _hp_configs():
    from heal_swin_tpu.data.data_config import WoodscapeCommonConfig, WoodscapeHPConfig
    from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig
    from heal_swin_tpu.models.tasks import WoodscapeSegmenterSwinHPConfig
    from heal_swin_tpu.training.train_config import PLConfig, SingleModelTrainRun, TrainConfig

    run_config = SingleModelTrainRun(
        train=TrainConfig(mlflow_expmt="ws_test", seed=1, eval_after_train=False),
        data=WoodscapeHPConfig(
            common=WoodscapeCommonConfig(
                version="woodscape_test", batch_size=1, val_batch_size=2, pred_batch_size=2,
                pred_samples=2, train_share=0.75,
            ),
            input_nside=NSIDE,
            input_base_pix=8,
        ),
        model=WoodscapeSegmenterSwinHPConfig(
            swin_hp_transformer_config=SwinHPTransformerConfig(
                patch_size=4, window_size=16, shift_size=8, shift_strategy="ring_shift",
                embed_dim=4, depths=[2, 1], num_heads=[2, 2],
            )
        ),
    )
    pl_config = PLConfig(
        max_epochs=1, limit_train_batches=2, limit_val_batches=2, limit_predict_batches=2,
        log_every_n_steps=1, num_sanity_val_steps=0,
    )
    return run_config, pl_config


def test_hp_train_and_full_eval(env):
    from heal_swin_tpu.data.data_config import WoodscapeCommonConfig, WoodscapeHPConfig
    from heal_swin_tpu.evaluate import evaluate
    from heal_swin_tpu.evaluation.evaluate_config import EvaluateConfig
    from heal_swin_tpu.train import train_model
    from heal_swin_tpu.training.train_config import PLConfig, TrainConfig

    run_config, pl_config = _hp_configs()
    run_id, result = train_model(run_config, pl_config)

    store = MlflowFileStore(env["mlruns"])
    run = store.get_run(run_id)
    assert run.status == "FINISHED"
    assert run.get_metric_history("val_iou_global")

    # the auto-generated projected dataset exists and is reference-format
    ds_dir = env["data_root"] / "woodscape_test" / (
        f"hp_images_nside={NSIDE}_base_pix=8_crop_green=False"
    )
    npzs = list(ds_dir.glob("*.npz"))
    assert (ds_dir / "metadata.json").exists()
    sample = np.load([p for p in npzs if "grid" not in p.name][0])
    assert sample["hp_img"].shape == (3, 8 * NSIDE * NSIDE)
    assert sample["hp_mask"].shape == (8 * NSIDE * NSIDE,)

    # full evaluation with the paper's headline HP writer
    eval_config = EvaluateConfig(
        path=run_id,
        epoch="best",
        pred_writer="back_projected_hp_masked_iou",
        proj_res=(40, 48),
        validate=True,
        predict=True,
        train_config=TrainConfig(mlflow_expmt="ws_test"),
        data_config=run_config.data,
    )
    evaluate(eval_config, PLConfig(limit_val_batches=2, limit_predict_batches=2))

    hist = run.get_metric_history("evaluate_best_val_back_projected_hp_masked_iou_res_40_48")
    assert hist, "paper headline metric missing"
    assert all(np.isfinite(v) for _, v, _ in hist)
    assert run.get_metric_history("evaluate_best_val_iou_back_projected_res_40_48")
    assert run.get_metric_history("evaluate_best_val_acc_back_projected_res_40_48")


def test_hp_base_and_bestworst_writers(env):
    from heal_swin_tpu.data.data import get_data_module
    from heal_swin_tpu.models.tasks import MODEL_FROM_CONFIG_NAME
    from heal_swin_tpu.training.trainer import Trainer

    run_config, pl_config = _hp_configs()
    dm, spec = get_data_module(run_config.data)
    task = MODEL_FROM_CONFIG_NAME[type(run_config.model).__name__](
        run_config.model, spec, run_config.data
    )
    import jax

    params = jax.jit(task.init_variables)(
        jax.random.PRNGKey(0), np.zeros((1, spec.dim_in, 3), np.float32)
    )
    trainer = Trainer(pl_config)
    out_dir = env["mlruns"] / "writer_out"
    out_dir.mkdir(parents=True, exist_ok=True)

    writer = dm.get_pred_writer("base_writer", output_dir=out_dir, output_resolution=0.5,
                                prefix="t", proj_res=1.0, top_k=1, ranking_metric="iou_ignored",
                                sort_dir="asc")
    trainer.predict(task, dm, params, writer=writer)
    assert list(out_dir.glob("t_val_*_iou=*.png")), "base writer wrote no overlays"

    writer = dm.get_pred_writer("best_worst_preds", output_dir=out_dir, output_resolution=0.5,
                                prefix="bw", proj_res=1.0, top_k=1,
                                ranking_metric="iou_ignored", sort_dir="asc")
    trainer.predict(task, dm, params, writer=writer)
    assert list(out_dir.glob("bw_val_top_1_*.png")), "best/worst writer wrote no top overlay"
    assert list(out_dir.glob("bw_val_bottom_1_*.png"))


def test_flat_train_and_projected_eval(env):
    from heal_swin_tpu.data.data import get_data_module
    from heal_swin_tpu.data.data_config import WoodscapeCommonConfig, WoodscapeFlatConfig
    from heal_swin_tpu.models.swin_flat import SwinTransformerConfig
    from heal_swin_tpu.models.tasks import WoodscapeSegmenterSwinConfig, MODEL_FROM_CONFIG_NAME
    from heal_swin_tpu.train import train_model
    from heal_swin_tpu.training.train_config import PLConfig, SingleModelTrainRun, TrainConfig
    from heal_swin_tpu.training.trainer import Trainer

    data_config = WoodscapeFlatConfig(
        common=WoodscapeCommonConfig(
            version="woodscape_test", batch_size=1, val_batch_size=2, pred_batch_size=2,
            pred_samples=2, train_share=0.75,
        ),
        input_width=48,
        input_height=32,
        nside=NSIDE,
        base_pix=8,
    )
    run_config = SingleModelTrainRun(
        train=TrainConfig(mlflow_expmt="ws_test_flat", seed=1, eval_after_train=False),
        data=data_config,
        model=WoodscapeSegmenterSwinConfig(
            swin_transformer_config=SwinTransformerConfig(
                patch_size=(4, 4), window_size=(2, 2), embed_dim=4, depths=[2, 1],
                num_heads=[2, 2],
            )
        ),
    )
    pl_config = PLConfig(
        max_epochs=1, limit_train_batches=2, limit_val_batches=2, limit_predict_batches=2,
        log_every_n_steps=1, num_sanity_val_steps=0,
    )
    run_id, _ = train_model(run_config, pl_config)
    store = MlflowFileStore(env["mlruns"])
    run = store.get_run(run_id)
    assert run.status == "FINISHED"
    assert run.get_metric_history("val_iou_global")

    # val_on_hp_projected writer: flat predictions scored on the HP grid
    dm, spec = get_data_module(data_config)
    task = MODEL_FROM_CONFIG_NAME[type(run_config.model).__name__](
        run_config.model, spec, data_config
    )
    import jax

    params = jax.jit(task.init_variables)(
        jax.random.PRNGKey(0), np.zeros((1, 32, 48, 3), np.float32)
    )
    trainer = Trainer(pl_config, run=run)
    writer = dm.get_pred_writer(
        "val_on_hp_projected", output_dir=env["mlruns"] / "flat_writer", prefix="t",
        output_resolution=0.5, proj_res=1.0, top_k=1, ranking_metric="iou_ignored",
        sort_dir="asc", run=run,
    )
    trainer.predict(task, dm, params, writer=writer)
    assert run.get_metric_history("t_val_iou_projected_to_hp")
    assert run.get_metric_history("t_val_acc_ignored_projected_to_hp")

    # hp_masked_iou writer: the paper's flat headline metric
    writer = dm.get_pred_writer(
        "hp_masked_iou", output_dir=env["mlruns"] / "flat_writer", prefix="t",
        img_dims=(32, 48), output_resolution=0.5, proj_res=1.0, top_k=1,
        ranking_metric="iou_ignored", sort_dir="asc", run=run,
    )
    trainer.predict(task, dm, params, writer=writer)
    # reference quirk: THIS writer uses the prefix VERBATIM (no trailing
    # underscore added, reference flat_pred_writers.py:273) -> 'tval_...'
    assert run.get_metric_history("tval_hp_masked_iou")


def test_project_on_device_matches_npz_pipeline(env):
    """project_on_device=True: the on-device projected batch must reproduce the
    on-disk npz samples (same floor-to-uint8 grid, same nearest masks)."""
    import dataclasses

    from heal_swin_tpu.data.data import get_data_module

    run_config, _ = _hp_configs()
    dm_npz, spec_npz = get_data_module(run_config.data)
    cfg_dev = dataclasses.replace(run_config.data, project_on_device=True)
    dm_dev, spec_dev = get_data_module(cfg_dev)
    assert spec_dev.dim_in == spec_npz.dim_in

    # same split -> same sample order; compare the first val batch
    imgs_npz, masks_npz = next(iter(dm_npz.val_dataloader()))
    imgs_flat, targets = next(iter(dm_dev.val_dataloader()))
    hp_imgs, hp_masks = dm_dev.device_batch_transform(
        np.asarray(imgs_flat), tuple(np.asarray(t) for t in targets)
    )
    hp_imgs, hp_masks = np.asarray(hp_imgs), np.asarray(hp_masks)
    assert hp_imgs.shape == np.asarray(imgs_npz).shape
    # f32-vs-f64 bilinear can flip a floor on exact boundaries -> allow off-by-one
    assert np.abs(hp_imgs - np.asarray(imgs_npz)).max() <= 1.0
    assert (hp_imgs == np.asarray(imgs_npz)).mean() > 0.99
    np.testing.assert_array_equal(hp_masks, np.asarray(masks_npz))


def test_project_on_device_train_e2e(env):
    """Full training epoch + evaluation with the on-device projection input
    pipeline (eval must derive the model input shape THROUGH the projection
    transform — regression: the paper-scale TPU smoke's eval-after-train crashed
    initializing from the raw flat-image batch)."""
    import dataclasses

    from heal_swin_tpu.evaluate import evaluate
    from heal_swin_tpu.evaluation.evaluate_config import EvaluateConfig
    from heal_swin_tpu.train import train_model
    from heal_swin_tpu.training.train_config import PLConfig, TrainConfig

    run_config, pl_config = _hp_configs()
    run_config = dataclasses.replace(
        run_config, data=dataclasses.replace(run_config.data, project_on_device=True)
    )
    run_id, result = train_model(run_config, pl_config)
    store = MlflowFileStore(str(__import__("os").environ["HEAL_SWIN_MLRUNS"]))
    run = store.get_run(run_id)
    assert run.status == "FINISHED"
    for m in ["train_loss", "val_iou_global", "val_acc"]:
        hist = run.get_metric_history(m)
        assert hist and all(np.isfinite(v) for _, v, _ in hist), m

    eval_config = EvaluateConfig(
        path=run_id, epoch="best", validate=True, predict=False, log_masked_iou=True,
        train_config=TrainConfig(mlflow_expmt="ws_test"),
        data_config=run_config.data,
    )
    evaluate(eval_config, PLConfig(limit_val_batches=1))
    run = store.get_run(run_id)
    assert run.get_metric_history("evaluate_best_val_iou_global")
    assert run.get_metric_history("evaluate_best_val_masked_iou")


def test_overfit_predict_loader_covers_exactly_the_overfit_subset(env):
    """manual_overfit_batches: the predict loader iterates EXACTLY the overfit
    train samples, matched by name (reference hp_datasets.py:297-307
    get_pred_overfit_sampler) — pre-fix it iterated the WHOLE train split
    (pred_samples=-1), making overfit-debug writer metrics wrong and slow."""
    import dataclasses

    from heal_swin_tpu.data.data import get_data_module

    run_config, _ = _hp_configs()
    data = dataclasses.replace(
        run_config.data,
        common=dataclasses.replace(
            run_config.data.common, manual_overfit_batches=2, batch_size=2
        ),
    )
    dm, _ = get_data_module(data)
    assert dm.train_indices is not None and dm.pred_indices is not None
    want = [dm.train_dataset.names[int(i)] for i in dm.train_indices]
    assert len(want) == 4
    got = []
    for batch in dm.predict_dataloader():
        got.extend(batch["names"])
    assert sorted(got) == sorted(want)
