"""Depth estimation end-to-end: Chamfer kernel correctness, depth metric semantics vs
the reference formulas, and full train+eval on a fabricated SynWoodScape with the
chamfer writer (paper metric chamfer_distance_full_res_hp_masked)."""

import numpy as np
import pytest

from heal_swin_tpu.data.synthetic_woodscape import generate
from heal_swin_tpu.tracking.mlflow_store import MlflowFileStore

NSIDE = 16


def test_chamfer_kernel_matches_bruteforce():
    from heal_swin_tpu.ops.chamfer import chamfer_distance

    rng = np.random.default_rng(0)
    p = rng.normal(size=(137, 3)).astype(np.float32)
    q = rng.normal(size=(211, 3)).astype(np.float32)
    d = np.sum((p[:, None] - q[None]) ** 2, axis=-1)
    expected = d.min(1).mean() + d.min(0).mean()
    got = chamfer_distance(p, q)
    assert abs(got - expected) < 1e-4 * max(1, abs(expected))
    # identical clouds -> 0
    assert chamfer_distance(p, p) < 1e-5
    # empty -> nan
    assert np.isnan(chamfer_distance(np.zeros((0, 3)), q))


def test_chamfer_pallas_matches_jnp_and_bruteforce():
    """The TPU Pallas chamfer (VPU distance blocks, O(N+M) memory) must agree
    with the jnp tiled-matmul path and an f64 brute-force oracle, including
    masking/bucket padding and ragged side sizes."""
    from heal_swin_tpu.ops import chamfer as ch

    rng = np.random.default_rng(3)
    for n, m in [(1500, 3000), (2048, 2048), (700, 5000)]:
        p = rng.normal(size=(n, 3)).astype(np.float32) * 10
        q = rng.normal(size=(m, 3)).astype(np.float32) * 10 + 1.0
        bp, bq = ch._bucket(n), ch._bucket(m)
        assert bp % ch._PT == 0 and bp % ch._QT == 0  # either side of the kernel
        pp = np.zeros((bp, 3), np.float32)
        pp[:n] = p
        qp = np.zeros((bq, 3), np.float32)
        qp[:m] = q
        pv, qv = np.arange(bp) < n, np.arange(bq) < m
        a = float(ch.chamfer_distance_masked(pp, qp, pv, qv))
        b = float(ch.chamfer_distance_masked_pallas(pp, qp, pv, qv, interpret=True))
        d2 = ((p[:, None].astype(np.float64) - q[None].astype(np.float64)) ** 2).sum(-1)
        ref = d2.min(1).mean() + d2.min(0).mean()
        assert abs(a - b) < 1e-4 * max(1.0, abs(ref))
        assert abs(b - ref) / ref < 1e-5


def test_chamfer_bucket_properties():
    from heal_swin_tpu.ops.chamfer import _PT, _QT, _bucket

    prev = 0
    for n in [1, 512, 2049, 3000, 3073, 100_000, 1_240_000]:
        b = _bucket(n)
        assert b >= n and b % _PT == 0 and b % _QT == 0
        assert b <= max(2048, int(n * 1.5) + _QT)  # ~1.5x max padded work
        assert b >= prev
        prev = b


def test_depth_metrics_reference_semantics():
    from heal_swin_tpu.evaluation import depth_metrics_np as dm

    rng = np.random.default_rng(1)
    pred = rng.uniform(1, 50, (2, 1, 10, 10))
    target = rng.uniform(1, 50, (2, 10, 10))
    target[0, 0, 0] = np.inf  # excluded

    m = dm.DepthMSE()
    m.update(pred, target)
    valid = np.isfinite(target)
    expected = np.mean((pred[:, 0][valid] - target[valid]) ** 2)
    assert abs(m.compute() - expected) < 1e-9

    si = dm.ScaleInvariantLogError()
    si.update(pred, target)
    d = np.log(target[valid]) - np.log(pred[:, 0][valid])
    expected = np.mean(d**2) - np.mean(d) ** 2
    assert abs(si.compute() - expected) < 1e-9

    ir = dm.DepthiRMSE()
    ir.update(pred, target)
    # reference quirk: inversion happens FIRST, so inf targets become 0 (1/km) and are
    # *included* (custom_metrics.py:185-196)
    inv_p, inv_t = 1000 / pred[:, 0], 1000 / target
    iv = np.isfinite(inv_p) & np.isfinite(inv_t)
    assert abs(ir.compute() - np.sqrt(np.mean((inv_p[iv] - inv_t[iv]) ** 2))) < 1e-6

    rel = dm.DepthRelSE(total_mean=25.0)
    rel.update(pred, target)
    expected = np.sum((pred[:, 0][valid] - target[valid]) ** 2) / np.sum(
        (25.0 - target[valid]) ** 2
    )
    assert abs(rel.compute() - expected) < 1e-9


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("syn")
    data_root = root / "datasets"
    generate(data_root, version="synwoodscape", n_per_cam=3, W=96, H=80, with_depth=True)
    return {"data_root": data_root, "mlruns": root / "mlruns"}


@pytest.fixture(autouse=True)
def _paths(env, monkeypatch):
    monkeypatch.setenv("HEAL_SWIN_DATA_ROOT", str(env["data_root"]))
    monkeypatch.setenv("HEAL_SWIN_MLRUNS", str(env["mlruns"]))


@pytest.mark.slow
def test_depth_hp_train_and_chamfer_eval(env):
    from heal_swin_tpu.data.data_config import (
        WoodscapeCommonConfig,
        WoodscapeDepthCommonConfig,
        WoodscapeHPDepthConfig,
    )
    from heal_swin_tpu.evaluate import evaluate
    from heal_swin_tpu.evaluation.evaluate_config import EvaluateConfig
    from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig
    from heal_swin_tpu.models.tasks import CommonDepthConfig, WoodscapeDepthSwinHPConfig
    from heal_swin_tpu.train import train_model
    from heal_swin_tpu.training.train_config import PLConfig, SingleModelTrainRun, TrainConfig

    data_config = WoodscapeHPDepthConfig(
        common=WoodscapeCommonConfig(
            version="synwoodscape", batch_size=1, val_batch_size=2, pred_batch_size=2,
            pred_samples=2, train_share=0.75,
        ),
        common_depth=WoodscapeDepthCommonConfig(
            mask_background=True, data_transform="log", normalize_data="standardize",
        ),
        input_nside=NSIDE,
        input_base_pix=8,
    )
    run_config = SingleModelTrainRun(
        train=TrainConfig(
            mlflow_expmt="syn_depth", seed=1, eval_after_train=False, ckpt_metric="val_mse",
            ckpt_mode="min",
        ),
        data=data_config,
        model=WoodscapeDepthSwinHPConfig(
            swin_hp_transformer_config=SwinHPTransformerConfig(
                patch_size=4, window_size=16, shift_size=8, shift_strategy="ring_shift",
                embed_dim=4, depths=[2, 1], num_heads=[2, 2],
            ),
            common_depth_config=CommonDepthConfig(loss="l2"),
        ),
    )
    pl_config = PLConfig(
        max_epochs=1, limit_train_batches=2, limit_val_batches=2, limit_predict_batches=1,
        log_every_n_steps=1, num_sanity_val_steps=0,
    )
    run_id, _ = train_model(run_config, pl_config)
    store = MlflowFileStore(env["mlruns"])
    run = store.get_run(run_id)
    assert run.status == "FINISHED"
    for metric in ["train_mse", "val_mse", "val_SILogE", "val_iRMSE", "val_RelAE", "val_RelSE"]:
        hist = run.get_metric_history(metric)
        assert hist, f"{metric} missing"

    eval_config = EvaluateConfig(
        path=run_id,
        epoch="best",
        pred_writer="chamfer_distance",
        validate=False,
        predict=True,
        top_k=1,
        train_config=TrainConfig(mlflow_expmt="syn_depth"),
        data_config=data_config,
    )
    evaluate(eval_config, PLConfig(limit_predict_batches=1))
    for metric in [
        "evaluate_best_chamfer_distance",
        "evaluate_best_chamfer_distance_full_res",
        "evaluate_best_chamfer_distance_full_res_hp_masked",
        "evaluate_best_chamfer_distance_small_res_hp_masked",
    ]:
        hist = run.get_metric_history(metric)
        assert hist, f"{metric} missing"
        assert np.isfinite(hist[-1][1])

    # best/worst point-cloud artifacts (reference hp_depth_pred_writers.py:958-1225):
    # top_k=1 -> per group: 3 plane scatters + 3 gt-vs-pred panel figures
    art = run.artifact_dir
    for group in ["top", "bottom"]:
        scatters = list(art.glob(f"*chamfer_distance_{group}_1_*_plane.png"))
        panels = list(art.glob(f"*chamfer_distance_{group}_1_*_plane_gt_vs_pred.png"))
        assert len(scatters) == 3, (group, sorted(p.name for p in art.iterdir()))
        assert len(panels) == 3, group


def test_depth_hp_val_on_back_projected(env):
    from heal_swin_tpu.data.data import get_data_module
    from heal_swin_tpu.data.data_config import (
        WoodscapeCommonConfig,
        WoodscapeDepthCommonConfig,
        WoodscapeHPDepthConfig,
    )
    from heal_swin_tpu.models.swin_hp import SwinHPTransformerConfig
    from heal_swin_tpu.models.tasks import (
        CommonDepthConfig,
        WoodscapeDepthSwinHPConfig,
        MODEL_FROM_CONFIG_NAME,
    )
    from heal_swin_tpu.training.train_config import PLConfig
    from heal_swin_tpu.training.trainer import Trainer
    from heal_swin_tpu.tracking.mlflow_store import MlflowFileStore

    data_config = WoodscapeHPDepthConfig(
        common=WoodscapeCommonConfig(
            version="synwoodscape", batch_size=1, val_batch_size=2, pred_batch_size=2,
            pred_samples=2, train_share=0.75,
        ),
        common_depth=WoodscapeDepthCommonConfig(),
        input_nside=NSIDE,
    )
    model_config = WoodscapeDepthSwinHPConfig(
        swin_hp_transformer_config=SwinHPTransformerConfig(
            patch_size=4, window_size=16, shift_size=8, embed_dim=4, depths=[2, 1],
            num_heads=[2, 2],
        ),
        common_depth_config=CommonDepthConfig(),
    )
    dm, spec = get_data_module(data_config)
    task = MODEL_FROM_CONFIG_NAME[type(model_config).__name__](model_config, spec, data_config)
    import jax

    params = jax.jit(task.init_variables)(
        jax.random.PRNGKey(0), np.zeros((1, spec.dim_in, 3), np.float32)
    )
    store = MlflowFileStore(env["mlruns"])
    run = store.create_run("syn_depth_writer")
    trainer = Trainer(PLConfig(limit_predict_batches=1), run=run)
    writer = dm.get_pred_writer(
        "val_on_back_projected", output_dir=None, prefix="t", proj_res=0.5,
        output_resolution=0.5, top_k=1, ranking_metric="mse", sort_dir="asc", run=run,
    )
    trainer.predict(task, dm, params, writer=writer)
    for metric in ["t_val_mse_back_projected", "t_val_SILogE_back_projected",
                   "t_val_iRMSE_back_projected"]:
        assert run.get_metric_history(metric), f"{metric} missing"


@pytest.mark.slow
def test_depth_flat_chamfer_writer_artifacts(env, tmp_path):
    """Flat chamfer writer: 4 cumulative metrics (pred cut to the HP footprint for the
    hp_masked variants, reference flat_depth_pred_writers.py:576-625) + best/worst
    point-cloud artifacts (reference :658-905)."""
    import jax

    from heal_swin_tpu.data.data import get_data_module
    from heal_swin_tpu.data.data_config import (
        WoodscapeCommonConfig,
        WoodscapeDepthCommonConfig,
        WoodscapeDepthFlatConfig,
    )
    from heal_swin_tpu.models.swin_flat import SwinTransformerConfig
    from heal_swin_tpu.models.tasks import (
        CommonDepthConfig,
        WoodscapeDepthSwinConfig,
        MODEL_FROM_CONFIG_NAME,
    )
    from heal_swin_tpu.training.train_config import PLConfig
    from heal_swin_tpu.training.trainer import Trainer

    data_config = WoodscapeDepthFlatConfig(
        common=WoodscapeCommonConfig(
            version="synwoodscape", batch_size=1, val_batch_size=2, pred_batch_size=2,
            pred_samples=2, train_share=0.75,
        ),
        common_depth=WoodscapeDepthCommonConfig(mask_background=True),
        input_width=96, input_height=80, nside=NSIDE,
    )
    model_config = WoodscapeDepthSwinConfig(
        swin_transformer_config=SwinTransformerConfig(
            patch_size=(4, 4), window_size=(2, 2), embed_dim=4, depths=[2, 1],
            num_heads=[2, 2],
        ),
        common_depth_config=CommonDepthConfig(),
    )
    dm, spec = get_data_module(data_config)
    task = MODEL_FROM_CONFIG_NAME[type(model_config).__name__](model_config, spec, data_config)
    params = jax.jit(task.init_variables)(
        jax.random.PRNGKey(0), np.zeros((1, 80, 96, 3), np.float32)
    )
    store = MlflowFileStore(env["mlruns"])
    run = store.create_run("syn_depth_flat")
    trainer = Trainer(PLConfig(limit_predict_batches=1), run=run)
    out_dir = tmp_path / "preds"
    out_dir.mkdir()
    writer = dm.get_pred_writer(
        "chamfer_distance", output_dir=str(out_dir), prefix="t", top_k=1,
        ranking_metric="chamfer_distance", sort_dir="desc", run=run,
    )
    trainer.predict(task, dm, params, writer=writer)
    for metric in ["t_chamfer_distance", "t_chamfer_distance_full_res",
                   "t_chamfer_distance_full_res_hp_masked",
                   "t_chamfer_distance_small_res_hp_masked"]:
        hist = run.get_metric_history(metric)
        assert hist, f"{metric} missing"
        assert np.isfinite(hist[-1][1])
    for group in ["top", "bottom"]:
        scatters = list(out_dir.glob(f"*chamfer_distance_{group}_1_*_plane.png"))
        panels = list(out_dir.glob(f"*chamfer_distance_{group}_1_*_plane_gt_vs_pred.png"))
        assert len(scatters) == 3, (group, sorted(p.name for p in out_dir.iterdir()))
        assert len(panels) == 3, group


def test_depth_project_on_device_matches_npz(env):
    """Depth project_on_device: on-device projection + mask pipeline must match the
    npz-backed dataset (images within f32-vs-f64 bilinear tolerance, masks matching
    the full 0->inf/transform/normalize pipeline)."""
    import dataclasses

    from heal_swin_tpu.data.data import get_data_module
    from heal_swin_tpu.data.data_config import (
        WoodscapeCommonConfig,
        WoodscapeDepthCommonConfig,
        WoodscapeHPDepthConfig,
    )

    data_config = WoodscapeHPDepthConfig(
        common=WoodscapeCommonConfig(
            version="synwoodscape", batch_size=1, val_batch_size=2, pred_batch_size=2,
            pred_samples=2, train_share=0.75,
        ),
        common_depth=WoodscapeDepthCommonConfig(
            mask_background=True, data_transform="log", normalize_data="standardize",
        ),
        input_nside=NSIDE,
        input_base_pix=8,
    )
    dm_npz, spec_npz = get_data_module(data_config)
    dm_dev, spec_dev = get_data_module(
        dataclasses.replace(data_config, project_on_device=True)
    )
    assert spec_dev.dim_in == spec_npz.dim_in

    imgs_npz, masks_npz = next(iter(dm_npz.val_dataloader()))
    imgs_flat, targets = next(iter(dm_dev.val_dataloader()))
    hp_imgs, hp_masks = dm_dev.device_batch_transform(
        np.asarray(imgs_flat), tuple(np.asarray(t) for t in targets)
    )
    hp_imgs, hp_masks = np.asarray(hp_imgs), np.asarray(hp_masks)
    np.testing.assert_allclose(hp_imgs, np.asarray(imgs_npz), rtol=1e-4, atol=1e-2)
    npz_masks = np.asarray(masks_npz)
    both_finite = np.isfinite(hp_masks) & np.isfinite(npz_masks)
    assert (np.isfinite(hp_masks) == np.isfinite(npz_masks)).all()
    np.testing.assert_allclose(hp_masks[both_finite], npz_masks[both_finite],
                               rtol=1e-5, atol=1e-5)


def test_chamfer_pallas_qchunk_split(monkeypatch):
    """The wrapper's static q-side chunking (chamfer.py _QCHUNK, used above 2^21
    points at paper full_res scale) must reproduce the single-chunk result: the
    per-chunk row-min folds and the col-min concatenation are exact.  Forced
    here by shrinking _QCHUNK to one _QT tile (shapes distinct from the other
    tests so the jit cache cannot reuse a single-chunk trace)."""
    from heal_swin_tpu.ops import chamfer as ch

    rng = np.random.default_rng(9)
    n = m = 4000  # bucket 4096 -> 4 chunks of _QT=1024
    p = rng.normal(size=(n, 3)).astype(np.float32) * 5
    q = rng.normal(size=(m, 3)).astype(np.float32) * 5 - 2.0
    bp, bq = ch._bucket(n), ch._bucket(m)
    assert bq > ch._QT
    pp = np.zeros((bp, 3), np.float32)
    pp[:n] = p
    qp = np.zeros((bq, 3), np.float32)
    qp[:m] = q
    pv, qv = np.arange(bp) < n, np.arange(bq) < m

    monkeypatch.setattr(ch, "_QCHUNK", ch._QT)
    # _QCHUNK is read at trace time: drop any cached single-chunk trace so the
    # monkeypatched value is guaranteed to take effect even if another test has
    # already traced these bucket shapes (ADVICE r3).
    ch.chamfer_distance_masked_pallas.clear_cache()
    chunked = float(ch.chamfer_distance_masked_pallas(pp, qp, pv, qv, interpret=True))
    ref = float(ch.chamfer_distance_masked(pp, qp, pv, qv))
    assert abs(chunked - ref) < 1e-4 * max(1.0, abs(ref))
