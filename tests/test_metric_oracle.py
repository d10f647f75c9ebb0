"""Segmentation metric semantics pinned against hand-derived torchmetrics-0.3.2
vectors (the reference's metric stack: IoU(num_classes, reduction="none"),
Accuracy(), Accuracy(ignore_index=0) — model_lightning_swin_hp.py:47-53).

torchmetrics 0.3.2 formulas being pinned (classification/iou.py _iou_from_confmat +
StatScores):
  - confusion matrix over ALL pixels; intersection = diag, union = rowsum + colsum
    - diag; score = intersection/union
  - classes with union == 0 (absent from preds AND target) get ``absent_score``
    (default 0.0) and are still INCLUDED in the reduction mean
  - a class present in preds but absent from target (union > 0, tp = 0) scores 0.0
    through the division, NOT through absent_score
  - Accuracy ignore_index drops pixels whose TARGET is the ignored class; an update
    stream with zero kept pixels computes 0/0 -> nan
The expected numbers below are hand-computed from these rules so that a silent
semantic drift (absent handling, ignore interplay, off-by-one) fails the test.
"""

import numpy as np
import pytest

from heal_swin_tpu.evaluation import seg_metrics_np as m

# Case A: 4 classes, preds [0,0,1,2], target [0,1,1,1]
#   confmat rows=target, cols=preds: (0,0)=1, (1,0)=1, (1,1)=1, (1,2)=1
#   tp=[1,1,0,0], rowsum=[1,3,0,0], colsum=[2,1,1,0], union=[2,3,1,0]
#   iou = [1/2, 1/3, 0 (present in preds only), absent]
PREDS_A = np.array([0, 0, 1, 2])
TARGET_A = np.array([0, 1, 1, 1])
IOU_A = [0.5, 1 / 3, 0.0]  # + absent class 3


def test_iou_absent_class_scoring():
    ious = m.iou_functional(PREDS_A, TARGET_A, num_classes=4, reduction="none")
    np.testing.assert_allclose(ious, IOU_A + [0.0], atol=1e-12)
    # absent_score only applies to the truly-absent class 3, not the tp=0 class 2
    ious = m.iou_functional(PREDS_A, TARGET_A, num_classes=4, absent_score=0.77,
                            reduction="none")
    np.testing.assert_allclose(ious, IOU_A + [0.77], atol=1e-12)
    # elementwise_mean includes the absent-class score
    assert m.iou_functional(PREDS_A, TARGET_A, num_classes=4) == pytest.approx(
        sum(IOU_A) / 4
    )


def test_iou_accumulates_confmat_not_means():
    """Two updates must equal one concatenated update (confusion-matrix
    accumulation, not averaging of per-batch scores)."""
    metric = m.IoU(num_classes=4, reduction="none")
    metric.update(PREDS_A[:2], TARGET_A[:2])
    metric.update(PREDS_A[2:], TARGET_A[2:])
    np.testing.assert_allclose(metric.compute(), IOU_A + [0.0], atol=1e-12)


def test_accuracy_ignore_index():
    # plain micro accuracy: 2 of 4 correct
    assert m.accuracy_functional(PREDS_A, TARGET_A) == pytest.approx(0.5)
    # ignore_index=0 keeps target!=0 pixels (preds [0,1,2] vs [1,1,1]): 1/3
    assert m.accuracy_functional(PREDS_A, TARGET_A, ignore_index=0) == pytest.approx(
        1 / 3
    )
    # predicting the ignored class on a kept pixel counts as wrong (not dropped)
    acc = m.accuracy_functional(np.array([0, 0]), np.array([1, 2]), ignore_index=0)
    assert acc == 0.0


def test_accuracy_all_background_is_nan():
    """An all-ignored stream computes 0/0 -> nan (torchmetrics tensor division)."""
    assert np.isnan(m.accuracy_functional(np.array([1, 0]), np.array([0, 0]),
                                          ignore_index=0))
    metric = m.Accuracy(ignore_index=0)
    metric.update(np.array([1, 0]), np.array([0, 0]))
    assert np.isnan(metric.compute())
    # but plain accuracy still scores the background pixels
    assert m.accuracy_functional(np.array([1, 0]), np.array([0, 0])) == pytest.approx(0.5)


def test_device_metrics_match_oracle_vectors():
    """The on-device (jitted) confmat metrics behind train/val logging must obey the
    same torchmetrics-0.3.2 semantics as the numpy oracle."""
    import jax
    import jax.numpy as jnp

    from heal_swin_tpu.evaluation import metrics as dev

    @jax.jit
    def run(preds, target):
        state = dev.seg_state_init(4)
        state = dev.seg_state_update(state, preds[:2], target[:2], 4)
        return dev.seg_state_update(state, preds[2:], target[2:], 4)

    state = run(jnp.asarray(PREDS_A), jnp.asarray(TARGET_A))
    out = dev.seg_state_compute(state, "val_", class_names=["a", "b", "c", "d"])
    assert out["val_acc"] == pytest.approx(0.5)
    assert out["val_acc_ignored"] == pytest.approx(1 / 3)
    assert out["val_iou_global"] == pytest.approx(sum(IOU_A) / 4)
    assert out["val_iou_global_ignored"] == pytest.approx(sum(IOU_A[1:]) / 3)
    for c, expected in enumerate(IOU_A + [0.0]):
        key = f"val_iou_global_class_{c}_{'abcd'[c]}"
        assert out[key] == pytest.approx(expected)

    # all-background epoch under ignore_index -> nan, matching the numpy oracle
    @jax.jit
    def run_bg():
        state = dev.seg_state_init(4)
        return dev.seg_state_update(
            state, jnp.array([1, 0]), jnp.array([0, 0]), 4
        )

    out = dev.seg_state_compute(run_bg(), "val_")
    assert np.isnan(out["val_acc_ignored"])
    assert out["val_acc"] == pytest.approx(0.5)


def test_masked_update_excludes_padded_samples():
    """sample_mask (padded ragged eval batches) must drop padded elements from every
    accumulator — a double-count here would silently shift psum-reduced eval metrics."""
    import jax.numpy as jnp

    from heal_swin_tpu.evaluation import metrics as dev

    state = dev.seg_state_init(4)
    preds = jnp.asarray(np.concatenate([PREDS_A, [3, 3]]))
    target = jnp.asarray(np.concatenate([TARGET_A, [3, 0]]))
    mask = jnp.asarray([True] * 4 + [False] * 2)
    state = dev.seg_state_update(state, preds, target, 4, sample_mask=mask)
    out = dev.seg_state_compute(state, "val_")
    assert out["val_acc"] == pytest.approx(0.5)
    assert out["val_iou_global"] == pytest.approx(sum(IOU_A) / 4)


def test_depth_state_matches_np_oracle_with_inf_and_zero_targets():
    """The jitted streaming depth metrics (evaluation/metrics.py depth_state_*)
    must match the reference-semantics numpy oracle (depth_metrics_np) on data
    containing inf targets (background markers — INCLUDED in iRMSE, the inverse
    is 0) and zero depths (EXCLUDED — infinite inverse).  Pre-fix, the streaming
    iRMSE filtered on finite depths and dropped every inf-target pixel."""
    import jax.numpy as jnp

    from heal_swin_tpu.evaluation import depth_metrics_np as dm
    from heal_swin_tpu.evaluation.metrics import (
        depth_state_compute,
        depth_state_init,
        depth_state_update,
    )

    rng = np.random.default_rng(0)
    B, N = 2, 512
    pred = rng.uniform(1.0, 60.0, size=(B, N)).astype(np.float32)
    target = rng.uniform(1.0, 60.0, size=(B, N)).astype(np.float32)
    target[0, :64] = np.inf  # background markers (hp depth datasets use inf)
    target[1, 10:20] = 0.0  # zero depths drop out of iRMSE/SILog
    pred[0, 100:104] = 0.0

    state = depth_state_init()
    state = depth_state_update(state, jnp.asarray(pred), jnp.asarray(target),
                               dataset_mean=25.0)
    out = depth_state_compute(state, "val_")

    pred4 = pred[:, None, :]  # oracle layout: (B, channel, ...)
    oracle = {
        "val_mse": dm.DepthMSE(),
        "val_iRMSE": dm.DepthiRMSE(),
        "val_SILogE": dm.ScaleInvariantLogError(),
        "val_RelAE": dm.DepthRelAE(total_mean=25.0),
        "val_RelSE": dm.DepthRelSE(total_mean=25.0),
    }
    for mtr in oracle.values():
        mtr.update(pred4, target)
    for k, mtr in oracle.items():
        assert out[k] == pytest.approx(mtr.compute(), rel=1e-5), k
