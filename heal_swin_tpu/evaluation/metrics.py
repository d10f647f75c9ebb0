"""Segmentation / regression metrics as pure-JAX accumulating states.

Replicates torchmetrics 0.3.2 semantics used by the reference (SURVEY.md §7.3 #4):
- ``IoU(num_classes, reduction="none")``: confusion-matrix IoU per class;
  classes absent from both target and prediction get ``absent_score = 0.0``.
- ``Accuracy()``: micro accuracy; ``Accuracy(ignore_index=0)``: accuracy over
  pixels with target != 0.
- iou_global = mean over all classes; iou_global_ignored = mean over classes 1..C-1
  (reference model_lightning_swin_hp.py:74-102).

States are plain pytrees of jnp arrays so they accumulate on device inside the jitted
step and cross-device reduction is a jnp sum over per-device states (cleaner than the
reference's single-GPU-eval restriction, SURVEY.md §5.8).

Depth metric states follow reference evaluation/custom_metrics.py with inf/nan
exclusion (:12-22): DepthMSE :62-99, RelSE/RelAE vs dataset-mean predictor :102-167,
iRMSE (1/km) :170-205, ScaleInvariantLogError (KITTI SILog) :429-468.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Segmentation
# ---------------------------------------------------------------------------


def seg_state_init(num_classes: int) -> Dict[str, jnp.ndarray]:
    return {
        "confmat": jnp.zeros((num_classes, num_classes), jnp.float64 if False else jnp.float32),
        "correct": jnp.zeros((), jnp.float32),
        "total": jnp.zeros((), jnp.float32),
        "correct_ignored": jnp.zeros((), jnp.float32),
        "total_ignored": jnp.zeros((), jnp.float32),
    }


def seg_state_update(state, preds, target, num_classes: int, sample_mask=None):
    """preds/target: int arrays of identical shape; sample_mask: optional bool array
    marking valid elements (for padded batches)."""
    if sample_mask is None:
        valid = jnp.ones(target.shape, dtype=bool)
    else:
        m = jnp.reshape(
            sample_mask, sample_mask.shape + (1,) * (target.ndim - sample_mask.ndim)
        )
        valid = jnp.broadcast_to(m, target.shape)
    preds = preds.reshape(-1).astype(jnp.int32)
    target = target.reshape(-1).astype(jnp.int32)
    valid = valid.reshape(-1)
    # bincount-style confusion matrix via scatter-add; invalid entries land in a
    # scratch row we never read? cheaper: weight 0.
    idx = target * num_classes + preds
    cm = jnp.zeros((num_classes * num_classes,), jnp.float32)
    cm = cm.at[idx].add(jnp.where(valid, 1.0, 0.0))
    cm = cm.reshape(num_classes, num_classes)

    correct = jnp.sum(jnp.where(valid & (preds == target), 1.0, 0.0))
    total = jnp.sum(jnp.where(valid, 1.0, 0.0))
    ign = valid & (target != 0)
    correct_ign = jnp.sum(jnp.where(ign & (preds == target), 1.0, 0.0))
    total_ign = jnp.sum(jnp.where(ign, 1.0, 0.0))
    return {
        "confmat": state["confmat"] + cm,
        "correct": state["correct"] + correct,
        "total": state["total"] + total,
        "correct_ignored": state["correct_ignored"] + correct_ign,
        "total_ignored": state["total_ignored"] + total_ign,
    }


def iou_from_confmat(confmat, absent_score: float = 0.0):
    """Per-class IoU with torchmetrics absent_score semantics."""
    tp = jnp.diagonal(confmat)
    fp = jnp.sum(confmat, axis=0) - tp
    fn = jnp.sum(confmat, axis=1) - tp
    denom = tp + fp + fn
    return jnp.where(denom > 0, tp / jnp.maximum(denom, 1.0), absent_score)


def seg_state_merge_confmat(state, cm):
    """Merge a precomputed (F, F) confusion matrix (target rows, pred cols) into the
    state — used by the fused final-head kernel (ops/final_head.py), which emits the
    step's confmat directly instead of logits.  Every scalar accumulator is derivable
    from the confmat: correct = trace, total = sum, the *_ignored variants drop
    target class 0."""
    cm = cm.astype(jnp.float32)
    correct = jnp.trace(cm)
    total = jnp.sum(cm)
    row0 = jnp.sum(cm[0])
    return {
        "confmat": state["confmat"] + cm,
        "correct": state["correct"] + correct,
        "total": state["total"] + total,
        "correct_ignored": state["correct_ignored"] + correct - cm[0, 0],
        "total_ignored": state["total_ignored"] + total - row0,
    }


def seg_state_compute(state, prefix: str, class_names=None) -> Dict[str, float]:
    """Epoch metrics with the reference's names (model_lightning_swin_hp.py:74-102)."""
    iou = np.asarray(iou_from_confmat(state["confmat"]))

    def _acc(correct, total):
        # torchmetrics 0.3.2 semantics: correct/total = 0/0 -> nan (e.g. an epoch of
        # all-background pixels under ignore_index)
        total = float(total)
        return float(correct) / total if total > 0 else float("nan")

    out = {
        f"{prefix}acc": _acc(state["correct"], state["total"]),
        f"{prefix}acc_ignored": _acc(state["correct_ignored"], state["total_ignored"]),
        f"{prefix}iou_global": float(iou.mean()),
        f"{prefix}iou_global_ignored": float(iou[1:].mean()) if len(iou) > 1 else float(iou.mean()),
    }
    if class_names is not None:
        for c, val in enumerate(iou):
            name = class_names[c] if c < len(class_names) else str(c)
            out[f"{prefix}iou_global_class_{c}_{name}"] = float(val)
    return out


# ---------------------------------------------------------------------------
# Depth (streaming sums; targets with inf/nan excluded)
# ---------------------------------------------------------------------------


def depth_state_init() -> Dict[str, jnp.ndarray]:
    z = jnp.zeros((), jnp.float32)
    return {
        "sq_err": z, "abs_err": z, "count": z,
        "sq_rel_ref": z, "abs_rel_ref": z,      # vs dataset-mean predictor
        "inv_sq_err": z, "inv_count": z,         # (1/km) errors for iRMSE
        "silog_d": z, "silog_d2": z, "silog_count": z,
        "std_sum": z, "std_count": z,            # uncertainty head: mean exp(0.5*logvar)
    }


def depth_state_update(state, pred, target, dataset_mean: Optional[float] = None,
                       log_var=None):
    """pred/target: float arrays, same shape (mean-depth channel already selected);
    log_var: optional same-shape logvar channel (uncertainty head, use_logvar)."""
    pred = pred.reshape(-1).astype(jnp.float32)
    target = target.reshape(-1).astype(jnp.float32)
    valid = jnp.isfinite(target) & jnp.isfinite(pred)
    t = jnp.where(valid, target, 1.0)
    p = jnp.where(valid, pred, 1.0)
    n = jnp.sum(valid.astype(jnp.float32))
    d = p - t
    sq = jnp.sum(jnp.where(valid, d * d, 0.0))
    ab = jnp.sum(jnp.where(valid, jnp.abs(d), 0.0))

    out = dict(state)
    out["sq_err"] = state["sq_err"] + sq
    out["abs_err"] = state["abs_err"] + ab
    out["count"] = state["count"] + n
    if dataset_mean is not None:
        dm = dataset_mean - t
        out["sq_rel_ref"] = state["sq_rel_ref"] + jnp.sum(jnp.where(valid, dm * dm, 0.0))
        out["abs_rel_ref"] = state["abs_rel_ref"] + jnp.sum(jnp.where(valid, jnp.abs(dm), 0.0))
    # iRMSE (reference custom_metrics.py:170-205): invert to 1/km FIRST on the RAW
    # values, then keep pairs whose inverses are finite — inf depths (background
    # markers) invert to 0 and ARE counted, zero depths invert to inf and drop out.
    # (Filtering on finite DEPTHS instead would exclude the inf-target pixels the
    # reference includes; pinned against depth_metrics_np.DepthiRMSE.)
    inv_p = 1.0 / (0.001 * pred)
    inv_t = 1.0 / (0.001 * target)
    inv_valid = jnp.isfinite(inv_p) & jnp.isfinite(inv_t)
    inv_d = jnp.where(inv_valid, inv_p, 0.0) - jnp.where(inv_valid, inv_t, 0.0)
    out["inv_sq_err"] = state["inv_sq_err"] + jnp.sum(jnp.where(inv_valid, inv_d * inv_d, 0.0))
    out["inv_count"] = state.get("inv_count", 0.0) + jnp.sum(inv_valid.astype(jnp.float32))
    # SILog (reference :429-468): d = log(target) - log(pred) over positive pairs;
    # compute = mean(d^2) - mean(d)^2 (no sqrt, no x100 in the reference)
    log_valid = valid & (p > 0) & (t > 0)
    ld = jnp.log(jnp.where(log_valid, t, 1.0)) - jnp.log(jnp.where(log_valid, p, 1.0))
    out["silog_d"] = state["silog_d"] + jnp.sum(jnp.where(log_valid, ld, 0.0))
    out["silog_d2"] = state["silog_d2"] + jnp.sum(jnp.where(log_valid, ld * ld, 0.0))
    out["silog_count"] = state.get("silog_count", 0.0) + jnp.sum(log_valid.astype(jnp.float32))
    if log_var is not None:
        lv = log_var.reshape(-1).astype(jnp.float32)
        lv_valid = valid & jnp.isfinite(lv)
        out["std_sum"] = state["std_sum"] + jnp.sum(
            jnp.where(lv_valid, jnp.exp(0.5 * lv), 0.0)
        )
        out["std_count"] = state["std_count"] + jnp.sum(lv_valid.astype(jnp.float32))
    return out


def depth_state_compute(state, prefix: str) -> Dict[str, float]:
    n = float(np.maximum(np.asarray(state["count"]), 1.0))
    n_inv = float(np.maximum(np.asarray(state["inv_count"]), 1.0))
    n_log = float(np.maximum(np.asarray(state["silog_count"]), 1.0))
    out = {
        f"{prefix}mse": float(state["sq_err"]) / n,
        f"{prefix}mae": float(state["abs_err"]) / n,
        f"{prefix}iRMSE": float(np.sqrt(float(state["inv_sq_err"]) / n_inv)),
        f"{prefix}SILogE": float(state["silog_d2"]) / n_log
        - (float(state["silog_d"]) / n_log) ** 2,
    }
    if float(state["sq_rel_ref"]) > 0:
        out[f"{prefix}RelSE"] = float(state["sq_err"]) / float(state["sq_rel_ref"])
        out[f"{prefix}RelAE"] = float(state["abs_err"]) / float(state["abs_rel_ref"])
    if float(state["std_count"]) > 0:
        out[f"{prefix}mean_std"] = float(state["std_sum"]) / float(state["std_count"])
    return out
