"""Prediction writers.

This module holds the writer registry plumbing; the full WoodScape writer suite
(back-projection, HP-masked IoU, best/worst, Chamfer) mirrors reference
``heal_swin/evaluation/*_pred_writers.py`` and lives in ``woodscape_writers.py``
(built on the projection pipeline).  Writers follow the reference's
BasePredictionWriter protocol: ``write_on_batch_end(preds, batch, batch_idx)`` +
``on_predict_epoch_end()``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from heal_swin_tpu.evaluation import metrics as M


class SegBasePredictionWriter:
    """Minimal base writer: saves per-sample prediction overlays with per-sample IoU in
    the filename (reference flat_pred_writers.py:20-87 / hp_pred_writers.py:20-107)."""

    def __init__(self, dm, output_dir=None, prefix: str = "", num_classes: int = 2,
                 target_key: str = "hp_masks", pred_key: str = "hp_imgs", run=None, **kw):
        self.dm = dm
        self.output_dir = Path(output_dir) / "predictions" if output_dir else None
        if self.output_dir:
            self.output_dir.mkdir(parents=True, exist_ok=True)
        self.prefix = prefix
        self.num_classes = num_classes
        self.target_key = target_key
        self.run = run
        self._acc_correct = 0
        self._acc_total = 0

    def _sample_iou(self, pred, target):
        cm = np.zeros((self.num_classes, self.num_classes))
        np.add.at(cm, (target.reshape(-1), pred.reshape(-1)), 1)
        tp = np.diag(cm)
        denom = cm.sum(0) + cm.sum(1) - tp
        iou = np.where(denom > 0, tp / np.maximum(denom, 1), 0.0)
        return float(iou.mean())

    def write_on_batch_end(self, preds, batch, batch_idx):
        targets = np.asarray(batch[self.target_key])
        names = batch.get("names", [f"b{batch_idx}_{i}" for i in range(len(preds))])
        for i, (p, t) in enumerate(zip(preds, targets)):
            self._acc_correct += int((p == t).sum())
            self._acc_total += int(t.size)
            if self.output_dir is not None:
                iou = self._sample_iou(p.astype(int), t.astype(int))
                np.savez_compressed(
                    self.output_dir / f"{self.prefix}{names[i]}_iou={iou:.4f}.npz",
                    pred=p.astype(np.uint8),
                )

    def on_predict_epoch_end(self):
        if self.run is not None and self._acc_total:
            self.run.log_metric(f"{self.prefix}pred_acc", self._acc_correct / self._acc_total)


def get_synthetic_writer(writer_name: Optional[str], dm, **kwargs):
    """Writer registry for the synthetic datamodules (mirrors the reference's
    per-datamodule get_pred_writer registries, hp_datasets.py:390-396)."""
    target_key = "hp_masks" if hasattr(dm, "nside") else "s2_masks"
    names = {None: SegBasePredictionWriter, "base_writer": SegBasePredictionWriter}
    cls = names.get(writer_name)
    if cls is None:
        raise ValueError(f"unknown writer for synthetic data: {writer_name}")
    return cls(dm, num_classes=dm.get_classes(), target_key=target_key, **kwargs)
