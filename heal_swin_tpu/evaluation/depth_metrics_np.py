"""Numpy depth metric accumulators with the reference's exact semantics
(heal_swin/evaluation/custom_metrics.py), for the CPU-side prediction writers.

All metrics take preds of shape (N, C, ...) (channel 0 = mean depth) and targets of
shape (N, ...), and exclude non-finite pairs (get_non_inf_non_nan_idxs, reference
:12-22)."""

from __future__ import annotations

import numpy as np

from heal_swin_tpu.ops.chamfer import chamfer_distance as _chamfer
from heal_swin_tpu.utils import depth_utils


def _valid(a, b):
    return np.isfinite(a) & np.isfinite(b)


class DepthMSE:
    """reference custom_metrics.py:62-99."""

    def __init__(self):
        self.sum_se = 0.0
        self.n = 0.0

    def update(self, preds, target):
        means = np.asarray(preds)[:, 0, ...].squeeze()
        target = np.asarray(target).squeeze()
        assert means.shape == target.shape
        idxs = _valid(means, target)
        self.sum_se += float(np.sum((means[idxs] - target[idxs]) ** 2))
        self.n += float(idxs.sum())
        return self.sum_se / max(self.n, 1)

    __call__ = update

    def compute(self):
        return self.sum_se / max(self.n, 1)

    def reset(self):
        self.sum_se = 0.0
        self.n = 0.0


class DepthRelSE:
    """MSE relative to the dataset-mean predictor (reference :102-134)."""

    def __init__(self, total_mean):
        self.total_mean = total_mean
        self.sum_pred = 0.0
        self.sum_mean = 0.0

    def update(self, preds, target):
        means = np.asarray(preds)[:, 0, ...]
        target = np.asarray(target)
        idxs = _valid(means, np.broadcast_to(target, means.shape))
        t = np.broadcast_to(target, means.shape)[idxs]
        self.sum_pred += float(np.sum((means[idxs] - t) ** 2))
        self.sum_mean += float(np.sum((self.total_mean - t) ** 2))

    def compute(self):
        return self.sum_pred / max(self.sum_mean, 1e-12)


class DepthRelAE:
    """reference :137-167."""

    def __init__(self, total_mean):
        self.total_mean = total_mean
        self.sum_pred = 0.0
        self.sum_mean = 0.0

    def update(self, preds, target):
        means = np.asarray(preds)[:, 0, ...]
        target = np.asarray(target)
        idxs = _valid(means, np.broadcast_to(target, means.shape))
        t = np.broadcast_to(target, means.shape)[idxs]
        self.sum_pred += float(np.sum(np.abs(means[idxs] - t)))
        self.sum_mean += float(np.sum(np.abs(self.total_mean - t)))

    def compute(self):
        return self.sum_pred / max(self.sum_mean, 1e-12)


class DepthiRMSE:
    """Inverse-depth RMSE in 1/km (reference :170-205)."""

    def __init__(self):
        self.sum_inv_se = 0.0
        self.n = 0.0

    def update(self, preds, target):
        means = np.asarray(preds, dtype=np.float64)[:, 0, ...]
        target = np.asarray(target, dtype=np.float64)
        with np.errstate(divide="ignore"):
            inv_p = 1.0 / (0.001 * means)
            inv_t = 1.0 / (0.001 * np.broadcast_to(target, means.shape))
        idxs = _valid(inv_p, inv_t)
        self.sum_inv_se += float(np.sum((inv_p[idxs] - inv_t[idxs]) ** 2))
        self.n += float(idxs.sum())

    def compute(self):
        return float(np.sqrt(self.sum_inv_se / max(self.n, 1)))


class ScaleInvariantLogError:
    """KITTI SILog without sqrt (reference :429-468)."""

    def __init__(self):
        self.sum_d = 0.0
        self.sum_d2 = 0.0
        self.n = 0.0

    def update(self, preds, target):
        p = np.asarray(preds, dtype=np.float64)[:, 0, ...]
        t = np.broadcast_to(np.asarray(target, dtype=np.float64), p.shape)
        idxs = _valid(p, t) & (p > 0) & (t > 0)
        d = np.log(t[idxs]) - np.log(p[idxs])
        self.sum_d += float(d.sum())
        self.sum_d2 += float((d**2).sum())
        self.n += float(d.size)

    def compute(self):
        n = max(self.n, 1)
        return self.sum_d2 / n - (self.sum_d / n) ** 2


class DepthRangeMSE(DepthMSE):
    """MSE restricted to targets within [lo, hi) (reference custom_metrics.py:208-266)."""

    def __init__(self, distance_range):
        super().__init__()
        self.distance_range = tuple(distance_range)

    def update(self, preds, target):
        means = np.asarray(preds, dtype=np.float64)[:, 0, ...]
        target = np.asarray(target, dtype=np.float64)
        t = np.broadcast_to(target, means.shape)
        lo, hi = self.distance_range
        idxs = _valid(means, t) & (lo <= t) & (t < hi)
        self.sum_se += float(np.sum((means[idxs] - t[idxs]) ** 2))
        self.n += float(idxs.sum())
        return self.compute()

    __call__ = update


def add_distance_ranged_mse(metric_dict, ranges, prefix=""):
    """Register one DepthRangeMSE per range (reference custom_metrics.py:268-296)."""
    for lo, hi in ranges:
        metric_dict[f"{prefix}mse_range_{lo}_{hi}"] = DepthRangeMSE((lo, hi))
    return metric_dict


class MeanSTD:
    """Mean predicted standard deviation exp(0.5*logvar) over foreground pixels
    (uncertainty head, reference custom_metrics.py:299-326)."""

    def __init__(self):
        self.sum_std = 0.0
        self.n = 0.0

    def update(self, preds, target):
        preds = np.asarray(preds, dtype=np.float64)
        if preds.shape[1] < 2:
            return
        log_var = preds[:, 1, ...]
        t = np.broadcast_to(np.asarray(target, dtype=np.float64), log_var.shape)
        idxs = _valid(log_var, t)
        self.sum_std += float(np.sum(np.exp(0.5 * log_var[idxs])))
        self.n += float(idxs.sum())

    def compute(self):
        return self.sum_std / max(self.n, 1)


class MeanSTDMedian:
    """Median over per-sample mean stds (reference custom_metrics.py:329-355)."""

    def __init__(self):
        self.per_sample = []

    def update(self, preds, target):
        preds = np.asarray(preds, dtype=np.float64)
        if preds.shape[1] < 2:
            return
        for i in range(preds.shape[0]):
            lv = preds[i, 1, ...]
            t = np.asarray(target, dtype=np.float64)[i]
            idxs = _valid(lv, t)
            if idxs.any():
                self.per_sample.append(float(np.mean(np.exp(0.5 * lv[idxs]))))

    def compute(self):
        return float(np.median(self.per_sample)) if self.per_sample else float("nan")


class MeanPredDist:
    """Welford running mean of predicted distances (reference custom_metrics.py:358-396)."""

    def __init__(self):
        self.n = 0.0
        self.mean = 0.0
        self.m2 = 0.0

    def update(self, preds, target=None):
        vals = np.asarray(preds, dtype=np.float64)[:, 0, ...].reshape(-1)
        vals = vals[np.isfinite(vals)]
        for v in vals:  # Welford, like the reference (vectorized per chunk below)
            self.n += 1
            d = v - self.mean
            self.mean += d / self.n
            self.m2 += d * (v - self.mean)

    def compute(self):
        return self.mean


class STDPredDist(MeanPredDist):
    """Welford running std of predicted distances (reference custom_metrics.py:399-426;
    the reference's compute has a `num_sampels` typo and is unused — fixed here)."""

    def compute(self):
        return float(np.sqrt(self.m2 / max(self.n - 1, 1)))


class BlurredDepthMSE(DepthMSE):
    """MSE of gaussian-blurred prediction vs gaussian-blurred target
    (reference custom_metrics.py:580-608)."""

    def __init__(self, kernel_size=(5, 5), sigma=None):
        super().__init__()
        self.kernel_size = kernel_size
        kh = kernel_size[0]
        # torchvision default sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8
        self.sigma = sigma if sigma is not None else 0.3 * ((kh - 1) * 0.5 - 1) + 0.8

    def _blur(self, x):
        from scipy.ndimage import gaussian_filter

        return gaussian_filter(x, sigma=self.sigma, mode="nearest", radius=self.kernel_size[0] // 2)

    def update(self, preds, target):
        p = np.asarray(preds, dtype=np.float64)[:, 0, ...]
        t = np.broadcast_to(np.asarray(target, dtype=np.float64), p.shape)
        pb = np.stack([self._blur(pi) for pi in p])
        tb = np.stack([self._blur(ti) for ti in t])
        return super().update(pb[:, None], tb)


def build_chamfer_clouds(preds, target, cal_info, nside=256, base_pix=8, hp_data=False,
                         rotate_pole=False, foreground_pix=None):
    """Host-side half of the Chamfer metric: builds the (p, q) point clouds from
    depth maps via ray directions (flat calibration inverse-projection or HP
    pix2vec), rotates by the extrinsic quaternion, filters nan/inf (+ optional
    foreground masks).  Pure numpy — safe to run in a worker thread so a
    writer can overlap the next variant's cloud construction with the current
    variant's device folds (hp_depth_pred_writers.py)."""
    if isinstance(hp_data, (list, tuple)):
        hp_pred, hp_target = hp_data
    else:
        hp_pred = hp_target = hp_data
    pred_dist = np.asarray(preds)[:, 0, ...]
    target = np.asarray(target)

    pred_pc, _ = depth_utils.create_point_cloud_from_depth_mask(
        pred_dist, cal_info, nside=nside, base_pix=base_pix, hp_data=hp_pred,
        rotate_pole=rotate_pole,
    )
    target_pc, _ = depth_utils.create_point_cloud_from_depth_mask(
        target, cal_info, nside=nside, base_pix=base_pix, hp_data=hp_target,
        rotate_pole=rotate_pole,
    )

    def _finite_rows(pc):
        return np.isfinite(pc.sum(axis=-1)).reshape(-1)

    pred_ok = _finite_rows(pred_pc)
    target_ok = _finite_rows(target_pc)

    if isinstance(foreground_pix, (list, tuple)):
        fp, ft = foreground_pix
        if fp is not None:
            pred_ok &= np.asarray(fp).reshape(-1)
        if ft is not None:
            target_ok &= np.asarray(ft).reshape(-1)
    elif foreground_pix is not None:
        fg = np.asarray(foreground_pix).reshape(-1)
        pred_ok &= fg
        target_ok &= fg

    p = pred_pc.reshape(-1, 3)[pred_ok]
    q = target_pc.reshape(-1, 3)[target_ok]
    return p, q


class ChamferDistance:
    """Point-cloud Chamfer metric (reference :471-577) on the TPU-native tiled kernel.

    update() builds point clouds (build_chamfer_clouds) and accumulates the
    symmetric Chamfer distance; also returns this sample's value
    (compute_on_step semantics).  update_clouds() takes pre-built clouds (and
    optionally a ``chamfer.prepare_pair`` product) so callers can overlap the
    host prep of one pair with the device folds of another."""

    def __init__(self):
        self.sum_chamfer = 0.0
        self.num_samples = 0.0

    def update(self, preds, target, cal_info, nside=256, base_pix=8, hp_data=False,
               rotate_pole=False, foreground_pix=None):
        p, q = build_chamfer_clouds(
            preds, target, cal_info, nside=nside, base_pix=base_pix, hp_data=hp_data,
            rotate_pole=rotate_pole, foreground_pix=foreground_pix,
        )
        return self.update_clouds(p, q)

    def update_clouds(self, p, q, prepared=None):
        loss = _chamfer(p, q, prepared=prepared)
        if np.isfinite(loss):
            self.sum_chamfer += loss
            self.num_samples += 1
        return loss

    __call__ = update

    def compute(self):
        return self.sum_chamfer / max(self.num_samples, 1)
