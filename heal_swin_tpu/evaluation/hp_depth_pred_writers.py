"""HEALPix depth prediction writers
(reference heal_swin/evaluation/hp_depth_pred_writers.py).

Predictions arrive channels-last (B, npix, C) with channel 0 = metric depths (the task
un-normalizes, matching the reference's forward); writers transpose internally.  Metric
names match the reference exactly: {mse,SILogE,iRMSE,RelAE,RelSE}_back_projected[_res_*]
and chamfer_distance{,_full_res,_full_res_hp_masked,_small_res_hp_masked}."""

from __future__ import annotations

import os

import numpy as np

from heal_swin_tpu.data import normalize_depth_data as ndd
from heal_swin_tpu.evaluation import depth_metrics_np as dm
from heal_swin_tpu.evaluation.flat_pred_writers import _WriterBase, _norm_prefix
from heal_swin_tpu.projection import fisheye
from heal_swin_tpu.utils import depth_utils
from heal_swin_tpu.utils import image as I

SMALL_RES = (629, 834)  # reference hp_depth_pred_writers.py:806-810


def _cf(preds):
    """(B, npix, C) -> (B, C, npix)."""
    p = np.asarray(preds)
    return p.transpose(0, 2, 1) if p.ndim == 3 else p[:, None, :]


def _resize_float(x, size, mode="nearest"):
    if isinstance(size, (int, float)):
        short = min(x.shape[-2:])
        scale = size if isinstance(size, float) else size / short
        size = (int(x.shape[-2] * scale), int(x.shape[-1] * scale))
    if tuple(size) == x.shape[-2:]:
        return x
    return I.resize_nearest(x, tuple(size)) if mode == "nearest" else I.resize_bilinear(x, tuple(size))


class _DepthMetricDict:
    def __init__(self, data_transform, mask_background):
        stats = ndd.get_depth_data_stats(data_transform, mask_background)
        self.metrics = {
            "mse": dm.DepthMSE(),
            "SILogE": dm.ScaleInvariantLogError(),
            "iRMSE": dm.DepthiRMSE(),
            "RelAE": dm.DepthRelAE(total_mean=stats.mean),
            "RelSE": dm.DepthRelSE(total_mean=stats.mean),
        }

    def update(self, preds, target):
        for metric in self.metrics.values():
            metric.update(preds, target)

    def computed(self, pref, suff):
        return {f"{pref}_{k}_{suff}": float(v.compute()) for k, v in self.metrics.items()}


class WoodscapeHPDepthBasePredictionWriter(_WriterBase):
    """Comparison figures with pre/post back-projection MSE in the filename
    (reference :23-199)."""

    def __init__(self, output_dir=None, output_resolution=1, rotate_pole=False, prefix="",
                 nside=256, base_pix=8, part="val", data_transform=None,
                 mask_background=False, normalize_data=None, run=None, **_ignore):
        super().__init__(run=run)
        self.output_dir = output_dir
        self.resolution = output_resolution
        self.rotate_pole = rotate_pole
        self.nside = nside
        self.base_pix = base_pix
        self.part = part
        self.data_transform = data_transform
        self.mask_background = mask_background
        self.normalize_data = normalize_data
        self.stats = ndd.get_depth_data_stats(data_transform, mask_background)
        self.mse = dm.DepthMSE()
        self.prefix = _norm_prefix(prefix)

    def write_on_batch_end(self, preds, batch, batch_idx):
        preds_cf = _cf(preds)
        for hp_pred, hp_mask, img, mask, cal_info, name in zip(
            preds_cf, batch["hp_masks"], batch["imgs"], batch["masks"], batch["cal_infos"],
            batch["names"],
        ):
            hp_mask_metric = np.asarray(
                ndd.unnormalize_and_retransform(
                    np.asarray(hp_mask), self.normalize_data, self.stats, self.data_transform
                )
            )
            pre_mse = dm.DepthMSE()(hp_pred[None], hp_mask_metric[None])
            flat_pred = fisheye.project_hp_depth_back(
                hp_pred[0], cal_info, self.resolution, self.rotate_pole, self.nside,
                self.base_pix, s2_bkgd_class=float("nan"),
            )
            mask_r = _resize_float(np.asarray(mask, dtype=np.float64)[None],
                                   self.resolution)[0]
            post_mse = dm.DepthMSE()(flat_pred[None], mask_r[None])
            if self.output_dir is not None:
                path = os.path.join(
                    self.output_dir,
                    f"{self.prefix}{self.part}_{name}_pre_mse={pre_mse:.2f}"
                    f"_post_mse={post_mse:.2f}.png",
                )
                img_r = _resize_float(np.asarray(img, dtype=np.float64), self.resolution,
                                      "bilinear")
                depth_utils.save_depth_pred_comparison_image(
                    flat_pred[0], mask_r, img_r, path, title=name
                )


class WoodscapeHPDepthValOnBackProjectedPredictionWriter(_WriterBase):
    """Back-project predicted depths, score vs original depth maps (reference :378-547)."""

    def __init__(self, output_dir=None, img_dims=None, rotate_pole=False, prefix="",
                 nside=256, base_pix=8, part="val", proj_res=1, data_transform=None,
                 mask_background=False, normalize_data=None, interpolation_mode="nearest",
                 run=None, **_ignore):
        super().__init__(run=run)
        self.rotate_pole = rotate_pole
        self.nside = nside
        self.base_pix = base_pix
        self.part = part
        self.proj_res = tuple(proj_res) if isinstance(proj_res, list) else proj_res
        self.org_size = None
        self.interpolation_mode = interpolation_mode
        self.metric_dict = _DepthMetricDict(data_transform, mask_background)
        self.prefix = _norm_prefix(prefix)

    def write_on_batch_end(self, preds, batch, batch_idx):
        preds_cf = _cf(preds)  # metric depths on channel 0
        masks = np.asarray(batch["masks"], dtype=np.float64)  # raw metric depth maps
        cal_infos = batch["cal_infos"]
        if self.org_size is None:
            cal = cal_infos[0]["intrinsic"]
            self.org_size = (int(cal["height"]), int(cal["width"]))

        flat_preds = []
        for hp_pred, mask, cal_info in zip(preds_cf, masks, cal_infos):
            pred_mean = fisheye.project_hp_depth_back(
                hp_pred[0], cal_info, self.proj_res, self.rotate_pole, self.nside,
                self.base_pix, s2_bkgd_class=float("nan"),
            )  # (1, h, w)
            flat_preds.append(pred_mean[0])
            if isinstance(self.proj_res, (int, float)):
                out = int(self.proj_res * min(mask.shape))
            else:
                out = self.proj_res
            mask_r = _resize_float(mask[None], out, self.interpolation_mode)[0]
            pred_r = _resize_float(pred_mean, out, self.interpolation_mode)
            self.metric_dict.update(pred_r[None], mask_r[None])
        return np.stack(flat_preds), masks

    def get_res_suff(self):
        if isinstance(self.proj_res, int) and self.proj_res != min(self.org_size):
            return f"_res_{self.proj_res}"
        if isinstance(self.proj_res, tuple):
            return f"_res_{self.proj_res[0]}_{self.proj_res[1]}"
        return ""

    def on_predict_epoch_end(self):
        pref = f"{self.prefix}{self.part}"
        suff = "back_projected" + self.get_res_suff()
        self.log_metrics(self.metric_dict.computed(pref, suff))


class WoodscapeHPDepthBestWorstPredictionWriter(_WriterBase):
    """Rank by per-sample depth MSE; save comparison figures for top/bottom-k
    (reference :550-731)."""

    def __init__(self, output_dir=None, output_resolution=1, rotate_pole=False, prefix="",
                 nside=256, base_pix=8, part="val", top_k=5, ranking_metric="mse",
                 sort_dir="asc", pred_dataset=None, data_transform=None,
                 mask_background=False, normalize_data=None, run=None, **_ignore):
        super().__init__(run=run)
        self.output_dir = output_dir
        self.resolution = output_resolution
        self.rotate_pole = rotate_pole
        self.nside = nside
        self.base_pix = base_pix
        self.part = part
        self.top_k = top_k
        self.pred_dataset = pred_dataset
        self.data_transform = data_transform
        self.mask_background = mask_background
        self.normalize_data = normalize_data
        self.stats = ndd.get_depth_data_stats(data_transform, mask_background)
        self.metric_name = "mse"
        self.sort_dir = sort_dir
        self.metric_values = []
        self.names = []
        self.prefix = _norm_prefix(prefix)

    def write_on_batch_end(self, preds, batch, batch_idx):
        preds_cf = _cf(preds)
        for hp_pred, hp_mask, name in zip(preds_cf, batch["hp_masks"], batch["names"]):
            hp_mask_metric = np.asarray(
                ndd.unnormalize_and_retransform(
                    np.asarray(hp_mask), self.normalize_data, self.stats, self.data_transform
                )
            )
            self.metric_values.append(float(dm.DepthMSE()(hp_pred[None], hp_mask_metric[None])))
            self.names.append(name)

    def on_predict_epoch_end(self):
        values = np.array(self.metric_values)
        names = np.array(self.names)
        order = np.argsort(values)
        if self.sort_dir == "desc":
            order = order[::-1]
        groups = {"top": names[order[: self.top_k]], "bottom": names[order[-self.top_k:]][::-1]}
        for top_bottom, group in groups.items():
            for idx, name in enumerate(group):
                sample = None
                for si in range(len(self.pred_dataset)):
                    s = self.pred_dataset[si]
                    if s["names"] == name:
                        sample = s
                        break
                if sample is None or self._predict_fn is None:
                    continue
                pred = _cf(self._predict_fn(np.asarray(sample["hp_imgs"])[None]))[0]
                flat_pred = fisheye.project_hp_depth_back(
                    pred[0], sample["cal_infos"], self.resolution, self.rotate_pole,
                    self.nside, self.base_pix, s2_bkgd_class=float("nan"),
                )
                mask_r = _resize_float(
                    np.asarray(sample["masks"], dtype=np.float64)[None], self.resolution
                )[0]
                mse = dm.DepthMSE()(flat_pred[None], mask_r[None])
                if self.output_dir is not None:
                    img_r = _resize_float(
                        np.asarray(sample["imgs"], dtype=np.float64), self.resolution, "bilinear"
                    )
                    path = os.path.join(
                        self.output_dir,
                        f"{self.prefix}{self.part}_{top_bottom}_{idx + 1}_{name}"
                        f"_mse={mse:.2f}.png",
                    )
                    depth_utils.save_depth_pred_comparison_image(
                        flat_pred[0], mask_r, img_r, path, title=name
                    )


class WoodscapeHPDepthChamferDistBestWorstPredictionWriter(_WriterBase):
    """Chamfer-distance evaluation (reference :734-1225): per-sample ranking plus 4
    cumulative variants, incl. the paper's chamfer_distance_full_res_hp_masked."""

    def __init__(self, output_dir=None, output_resolution=1, rotate_pole=False, prefix="",
                 nside=256, base_pix=8, part="val", top_k=2,
                 ranking_metric="chamfer_distance", sort_dir="desc", pred_dataset=None,
                 data_transform=None, mask_background=False, normalize_data=None,
                 interpolation_mode="nearest", run=None, **_ignore):
        super().__init__(run=run)
        self.output_dir = output_dir
        self.rotate_pole = rotate_pole
        self.nside = nside
        self.base_pix = base_pix
        self.part = part
        self.top_k = top_k
        self.pred_dataset = pred_dataset
        self.data_transform = data_transform
        self.mask_background = mask_background
        self.normalize_data = normalize_data
        self.stats = ndd.get_depth_data_stats(data_transform, mask_background)
        self.interpolation_mode = interpolation_mode
        self.metrics = {
            "chamfer_distance": dm.ChamferDistance(),
            "chamfer_distance_full_res": dm.ChamferDistance(),
            "chamfer_distance_full_res_hp_masked": dm.ChamferDistance(),
            "chamfer_distance_small_res_hp_masked": dm.ChamferDistance(),
        }
        if ranking_metric not in self.metrics:  # eval configs default to seg metrics
            ranking_metric = "chamfer_distance"
        self.metric_name = ranking_metric
        assert sort_dir in ["asc", "desc"]
        self.sort_dir = sort_dir
        self.metric_values = []
        self.names = []
        self.prefix = _norm_prefix(prefix)

    def _foreground(self, x):
        if not self.mask_background:
            return None
        return depth_utils.get_foreground_mask(
            x, background_val=(float("nan"), float("inf"), 1000)
        )

    def write_on_batch_end(self, preds, batch, batch_idx):
        preds_cf = _cf(preds)
        for hp_pred, hp_mask, name, cal_info, full_res_mask in zip(
            preds_cf, batch["hp_masks"], batch["names"], batch["cal_infos"], batch["masks"]
        ):
            hp_mask = np.asarray(
                ndd.unnormalize_and_retransform(
                    np.asarray(hp_mask), self.normalize_data, self.stats, self.data_transform
                )
            ).copy()
            hp_mask[np.isinf(hp_mask)] = np.nan
            hp_mask = hp_mask[None]
            hp_pred = hp_pred[None]
            full_res_mask = np.asarray(full_res_mask, dtype=np.float64)[None]

            hp_fg = self._foreground(hp_mask)
            full_fg = self._foreground(full_res_mask)

            kwargs = dict(nside=self.nside, base_pix=self.base_pix,
                          rotate_pole=self.rotate_pole)
            value = dm.ChamferDistance().update(
                hp_pred, hp_mask, cal_info, hp_data=True, foreground_pix=hp_fg, **kwargs
            )
            self.metrics["chamfer_distance"].update(
                hp_pred, hp_mask, cal_info, hp_data=True, foreground_pix=hp_fg, **kwargs
            )
            self.metrics["chamfer_distance_full_res"].update(
                hp_pred, full_res_mask, cal_info, hp_data=(True, False),
                foreground_pix=(hp_fg, full_fg), **kwargs,
            )
            hp_masked_full = depth_utils.mask_flat_with_hp_cutout(
                full_res_mask.copy(), cal_info, base_pix=self.base_pix, nside=self.nside,
                rotate_pole=self.rotate_pole, masking_val=float("nan"),
            )
            self.metrics["chamfer_distance_full_res_hp_masked"].update(
                hp_pred, hp_masked_full, cal_info, hp_data=(True, False),
                foreground_pix=(hp_fg, self._foreground(hp_masked_full)), **kwargs,
            )
            small = _resize_float(full_res_mask, SMALL_RES, self.interpolation_mode)
            hp_masked_small = depth_utils.mask_flat_with_hp_cutout(
                small.copy(), cal_info, base_pix=self.base_pix, nside=self.nside,
                rotate_pole=self.rotate_pole, masking_val=float("nan"),
            )
            self.metrics["chamfer_distance_small_res_hp_masked"].update(
                hp_pred, hp_masked_small, cal_info, hp_data=(True, False),
                foreground_pix=(hp_fg, self._foreground(hp_masked_small)), **kwargs,
            )
            self.metric_values.append(float(value))
            self.names.append(name)

    def on_predict_epoch_end(self):
        self.log_metrics(
            {f"{self.prefix}{k}": float(v.compute()) for k, v in self.metrics.items()}
        )
