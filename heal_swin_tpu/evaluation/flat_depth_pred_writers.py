"""Flat depth prediction writers
(reference heal_swin/evaluation/flat_depth_pred_writers.py).

Predictions arrive channels-last (B, H, W, C) with channel 0 = metric depths.
Metric names: {mse,SILogE,iRMSE,RelAE,RelSE}_projected_to_hp and the chamfer suite."""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from heal_swin_tpu.data import normalize_depth_data as ndd
from heal_swin_tpu.ops import chamfer as chamfer_ops
from heal_swin_tpu.evaluation import depth_metrics_np as dm
from heal_swin_tpu.evaluation.flat_pred_writers import _WriterBase, _norm_prefix
from heal_swin_tpu.evaluation.hp_depth_pred_writers import (
    SMALL_RES,
    _DepthMetricDict,
    _find_sample,
    _fresh_depth_metric,
    _metric_dict_with_ranges,
    _rank_top_bottom,
    _resize_float,
    _std_channel,
)
from heal_swin_tpu.projection import fisheye
from heal_swin_tpu.utils import depth_utils
from heal_swin_tpu.utils import image as I


def _cf(preds):
    """(B, H, W, C) -> (B, C, H, W)."""
    p = np.asarray(preds)
    return p.transpose(0, 3, 1, 2) if p.ndim == 4 else p[:, None]


class WoodscapeFlatDepthBasePredictionWriter(_WriterBase):
    """Full 4x4 comparison figures with MSE in the filename (reference :18-130)."""

    def __init__(self, output_dir=None, output_resolution=1.0, prefix="", part="val",
                 data_transform=None, mask_background=False, normalize_data=None,
                 interpolation_mode="nearest", mse_ranges=None, run=None, **_ignore):
        super().__init__(run=run)
        self.output_dir = output_dir
        self.resolution = output_resolution
        self.part = part
        self.data_transform = data_transform
        self.mask_background = mask_background
        self.normalize_data = normalize_data
        self.interpolation_mode = interpolation_mode
        self.stats = ndd.get_depth_data_stats(data_transform, mask_background)
        self.metric_dict = _metric_dict_with_ranges(mse_ranges)
        self.prefix = _norm_prefix(prefix)

    def write_on_batch_end(self, preds, batch, batch_idx):
        preds_cf = _cf(preds)
        for pred, s2_mask, img, mask, s2_img, name in zip(
            preds_cf, batch["s2_masks"], batch["imgs"], batch["masks"], batch["s2_imgs"],
            batch["names"],
        ):
            transf_mask = np.asarray(
                ndd.unnormalize_and_retransform(
                    np.asarray(s2_mask), self.normalize_data, self.stats, self.data_transform
                ), dtype=np.float64,
            ).copy()
            transf_mask[np.isinf(transf_mask)] = np.nan
            mse = dm.DepthMSE()(pred[None], transf_mask[None])
            if self.output_dir is not None:
                std = _std_channel(pred)
                ranged = depth_utils.create_ranged_mse_mask(
                    self.metric_dict, pred[None], transf_mask
                )
                out_size = np.asarray(mask).shape[-2:]
                pred_r = _resize_float(pred[0][None], out_size,
                                       self.interpolation_mode)[0]
                transf_r = _resize_float(transf_mask[None], out_size,
                                         self.interpolation_mode)[0]
                std_r = None if std is None else _resize_float(
                    std[None], out_size, self.interpolation_mode)[0]
                img_r = _resize_float(np.asarray(img, dtype=np.float64), out_size,
                                      self.interpolation_mode)
                path = os.path.join(
                    self.output_dir,
                    f"{self.prefix}{self.part}_{name}_best_ckpt_mse={mse:.4f}.png",
                )
                depth_utils.save_depth_pred_comparison_image(
                    pred_dist=pred_r, original_ground_truth=np.asarray(mask, np.float64),
                    ground_truth_after_transforms=transf_r, img=img_r, filepath=path,
                    metric_dict=self.metric_dict, std=std_r, ranged_mse_map=ranged,
                    title=name,
                )


class WoodscapeFlatDepthValOnHPProjectedPredictionWriter(_WriterBase):
    """Project flat depth predictions onto the HP grid, score against the HP depth
    targets in metric space -> {metric}_projected_to_hp (reference :120-253).

    Divergence from the reference noted: the reference re-applies
    transform_and_normalize to the already-network-space hp_masks (double transform,
    identity only in the default None/None config); we compare in metric space."""

    def __init__(self, output_dir=None, part="val", prefix="", rotate_pole=False,
                 nside=256, base_pix=8, orig_size=None, padding=(0, 0, 0, 0),
                 data_transform=None, mask_background=False, normalize_data=None,
                 run=None, **_ignore):
        super().__init__(run=run)
        self.rotate_pole = rotate_pole
        self.nside = nside
        self.base_pix = base_pix
        self.part = part
        self.orig_size = orig_size
        self.padding = padding
        self.data_transform = data_transform
        self.mask_background = mask_background
        self.normalize_data = normalize_data
        self.stats = ndd.get_depth_data_stats(data_transform, mask_background)
        self.metric_dict = _DepthMetricDict(data_transform, mask_background)
        self.prefix = _norm_prefix(prefix)
        self.theta, self.phi = fisheye.hp_grid_angles(nside, base_pix)

    def _undo_transforms(self, pred):
        left, top, right, bottom = self.padding
        if any(self.padding):
            H, W = pred.shape[-2:]
            pred = pred[..., top : H - bottom or None, left : W - right or None]
        if self.orig_size is not None and tuple(self.orig_size) != pred.shape[-2:]:
            pred = I.resize_nearest(pred, tuple(self.orig_size))
        return pred

    def write_on_batch_end(self, preds, batch, batch_idx):
        preds_cf = _cf(preds)
        hp_preds = []
        for pred, hp_mask, cal_info in zip(preds_cf, batch["hp_masks"], batch["cal_infos"]):
            flat_pred = self._undo_transforms(pred[0])
            u, v = fisheye.project_s2_points_to_img(
                self.theta, self.phi, cal_info, self.rotate_pole
            )
            # nearest sampling with nan background (the depth variant of sample_mask
            # keeps float32, project_depth_on_s2.py:80-85)
            u_int = np.around(v, 0).astype(int)
            v_int = np.around(u, 0).astype(int)
            inb = (
                (0 <= u_int) & (u_int < flat_pred.shape[0])
                & (0 <= v_int) & (v_int < flat_pred.shape[1])
            )
            hp_pred = np.full(u.shape, np.nan)
            hp_pred[inb] = flat_pred[u_int[inb], v_int[inb]]
            hp_preds.append(hp_pred)
            hp_mask_metric = np.asarray(
                ndd.unnormalize_and_retransform(
                    np.asarray(hp_mask), self.normalize_data, self.stats, self.data_transform
                )
            )
            self.metric_dict.update(hp_pred[None, None], hp_mask_metric[None])
        return np.stack(hp_preds), batch["hp_masks"]

    def on_predict_epoch_end(self):
        pref = f"{self.prefix}{self.part}"
        self.log_metrics(self.metric_dict.computed(pref, "projected_to_hp"))


class WoodscapeFlatDepthBestWorstPredictionWriter(_WriterBase):
    """Rank by per-sample depth metric; re-predict top/bottom-k and save full
    comparison figures (reference :256-419)."""

    RANKING_METRICS = ("mse", "SILogE", "iRMSE", "RelAE", "RelSE")

    def __init__(self, output_dir=None, output_resolution=1.0, prefix="", part="val",
                 top_k=5, ranking_metric="mse", sort_dir="desc", pred_dataset=None,
                 data_transform=None, mask_background=False, normalize_data=None,
                 interpolation_mode="nearest", mse_ranges=None, run=None, **_ignore):
        super().__init__(run=run)
        self.output_dir = output_dir
        self.resolution = output_resolution
        self.part = part
        self.top_k = top_k
        self.pred_dataset = pred_dataset
        self.data_transform = data_transform
        self.mask_background = mask_background
        self.normalize_data = normalize_data
        self.interpolation_mode = interpolation_mode
        self.stats = ndd.get_depth_data_stats(data_transform, mask_background)
        if ranking_metric not in self.RANKING_METRICS:
            ranking_metric = "mse"
        self.metric_name = ranking_metric
        self.metric_dict = _metric_dict_with_ranges(mse_ranges)
        self.sort_dir = sort_dir
        self.metric_values = []
        self.names = []
        self.prefix = _norm_prefix(prefix)

    def _rank(self, pred, target):
        return float(_fresh_depth_metric(self.metric_name, self.stats)(pred, target))

    def write_on_batch_end(self, preds, batch, batch_idx):
        preds_cf = _cf(preds)
        for pred, s2_mask, name in zip(preds_cf, batch["s2_masks"], batch["names"]):
            target_metric = np.asarray(
                ndd.unnormalize_and_retransform(
                    np.asarray(s2_mask), self.normalize_data, self.stats, self.data_transform
                )
            )
            self.metric_values.append(self._rank(pred[None], target_metric[None]))
            self.names.append(name)

    def on_predict_epoch_end(self):
        groups = _rank_top_bottom(self.metric_values, self.names, self.sort_dir, self.top_k)
        for top_bottom, group in groups.items():
            for idx, name in enumerate(group):
                sample = _find_sample(self.pred_dataset, name)
                if sample is None or self._predict_fn is None:
                    continue
                pred = _cf(self._predict_fn(np.asarray(sample["s2_imgs"])[None]))[0]
                transf_mask = np.asarray(
                    ndd.unnormalize_and_retransform(
                        np.asarray(sample["s2_masks"]), self.normalize_data, self.stats,
                        self.data_transform,
                    ), dtype=np.float64,
                ).copy()
                transf_mask[np.isinf(transf_mask)] = np.nan
                metric_value = self._rank(pred[None], transf_mask[None])
                if self.output_dir is not None:
                    mask = np.asarray(sample["masks"], dtype=np.float64)
                    out_size = mask.shape[-2:]
                    pred_r = _resize_float(pred[0][None], out_size,
                                           self.interpolation_mode)[0]
                    transf_r = _resize_float(transf_mask[None], out_size,
                                             self.interpolation_mode)[0]
                    post_value = self._rank(pred_r[None, None], transf_r[None])
                    img_cf = np.asarray(sample["s2_imgs"]).transpose(2, 0, 1)
                    path = os.path.join(
                        self.output_dir,
                        f"{self.prefix}{self.part}_{self.metric_name}_{top_bottom}_"
                        f"{idx + 1}_{name}_{self.metric_name}={metric_value:.4f}_"
                        f"{post_value:.4f}.png",
                    )
                    depth_utils.save_depth_pred_comparison_image(
                        pred_dist=pred_r, original_ground_truth=mask,
                        ground_truth_after_transforms=transf_r, img=img_cf, filepath=path,
                        metric_dict=self.metric_dict, std=None, title=name,
                    )


class WoodscapeFlatDepthChamferDistBestWorstPredictionWriter(_WriterBase):
    """Chamfer suite for the flat model (reference :463-905): predictions are flat
    depth maps, the 4 cumulative variants mirror the HP writer."""

    def __init__(self, output_dir=None, rotate_pole=False, prefix="", nside=256,
                 base_pix=8, part="val", top_k=2, ranking_metric="chamfer_distance",
                 sort_dir="desc", pred_dataset=None, data_transform=None,
                 mask_background=False, normalize_data=None, orig_size=None,
                 padding=(0, 0, 0, 0), interpolation_mode="nearest", run=None, **_ignore):
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
        self.orig_size = orig_size
        self.padding = padding
        self.metrics = {
            "chamfer_distance": dm.ChamferDistance(),
            "chamfer_distance_full_res": dm.ChamferDistance(),
            "chamfer_distance_full_res_hp_masked": dm.ChamferDistance(),
            "chamfer_distance_small_res_hp_masked": dm.ChamferDistance(),
        }
        if ranking_metric not in self.metrics:  # eval configs default to seg metrics
            ranking_metric = "chamfer_distance"
        self.metric_name = ranking_metric
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
        for pred, s2_mask, name, cal_info, full_res_mask in zip(
            preds_cf, batch["s2_masks"], batch["names"], batch["cal_infos"], batch["masks"]
        ):
            target_metric = np.asarray(
                ndd.unnormalize_and_retransform(
                    np.asarray(s2_mask), self.normalize_data, self.stats, self.data_transform
                )
            ).copy()
            target_metric[np.isinf(target_metric)] = np.nan
            pred_b = pred[None]
            target_b = target_metric[None]
            full_res_mask = np.asarray(full_res_mask, dtype=np.float64)[None]

            fg = self._foreground(target_b)
            full_fg = self._foreground(full_res_mask)

            kwargs = dict(nside=self.nside, base_pix=self.base_pix,
                          rotate_pole=self.rotate_pole)

            # same host/device pipeline as the HP chamfer writer
            # (hp_depth_pred_writers.py): each variant's host work (cutouts,
            # resizes, point clouds, Morton/tile prep) runs one variant ahead
            # in a worker thread while the device folds the current one; the
            # ranking value reuses the cumulative chamfer_distance update
            # (identical inputs -> identical value)
            def clouds_native():
                return dm.build_chamfer_clouds(
                    pred_b, target_b, cal_info, hp_data=False, foreground_pix=fg,
                    **kwargs,
                )

            def clouds_full():
                return dm.build_chamfer_clouds(
                    pred_b, full_res_mask, cal_info, hp_data=(False, False),
                    foreground_pix=(fg, full_fg), **kwargs,
                )

            # the hp_masked variants also cut the PREDICTION to the HP footprint
            # (reference :576-586, :615-625)
            def masked_pred():
                return depth_utils.mask_flat_with_hp_cutout(
                    pred[0].copy(), cal_info, base_pix=self.base_pix,
                    nside=self.nside, rotate_pole=self.rotate_pole,
                    masking_val=float("nan"),
                )[None, None]

            def clouds_full_masked():
                hp_masked_full = depth_utils.mask_flat_with_hp_cutout(
                    full_res_mask.copy(), cal_info, base_pix=self.base_pix,
                    nside=self.nside, rotate_pole=self.rotate_pole,
                    masking_val=float("nan"),
                )
                return dm.build_chamfer_clouds(
                    masked_pred(), hp_masked_full, cal_info, hp_data=(False, False),
                    foreground_pix=(fg, self._foreground(hp_masked_full)), **kwargs,
                )

            def clouds_small_masked():
                small = _resize_float(full_res_mask, SMALL_RES, self.interpolation_mode)
                hp_masked_small = depth_utils.mask_flat_with_hp_cutout(
                    small.copy(), cal_info, base_pix=self.base_pix, nside=self.nside,
                    rotate_pole=self.rotate_pole, masking_val=float("nan"),
                )
                return dm.build_chamfer_clouds(
                    masked_pred(), hp_masked_small, cal_info, hp_data=(False, False),
                    foreground_pix=(fg, self._foreground(hp_masked_small)), **kwargs,
                )

            tasks = [
                ("chamfer_distance", clouds_native),
                ("chamfer_distance_full_res", clouds_full),
                ("chamfer_distance_full_res_hp_masked", clouds_full_masked),
                ("chamfer_distance_small_res_hp_masked", clouds_small_masked),
            ]

            def _prep(build):
                p, q = build()
                return p, q, chamfer_ops.prepare_pair(p, q)

            value = None
            with ThreadPoolExecutor(max_workers=1) as ex:
                fut = ex.submit(_prep, tasks[0][1])
                for i, (mkey, _) in enumerate(tasks):
                    p, q, prepped = fut.result()
                    if i + 1 < len(tasks):
                        fut = ex.submit(_prep, tasks[i + 1][1])
                    v = self.metrics[mkey].update_clouds(p, q, prepared=prepped)
                    if mkey == "chamfer_distance":
                        value = v
            self.metric_values.append(float(value))
            self.names.append(name)

    def _make_pc(self, data, cal_info, background_val=float("nan")):
        return depth_utils.create_point_cloud_from_depth_mask(
            data, cal_info, nside=self.nside, hp_data=False, base_pix=self.base_pix,
            rotate_pole=self.rotate_pole, background_val=background_val,
        )

    def on_predict_epoch_end(self):
        self.log_metrics(
            {f"{self.prefix}{k}": float(v.compute()) for k, v in self.metrics.items()}
        )
        if self.output_dir is None or self.pred_dataset is None or self._predict_fn is None:
            return
        groups = _rank_top_bottom(self.metric_values, self.names, self.sort_dir, self.top_k)
        for top_bottom, group in groups.items():
            for idx, name in enumerate(group):
                sample = _find_sample(self.pred_dataset, name)
                if sample is None:
                    continue
                cal_info = sample["cal_infos"]
                pred = _cf(self._predict_fn(np.asarray(sample["s2_imgs"])[None]))[0]
                transf_mask = np.asarray(
                    ndd.unnormalize_and_retransform(
                        np.asarray(sample["s2_masks"]), self.normalize_data, self.stats,
                        self.data_transform,
                    ), dtype=np.float64,
                ).copy()
                transf_mask[np.isinf(transf_mask)] = np.nan
                metric_value = float(dm.ChamferDistance().update(
                    pred[None], transf_mask[None], cal_info, hp_data=False,
                    foreground_pix=self._foreground(transf_mask[None]), nside=self.nside,
                    base_pix=self.base_pix, rotate_pole=self.rotate_pole,
                ))
                base = (f"{self.prefix}{self.part}_{self.metric_name}_{top_bottom}_"
                        f"{idx + 1}_{name}_{self.metric_name}={metric_value:.4f}")

                # point clouds (reference :715-797)
                pred_pc, _ = self._make_pc(pred[0][None], cal_info)
                gt_pc, gt_fg = self._make_pc(
                    transf_mask[None], cal_info,
                    background_val=(float("nan"), float("inf"), 1000),
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    log_pred_pc, _ = self._make_pc(np.log(pred[0])[None], cal_info)
                    log_gt_pc, _ = self._make_pc(np.log(transf_mask)[None], cal_info)
                s2_img = np.asarray(sample["s2_imgs"], dtype=np.float64)
                if s2_img.shape[0] == 3 and s2_img.shape[-1] != 3:  # (3, H, W)
                    s2_img = s2_img.transpose(1, 2, 0)
                c_img = s2_img.reshape(-1, 3)
                norms = np.linalg.norm(c_img, axis=-1)
                c_img = c_img / max(float(np.nanmax(norms)), 1e-12)
                if self.mask_background:
                    keep = gt_fg[0]
                    pred_pc, gt_pc = pred_pc[:, keep], gt_pc[:, keep]
                    log_pred_pc, log_gt_pc = log_pred_pc[:, keep], log_gt_pc[:, keep]
                    c_img = c_img[keep]
                depth_utils.save_point_cloud_plane_scatters(
                    pred_pc, gt_pc, self.output_dir, base
                )

                # the flat model's maps are shown directly (reference :833-905)
                with np.errstate(divide="ignore", invalid="ignore"):
                    depth_utils.save_point_cloud_gt_vs_pred_panels(
                        np.log(transf_mask), np.log(pred[0]), log_gt_pc, log_pred_pc,
                        gt_pc, pred_pc, c_img, self.output_dir, base,
                    )
