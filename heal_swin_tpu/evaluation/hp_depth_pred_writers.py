"""HEALPix depth prediction writers
(reference heal_swin/evaluation/hp_depth_pred_writers.py).

Predictions arrive channels-last (B, npix, C) with channel 0 = metric depths (the task
un-normalizes, matching the reference's forward); writers transpose internally.  Metric
names match the reference exactly: {mse,SILogE,iRMSE,RelAE,RelSE}_back_projected[_res_*]
and chamfer_distance{,_full_res,_full_res_hp_masked,_small_res_hp_masked}."""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from heal_swin_tpu.data import normalize_depth_data as ndd
from heal_swin_tpu.ops import chamfer as chamfer_ops
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


def _metric_dict_with_ranges(mse_ranges):
    """The figure's distance-band dict (reference pl_module.metric_dict,
    model_lightning_depth_swin_hp.py:73-86 — mse only by default; optional
    DepthRangeMSE bands via custom_metrics.add_distance_ranged_mse)."""
    md = {"mse": dm.DepthMSE()}
    if mse_ranges:
        dm.add_distance_ranged_mse(md, [tuple(r) for r in mse_ranges])
    return md


def _std_channel(pred_cf):
    """Predicted std sqrt(exp(logvar)) from channel 1 of a channels-first pred, or
    None for single-channel models (reference :144-159)."""
    if pred_cf.shape[0] < 2:
        return None
    return np.sqrt(np.exp(np.asarray(pred_cf[1], dtype=np.float64)))


class WoodscapeHPDepthBasePredictionWriter(_WriterBase):
    """Full 4x4 comparison figures with pre/post back-projection MSE in the filename
    (reference :23-199)."""

    def __init__(self, output_dir=None, output_resolution=1, rotate_pole=False, prefix="",
                 nside=256, base_pix=8, part="val", data_transform=None,
                 mask_background=False, normalize_data=None, interpolation_mode="nearest",
                 mse_ranges=None, run=None, **_ignore):
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
        self.interpolation_mode = interpolation_mode
        self.stats = ndd.get_depth_data_stats(data_transform, mask_background)
        self.metric_dict = _metric_dict_with_ranges(mse_ranges)
        self.mse = dm.DepthMSE()
        self.prefix = _norm_prefix(prefix)

    def _back(self, hp_map, cal_info):
        return fisheye.project_hp_depth_back(
            np.asarray(hp_map, dtype=np.float64), cal_info, self.resolution,
            self.rotate_pole, self.nside, self.base_pix, s2_bkgd_class=float("nan"),
        )[0]

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
            pred_mean = self._back(hp_pred[0], cal_info)
            transf_mask = self._back(hp_mask_metric, cal_info)
            transf_mask[np.isinf(transf_mask)] = np.nan
            post_mse = dm.DepthMSE()(pred_mean[None, None], transf_mask[None])
            if self.output_dir is not None:
                std = _std_channel(hp_pred)
                ranged = depth_utils.create_ranged_mse_mask(
                    self.metric_dict, pred_mean[None, None], transf_mask
                )
                out_size = tuple(int(d * self.resolution) for d in
                                 np.asarray(mask).shape[-2:])
                pred_r = _resize_float(pred_mean[None], out_size,
                                       self.interpolation_mode)[0]
                transf_r = _resize_float(transf_mask[None], out_size,
                                         self.interpolation_mode)[0]
                mask_r = _resize_float(np.asarray(mask, dtype=np.float64)[None],
                                       out_size, self.interpolation_mode)[0]
                img_r = _resize_float(np.asarray(img, dtype=np.float64), out_size,
                                      self.interpolation_mode)
                std_r = None if std is None else self._back_resize_std(std, cal_info,
                                                                       out_size)
                path = os.path.join(
                    self.output_dir,
                    f"{self.prefix}{self.part}_{name}_best_ckpt_mse={pre_mse:.4f}_"
                    f"{post_mse:.4f}.png",
                )
                depth_utils.save_depth_pred_comparison_image(
                    pred_dist=pred_r, original_ground_truth=mask_r,
                    ground_truth_after_transforms=transf_r, img=img_r, filepath=path,
                    metric_dict=self.metric_dict, std=std_r, ranged_mse_map=ranged,
                    title=name,
                )

    def _back_resize_std(self, hp_std, cal_info, out_size):
        std = self._back(hp_std, cal_info)
        return _resize_float(std[None], out_size, self.interpolation_mode)[0]


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


def _rank_top_bottom(metric_values, names, sort_dir, top_k):
    """Reference ranking convention (hp_depth_pred_writers.py:643-654 / :957-967):
    argsort (reversed for desc), top = tail reversed, bottom = head."""
    values = np.array(metric_values)
    names = np.array(names)
    order = np.argsort(values)
    if sort_dir == "desc":
        order = order[::-1]
    return {"top": names[order[-top_k:]][::-1], "bottom": names[order[:top_k]]}


def _find_sample(pred_dataset, name):
    """Sample dict by name.  Predict datasets expose a ``names`` list, so the
    lookup is one index (materializing a sample decodes images and projects to
    HEALPix — a linear scan per ranked name made the best/worst writers quadratic
    in the dataset).  Duck-typed fixtures without ``names`` fall back to the
    scan."""
    names = getattr(pred_dataset, "names", None)
    if names is not None:
        try:
            return pred_dataset[list(names).index(name)]
        except ValueError:
            return None
    for si in range(len(pred_dataset)):
        s = pred_dataset[si]
        if s["names"] == name:
            return s
    return None


def _fresh_depth_metric(metric_name, stats):
    metrics = {
        "mse": dm.DepthMSE,
        "SILogE": dm.ScaleInvariantLogError,
        "iRMSE": dm.DepthiRMSE,
        "RelAE": lambda: dm.DepthRelAE(total_mean=stats.mean),
        "RelSE": lambda: dm.DepthRelSE(total_mean=stats.mean),
    }
    return metrics[metric_name]()


class WoodscapeHPDepthBestWorstPredictionWriter(_WriterBase):
    """Rank by per-sample depth metric; re-predict top/bottom-k and save full
    comparison figures (reference :550-731)."""

    RANKING_METRICS = ("mse", "SILogE", "iRMSE", "RelAE", "RelSE")

    def __init__(self, output_dir=None, output_resolution=1, rotate_pole=False, prefix="",
                 nside=256, base_pix=8, part="val", top_k=5, ranking_metric="mse",
                 sort_dir="desc", pred_dataset=None, data_transform=None,
                 mask_background=False, normalize_data=None, mse_ranges=None,
                 run=None, **_ignore):
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
        if ranking_metric not in self.RANKING_METRICS:  # eval configs default to seg
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
        for hp_pred, hp_mask, name in zip(preds_cf, batch["hp_masks"], batch["names"]):
            hp_mask_metric = np.asarray(
                ndd.unnormalize_and_retransform(
                    np.asarray(hp_mask), self.normalize_data, self.stats, self.data_transform
                )
            )
            self.metric_values.append(self._rank(hp_pred[None], hp_mask_metric[None]))
            self.names.append(name)

    def on_predict_epoch_end(self):
        groups = _rank_top_bottom(self.metric_values, self.names, self.sort_dir, self.top_k)
        for top_bottom, group in groups.items():
            for idx, name in enumerate(group):
                sample = _find_sample(self.pred_dataset, name)
                if sample is None or self._predict_fn is None:
                    continue
                cal_info = sample["cal_infos"]
                pred = _cf(self._predict_fn(np.asarray(sample["hp_imgs"])[None]))[0]
                hp_mask_metric = np.asarray(
                    ndd.unnormalize_and_retransform(
                        np.asarray(sample["hp_masks"]), self.normalize_data, self.stats,
                        self.data_transform,
                    )
                )
                metric_value = self._rank(pred[None], hp_mask_metric[None])
                pred_mean = fisheye.project_hp_depth_back(
                    pred[0], cal_info, self.resolution, self.rotate_pole, self.nside,
                    self.base_pix, s2_bkgd_class=float("nan"),
                )[0]
                transf_mask = fisheye.project_hp_depth_back(
                    hp_mask_metric, cal_info, self.resolution, self.rotate_pole,
                    self.nside, self.base_pix, s2_bkgd_class=float("nan"),
                )[0]
                proj_metric_value = self._rank(pred_mean[None, None], transf_mask[None])
                if self.output_dir is not None:
                    mask = np.asarray(sample["masks"], dtype=np.float64)
                    out_size = mask.shape[-2:]
                    pred_r = _resize_float(pred_mean[None], out_size)[0]
                    transf_r = _resize_float(transf_mask[None], out_size)[0]
                    transf_r[np.isinf(transf_r)] = np.nan
                    img_r = _resize_float(
                        np.asarray(sample["imgs"], dtype=np.float64), out_size, "bilinear"
                    )
                    path = os.path.join(
                        self.output_dir,
                        f"{self.prefix}{self.part}_{self.metric_name}_{top_bottom}_"
                        f"{idx + 1}_{name}_{self.metric_name}={metric_value:.4f}_"
                        f"{proj_metric_value:.4f}.png",
                    )
                    depth_utils.save_depth_pred_comparison_image(
                        pred_dist=pred_r, original_ground_truth=mask,
                        ground_truth_after_transforms=transf_r, img=img_r, filepath=path,
                        metric_dict=self.metric_dict, std=None, title=name,
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

            # The four variants' HOST work (cutout masks, resizes, point-cloud
            # construction, Morton/tile prep) runs in a worker thread one
            # variant ahead of the DEVICE folds (main thread): the ~0.7-0.8
            # s/pair of prep that used to serialize with the device now hides
            # behind the previous variant's folds.  The ranking value reuses
            # the cumulative chamfer_distance update (identical inputs ->
            # identical value; the reference computes it twice, :806-822).
            def clouds_native():
                return dm.build_chamfer_clouds(
                    hp_pred, hp_mask, cal_info, hp_data=True, foreground_pix=hp_fg,
                    **kwargs,
                )

            def clouds_full():
                return dm.build_chamfer_clouds(
                    hp_pred, full_res_mask, cal_info, hp_data=(True, False),
                    foreground_pix=(hp_fg, full_fg), **kwargs,
                )

            def clouds_full_masked():
                hp_masked_full = depth_utils.mask_flat_with_hp_cutout(
                    full_res_mask.copy(), cal_info, base_pix=self.base_pix,
                    nside=self.nside, rotate_pole=self.rotate_pole,
                    masking_val=float("nan"),
                )
                return dm.build_chamfer_clouds(
                    hp_pred, hp_masked_full, cal_info, hp_data=(True, False),
                    foreground_pix=(hp_fg, self._foreground(hp_masked_full)), **kwargs,
                )

            def clouds_small_masked():
                small = _resize_float(full_res_mask, SMALL_RES, self.interpolation_mode)
                hp_masked_small = depth_utils.mask_flat_with_hp_cutout(
                    small.copy(), cal_info, base_pix=self.base_pix, nside=self.nside,
                    rotate_pole=self.rotate_pole, masking_val=float("nan"),
                )
                return dm.build_chamfer_clouds(
                    hp_pred, hp_masked_small, cal_info, hp_data=(True, False),
                    foreground_pix=(hp_fg, self._foreground(hp_masked_small)), **kwargs,
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

    def _chamfer(self, pred, target, cal_info, fg):
        return float(dm.ChamferDistance().update(
            pred, target, cal_info, hp_data=True, foreground_pix=fg, nside=self.nside,
            base_pix=self.base_pix, rotate_pole=self.rotate_pole,
        ))

    def _make_pc(self, data, cal_info, background_val=float("nan")):
        return depth_utils.create_point_cloud_from_depth_mask(
            data, cal_info, nside=self.nside, hp_data=True, base_pix=self.base_pix,
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
                pred = _cf(self._predict_fn(np.asarray(sample["hp_imgs"])[None]))[0]
                hp_mask = np.asarray(
                    ndd.unnormalize_and_retransform(
                        np.asarray(sample["hp_masks"]), self.normalize_data, self.stats,
                        self.data_transform,
                    )
                ).copy()
                hp_mask[np.isinf(hp_mask)] = np.nan
                hp_fg = self._foreground(hp_mask[None])
                metric_value = self._chamfer(pred[None], hp_mask[None], cal_info, hp_fg)
                base = (f"{self.prefix}{self.part}_{self.metric_name}_{top_bottom}_"
                        f"{idx + 1}_{name}_{self.metric_name}={metric_value:.4f}")

                # point clouds (reference :1012-1097)
                pred_pc, _ = self._make_pc(pred[0][None], cal_info)
                gt_pc, gt_fg = self._make_pc(
                    hp_mask[None], cal_info, background_val=(float("nan"), float("inf"), 1000)
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    log_pred_pc, _ = self._make_pc(np.log(pred[0])[None], cal_info)
                    log_gt_pc, _ = self._make_pc(np.log(hp_mask)[None], cal_info)
                c_img = np.asarray(sample["hp_imgs"], dtype=np.float64) / 255.0
                if c_img.ndim == 2 and c_img.shape[0] == 3:  # (3, npix) -> (npix, 3)
                    c_img = c_img.T
                if self.mask_background:
                    keep = gt_fg[0]
                    pred_pc, gt_pc = pred_pc[:, keep], gt_pc[:, keep]
                    log_pred_pc, log_gt_pc = log_pred_pc[:, keep], log_gt_pc[:, keep]
                    c_img = c_img[keep]
                depth_utils.save_point_cloud_plane_scatters(
                    pred_pc, gt_pc, self.output_dir, base, gt_label="hp gt",
                    pred_label="hp pred",
                )

                # back-projected log maps + image-colored panels (reference :1099-1225)
                back_pred = fisheye.project_hp_depth_back(
                    pred[0], cal_info, self.resolution, self.rotate_pole, self.nside,
                    self.base_pix, s2_bkgd_class=float("nan"),
                )[0]
                back_gt = fisheye.project_hp_depth_back(
                    hp_mask, cal_info, self.resolution, self.rotate_pole, self.nside,
                    self.base_pix, s2_bkgd_class=float("nan"),
                )[0]
                with np.errstate(divide="ignore", invalid="ignore"):
                    depth_utils.save_point_cloud_gt_vs_pred_panels(
                        np.log(back_gt), np.log(back_pred), log_gt_pc, log_pred_pc,
                        gt_pc, pred_pc, c_img, self.output_dir, base,
                    )
