"""Depth utilities: ray geometry, point clouds, HP footprint cutout, comparison plots
(reference heal_swin/utils/depth_utils.py, numpy/JAX)."""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from heal_swin_tpu.data.normalize_depth_data import (  # noqa: F401  (re-exported API)
    mask_transform_fcn,
    reverse_mask_transform_fcn,
    transform_and_normalize,
    unnormalize_and_retransform,
)
from heal_swin_tpu.ops import healpix as hpx
from heal_swin_tpu.projection import fisheye
from heal_swin_tpu.projection.fisheye import _quat_to_matrix
from heal_swin_tpu.utils import image as I


def get_foreground_mask(data: np.ndarray, background_val=float("nan")) -> np.ndarray:
    """Boolean foreground mask (reference depth_utils.py:609-626)."""
    if isinstance(background_val, (tuple, list)):
        masks = [get_foreground_mask(data, b) for b in background_val]
        return np.all(np.stack(masks), axis=0)
    if isinstance(background_val, float) and np.isnan(background_val):
        return ~np.isnan(data)
    if isinstance(background_val, float) and np.isinf(background_val):
        return ~np.isinf(data)
    return data != background_val


def get_ray_angles(data, cal_info: Dict, nside=8, hp_data=False, base_pix=8,
                   rotate_pole=False) -> Tuple[np.ndarray, np.ndarray]:
    """(theta, phi) per element of a flat (..., H, W) or HP (..., npix) map
    (reference depth_utils.py:399-430)."""
    if not hp_data:
        H, W = data.shape[-2], data.shape[-1]
        u, v = fisheye.get_uv_from_hw(H, W, (H, W))
        theta, phi = fisheye.project_img_points_to_s2(
            u, v, cal_info, rotate_pole, used_size=(H, W)
        )
        return theta, phi
    return fisheye.hp_grid_angles(nside, base_pix)


def create_point_cloud_from_depth_mask(
    data: np.ndarray,
    cal_info: Dict,
    nside: int = 256,
    hp_data: bool = False,
    base_pix: int = 8,
    rotate_pole: bool = False,
    background_val=float("nan"),
) -> Tuple[np.ndarray, np.ndarray]:
    """data: (N, H, W) flat or (N, npix) HP depth maps -> ((N, P, 3) point cloud,
    (N, P) foreground mask); points = depth * ray direction, rotated by the extrinsic
    quaternion (reference depth_utils.py:465-539)."""
    data = np.asarray(data, dtype=np.float64)
    fg = get_foreground_mask(data, background_val)
    theta, phi = get_ray_angles(data, cal_info, nside, hp_data, base_pix, rotate_pole)
    x = np.sin(theta) * np.cos(phi)
    y = np.sin(theta) * np.sin(phi)
    z = np.cos(theta)
    dirs = np.stack([x, y, z], axis=-1)  # (..., 3)
    pc = data[..., None] * dirs  # (N, ..., 3)
    pc = pc.reshape(data.shape[0], -1, 3)
    fg = fg.reshape(data.shape[0], -1)
    rot = _quat_to_matrix(cal_info["extrinsic"]["quaternion"])
    pc = pc @ rot.T
    return pc, fg


def mask_flat_with_hp_cutout(
    flat_data: np.ndarray,
    cal_info: Dict,
    base_pix: int = 8,
    nside: int = 256,
    rotate_pole: bool = False,
    masking_val=float("nan"),
) -> np.ndarray:
    """Set flat pixels outside the HP footprint to masking_val by round-tripping an
    all-ones mask through the HP grid (reference depth_utils.py:542-606)."""
    data = np.array(flat_data, dtype=np.float64)
    squeeze = data.ndim == 2
    if squeeze:
        data = data[None]

    theta, phi = fisheye.hp_grid_angles(nside, base_pix)
    u, v = fisheye.project_s2_points_to_img(theta, phi, cal_info, rotate_pole)
    ones = np.ones_like(data)
    hp_ones = fisheye.sample_bilinear(ones, v, u).astype(np.float32).squeeze()
    back = fisheye.project_hp_depth_back(
        hp_ones, cal_info, 1.0, rotate_pole, nside, base_pix, s2_bkgd_class=-1
    )
    mask = back == -1  # (1, H, W)
    if mask.shape[-2:] != data.shape[-2:]:
        mask = I.resize_nearest(mask.astype(np.uint8), data.shape[-2:]).astype(bool)
    data[np.broadcast_to(mask, data.shape)] = masking_val
    return data[0] if squeeze else data


def get_ranged_mse_maps(pred, target, ranges):
    """Per-range MSE painted onto the target's support (reference depth_utils.py:19-57).
    ranges: list of (lo, hi)."""
    out = np.full_like(np.asarray(target, dtype=np.float64), np.nan)
    for lo, hi in ranges:
        inds = (lo <= target) & (target < hi) & ~np.isnan(target)
        if inds.any():
            d = pred[inds] - target[inds]
            finite = np.isfinite(d)
            if finite.any():
                out[inds] = float(np.mean(d[finite] ** 2))
    return out


def create_ranged_mse_mask(metric_dict, prediction, target) -> np.ndarray:
    """Per-distance-band MSE painted onto the target's support (reference
    depth_utils.py:19-57): every DepthRangeMSE in ``metric_dict`` contributes one band.
    prediction: (N, C, ...) pred (channel 0 = depths); target: (...) depth map."""
    from heal_swin_tpu.evaluation import depth_metrics_np as dm

    target = np.asarray(target, dtype=np.float64)
    out = np.full_like(target, np.nan, dtype=np.float32)
    for metric in metric_dict.values():
        if not isinstance(metric, dm.DepthRangeMSE):
            continue
        lo, hi = metric.distance_range
        inds = (lo <= target) & (target < hi) & ~np.isnan(target)
        fresh = dm.DepthRangeMSE((lo, hi))
        fresh.update(prediction, target)
        out[inds] = np.float32(fresh.compute())
    return out


def _safe_log(x):
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.log(np.asarray(x, dtype=np.float64))


def _two_slope(vmin, vmax):
    from matplotlib import colors

    vmin = min(float(vmin), -1e-5)
    vmax = max(float(vmax), 1e-5)
    return colors.TwoSlopeNorm(vmin=vmin, vcenter=0.0, vmax=vmax)


def save_depth_pred_comparison_image(
    pred_dist,
    original_ground_truth,
    ground_truth_after_transforms,
    img,
    filepath,
    metric_dict: Optional[Dict] = None,
    std: Optional[np.ndarray] = None,
    ranged_mse_map: Optional[np.ndarray] = None,
    title: str = "",
):
    """Full 4x4 depth comparison figure (reference depth_utils.py:196-396):
    row 0: image | ranged MSE | log ranged MSE | log(retransformed gt / original gt);
    row 1: gt | pred | diff (diverging) | diff zoomed to +-0.5 m;
    row 2: log gt | log pred | log |diff| | zoomed log |diff|;
    row 3: predicted std (uncertainty head) when given.
    All depth maps are 2-D arrays at the same resolution; img is (3, H, W) or (H, W, 3)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from heal_swin_tpu.evaluation import depth_metrics_np as dm

    pred = np.asarray(pred_dist, dtype=np.float64)
    og_gt = np.asarray(original_ground_truth, dtype=np.float64).copy()
    gt = np.asarray(ground_truth_after_transforms, dtype=np.float64).copy()
    og_gt[np.isinf(og_gt)] = np.nan
    gt[np.isinf(gt)] = np.nan

    im = np.asarray(img)
    if im.ndim == 3 and im.shape[0] == 3 and im.shape[-1] != 3:
        im = im.transpose(1, 2, 0)
    if im.dtype != np.uint8:
        im = np.asarray(im, dtype=np.float64)
        if im.size and not ((0 <= im) & (im <= 1)).all():
            im = np.clip(im / 255.0, 0, 1)

    og_gt_retr_gt = dm.DepthMSE()(og_gt[None, None], gt[None]) if og_gt.shape == gt.shape \
        else float("nan")

    diff = pred - gt
    rel = np.isfinite(diff)

    if ranged_mse_map is None:
        on_rescaled = True
        ranged_mse_map = create_ranged_mse_mask(metric_dict or {}, pred[None, None], gt)
    else:
        on_rescaled = False
        ranged_mse_map = np.asarray(ranged_mse_map, dtype=np.float64)
        if ranged_mse_map.shape != pred.shape:
            ranged_mse_map = I.resize_nearest(ranged_mse_map[None], pred.shape)[0]

    with np.errstate(divide="ignore", invalid="ignore"):
        quotient_gts = _safe_log(gt / og_gt) if og_gt.shape == gt.shape \
            else np.full_like(gt, np.nan)
    q_ok = np.isfinite(quotient_gts)
    quotient_norm = _two_slope(
        quotient_gts[q_ok].min() if q_ok.any() else -1e-5,
        quotient_gts[q_ok].max() if q_ok.any() else 1e-5,
    )
    diff_norm = _two_slope(
        diff[rel].min() if rel.any() else -0.01, diff[rel].max() if rel.any() else 0.01
    )
    zoom_norm = _two_slope(-0.5, 0.5)

    log_gt = _safe_log(gt)
    log_pred = _safe_log(pred)
    log_abs_diff = _safe_log(np.abs(diff))
    if rel.any():
        log_vmin = min(np.nanmin(log_gt[rel]), np.nanmin(log_pred[rel]))
        log_vmax = max(np.nanmax(log_gt[rel]), np.nanmax(log_pred[rel]))
        lad = log_abs_diff[rel & np.isfinite(log_abs_diff)]
        log_zoom = (lad.min() if lad.size else -10.0, np.log(0.5))
    else:
        log_vmin, log_vmax, log_zoom = 0.0, 1.0, (-10.0, np.log(0.5))

    mask_cmap, diff_cmap = "Greys_r", "seismic"
    fig, ax = plt.subplots(nrows=4, ncols=4, figsize=(30, 20))

    ax[0, 0].imshow(im)
    p01 = ax[0, 1].imshow(ranged_mse_map)
    p02 = ax[0, 2].imshow(_safe_log(ranged_mse_map))
    p03 = ax[0, 3].imshow(quotient_gts, norm=quotient_norm, cmap=diff_cmap)

    p10 = ax[1, 0].imshow(gt, cmap=mask_cmap)
    p11 = ax[1, 1].imshow(pred, cmap=mask_cmap)
    p12 = ax[1, 2].imshow(diff, norm=diff_norm, cmap=diff_cmap)
    p13 = ax[1, 3].imshow(diff, norm=zoom_norm, cmap=diff_cmap)

    p20 = ax[2, 0].imshow(log_gt, vmin=log_vmin, vmax=log_vmax, cmap=mask_cmap)
    p21 = ax[2, 1].imshow(log_pred, vmin=log_vmin, vmax=log_vmax, cmap=mask_cmap)
    p22 = ax[2, 2].imshow(log_abs_diff, cmap=mask_cmap)
    p23 = ax[2, 3].imshow(log_abs_diff, vmin=log_zoom[0], vmax=log_zoom[1], cmap=mask_cmap)

    ax[0, 0].set_title("img")
    ax[0, 1].set_title(f"ranged mse, computed on rescaled {on_rescaled}")
    ax[0, 2].set_title(f"log(ranged mse), computed on rescaled {on_rescaled}")
    ax[0, 3].set_title(f"log(retransf gt/og gt), mse={og_gt_retr_gt:.4f}")
    ax[1, 0].set_title("gt")
    ax[1, 1].set_title("pred")
    ax[1, 2].set_title("diff")
    ax[1, 3].set_title("zoomed diff")
    ax[2, 0].set_title("log gt")
    ax[2, 1].set_title("log pred")
    ax[2, 2].set_title("log abs diff")
    ax[2, 3].set_title("zoomed log abs diff")

    if std is not None:
        p30 = ax[3, 0].imshow(np.asarray(std, dtype=np.float64), cmap=mask_cmap)
        plt.colorbar(p30, ax=ax[3, 0])
        ax[3, 0].set_title("std")

    for a in ax.reshape(-1):
        a.set_axis_off()

    for p, a in [(p01, ax[0, 1]), (p02, ax[0, 2]), (p03, ax[0, 3]), (p10, ax[1, 0]),
                 (p11, ax[1, 1]), (p12, ax[1, 2]), (p13, ax[1, 3]), (p20, ax[2, 0]),
                 (p21, ax[2, 1]), (p22, ax[2, 2]), (p23, ax[2, 3])]:
        plt.colorbar(p, ax=a)
    if title:
        fig.suptitle(title, fontsize=12)
    fig.savefig(filepath)
    plt.close(fig)


def _fade_colors(pc: np.ndarray, base_rgb) -> np.ndarray:
    """Distance-faded RGBA scatter colors (reference hp_depth_pred_writers.py:1046-1066):
    color = base * (1 - |p|/max), alpha = 1 - |p|/max."""
    norms = np.linalg.norm(np.asarray(pc, dtype=np.float64), axis=-1).reshape(-1)
    finite = norms[np.isfinite(norms)]
    nmax = finite.max() if finite.size else 1.0
    frac = np.where(np.isfinite(norms), norms / max(nmax, 1e-12), 1.0)
    frac = np.clip(frac, 0.0, 1.0)[:, None]
    rgb = np.asarray(base_rgb, dtype=np.float64)[None] * (1.0 - frac)
    return np.hstack([rgb, 1.0 - frac])


_PLANE_AXES = ["x", "y", "z"]


def save_point_cloud_plane_scatters(pred_pc, gt_pc, output_dir, file_name_base,
                                    gt_label="gt", pred_label="pred"):
    """Three scatter figures (XY/YZ/ZX planes) of gt (green) vs pred (blue) point
    clouds with distance-faded colors (reference hp_depth_pred_writers.py:1044-1097 /
    flat_depth_pred_writers.py:745-797).  pred_pc/gt_pc: (P, 3) arrays.  Returns the
    written paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pred_pc = np.asarray(pred_pc, dtype=np.float64).reshape(-1, 3)
    gt_pc = np.asarray(gt_pc, dtype=np.float64).reshape(-1, 3)
    c_pred = _fade_colors(pred_pc, (0.0, 0.0, 1.0))
    c_gt = _fade_colors(gt_pc, (0.0, 1.0, 0.0))
    paths = []
    for ind in range(3):
        a, b = ind % 3, (ind + 1) % 3
        plane = (_PLANE_AXES[a] + _PLANE_AXES[b]).upper()
        fig, ax = plt.subplots(figsize=(20, 20))
        ax.scatter(gt_pc[:, a], gt_pc[:, b], s=1, c=c_gt, label=gt_label)
        ax.scatter(pred_pc[:, a], pred_pc[:, b], s=1, c=c_pred, label=pred_label)
        ax.set_title(plane + " plane")
        ax.set_xlabel(_PLANE_AXES[a])
        ax.set_ylabel(_PLANE_AXES[b])
        ax.axis("equal")
        ax.legend()
        path = os.path.join(output_dir, f"{file_name_base}_{plane}_plane.png")
        fig.savefig(path)
        plt.close(fig)
        paths.append(path)
    return paths


def save_point_cloud_gt_vs_pred_panels(log_gt_map, log_pred_map, log_gt_pc, log_pred_pc,
                                       gt_pc, pred_pc, c_img, output_dir, file_name_base):
    """Three 3x2 panel figures (one per plane): log gt/pred depth maps (imshow with
    colorbars) over log-space and linear point-cloud scatters colored by the camera
    image (reference hp_depth_pred_writers.py:1155-1225 /
    flat_depth_pred_writers.py:833-905).  Maps are 2-D LOG depth images; pcs (P, 3);
    c_img (P, 3) RGB in [0, 1].  Returns the written paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    log_gt_pc = np.asarray(log_gt_pc, dtype=np.float64).reshape(-1, 3)
    log_pred_pc = np.asarray(log_pred_pc, dtype=np.float64).reshape(-1, 3)
    gt_pc = np.asarray(gt_pc, dtype=np.float64).reshape(-1, 3)
    pred_pc = np.asarray(pred_pc, dtype=np.float64).reshape(-1, 3)
    c_img = np.clip(np.asarray(c_img, dtype=np.float64).reshape(-1, 3), 0.0, 1.0)
    paths = []
    for ind in range(3):
        a, b = ind % 3, (ind + 1) % 3
        plane = (_PLANE_AXES[a] + _PLANE_AXES[b]).upper()
        fig, ax = plt.subplots(3, 2, figsize=(30, 20))
        m0 = ax[0, 0].imshow(np.asarray(log_gt_map, dtype=np.float64))
        ax[0, 0].set_title("log gt mask")
        m1 = ax[0, 1].imshow(np.asarray(log_pred_map, dtype=np.float64))
        ax[0, 1].set_title("log prediction")
        plt.colorbar(m0, ax=ax[0, 0])
        plt.colorbar(m1, ax=ax[0, 1])
        ax[0, 0].set_axis_off()
        ax[0, 1].set_axis_off()
        for row, (g, p) in enumerate([(log_gt_pc, log_pred_pc), (gt_pc, pred_pc)],
                                     start=1):
            pre = "log " if row == 1 else ""
            ax[row, 0].scatter(g[:, a], g[:, b], s=1, c=c_img, label="gt")
            ax[row, 0].set_title(f"{pre}gt pc in {plane} plane")
            ax[row, 1].scatter(p[:, a], p[:, b], s=1, c=c_img, label="pred")
            ax[row, 1].set_title(f"{pre}pred pc in {plane} plane")
            for col in (0, 1):
                ax[row, col].set_xlabel(_PLANE_AXES[a])
                ax[row, col].set_ylabel(_PLANE_AXES[b])
                ax[row, col].axis("equal")
        path = os.path.join(output_dir, f"{file_name_base}_{plane}_plane_gt_vs_pred.png")
        fig.savefig(path)
        plt.close(fig)
        paths.append(path)
    return paths
