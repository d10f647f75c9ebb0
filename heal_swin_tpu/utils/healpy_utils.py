"""Visualization of (partial) HEALPix maps — healpy.visufunc replacement
(reference heal_swin/utils/healpy_utils.py; the reference's callers hit a
plot_hp_img-vs-plot_healpy_img name bug, SURVEY.md §7.4 — both names work here)."""

from __future__ import annotations

import numpy as np

from heal_swin_tpu.ops import healpix as hpx


def _project_points(theta, phi, projection):
    if projection in ("mollweide", "mollview"):
        lam = np.where(phi > np.pi, phi - 2 * np.pi, phi)
        lat = np.pi / 2 - theta
        t = lat.copy()
        for _ in range(10):  # Newton iterations for the Mollweide auxiliary angle
            denom = 2 + 2 * np.cos(2 * t)
            t = t - (2 * t + np.sin(2 * t) - np.pi * np.sin(lat)) / np.where(
                denom == 0, 1, denom
            )
        x = 2 * np.sqrt(2) / np.pi * lam * np.cos(t)
        y = np.sqrt(2) * np.sin(t)
        visible = np.ones_like(x, dtype=bool)
    elif projection == "orthview":
        # view from +z (the pole the fisheye FoV surrounds)
        x = np.sin(theta) * np.cos(phi)
        y = np.sin(theta) * np.sin(phi)
        visible = np.cos(theta) > -0.05
    elif projection == "cartview":
        # equirectangular: longitude vs latitude (healpy.visufunc.cartview)
        x = np.where(phi > np.pi, phi - 2 * np.pi, phi)
        y = np.pi / 2 - theta
        visible = np.ones_like(x, dtype=bool)
    else:
        raise ValueError(f"unknown projection: {projection}")
    return x, y, visible


def plot_healpy_img(img, npix, save_path, projection="mollweide", n_colors=12, title=""):
    """Plot a partial HP map: ``img`` is (npix_used,) scalar or (3, npix_used) RGB in
    nested ordering (the first npix_used pixels of an nside derived from ``npix``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.asarray(img)
    nside = hpx.npix2nside(npix)
    npix_used = img.shape[-1]
    theta, phi = hpx.pix2ang(nside, np.arange(npix_used), nest=True)
    x, y, vis = _project_points(theta, phi, projection)

    fig, ax = plt.subplots(figsize=(8, 6 if projection == "orthview" else 4))
    if img.ndim == 2:  # RGB
        colors = np.clip(img.T / 255.0, 0, 1)
        ax.scatter(x[vis], y[vis], c=colors[vis], s=1.2, linewidths=0)
    else:
        sc = ax.scatter(x[vis], y[vis], c=img[vis], s=1.2, linewidths=0, cmap="viridis")
        fig.colorbar(sc, ax=ax, shrink=0.7)
    ax.set_aspect("equal")
    ax.set_axis_off()
    if title:
        ax.set_title(title, fontsize=9)
    fig.savefig(save_path, bbox_inches="tight", dpi=120)
    plt.close(fig)


# the name the reference's callers use (project_on_s2.py:380)
plot_hp_img = plot_healpy_img
