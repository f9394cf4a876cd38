"""Environment-map importance sampling: 2D piecewise-constant pdf tables.

TPU rebuild of the reference env pdf machinery
(RenderDriverRTE_PdfTables.cpp: UpdatePdfTablesForLight builds up to 2048^2
luminance tables; clight.h:369 Map2DPiecewiseSample draws from them).
Host-side numpy builds row-marginal + per-row-conditional CDFs over
luminance x sin(theta); the device side inverts them with searchsorted.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hydracore_tpu.utils.math3d import normalize3


def build_env_pdf(img: np.ndarray | None, max_size: int = 512):
    """img: (H, W, >=3) float env texture (lat-long) or None.
    Returns (rows_cdf (H+1,), cols_cdf (H, W+1), pdf (H, W)) numpy arrays;
    trivial 1x1 uniform tables when img is None."""
    if img is None:
        return (
            np.array([0.0, 1.0], np.float32),
            np.array([[0.0, 1.0]], np.float32),
            np.ones((1, 1), np.float32),
        )
    H, W = img.shape[:2]
    if max(H, W) > max_size:  # downscale by striding (cheap, conservative)
        sy, sx = max(H // max_size, 1), max(W // max_size, 1)
        img = img[::sy, ::sx]
        H, W = img.shape[:2]
    lum = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    theta = (np.arange(H) + 0.5) / H * np.pi
    w = lum * np.sin(theta)[:, None]
    w = np.maximum(w, 1e-8)

    row_w = w.sum(axis=1)
    rows_cdf = np.concatenate([[0.0], np.cumsum(row_w / row_w.sum())]).astype(np.float32)
    rows_cdf[-1] = 1.0
    cols = w / row_w[:, None]
    cols_cdf = np.concatenate(
        [np.zeros((H, 1)), np.cumsum(cols, axis=1)], axis=1
    ).astype(np.float32)
    cols_cdf[:, -1] = 1.0

    # pdf over (u, v) in [0,1)^2 -> solid-angle pdf = pdf_uv / (2 pi^2 sin)
    pdf_uv = w / w.sum() * (H * W)
    return rows_cdf, cols_cdf, pdf_uv.astype(np.float32)


def sample_env_dir(rows_cdf, cols_cdf, pdf_uv, u1, u2):
    """Inverse-CDF sample: returns (dir (R,3), pdf_w (R,))."""
    Ht = pdf_uv.shape[0]
    Wt = pdf_uv.shape[1]
    row = jnp.clip(jnp.searchsorted(rows_cdf, u1, side="right") - 1, 0, Ht - 1)
    # re-uniformize within the row bin
    lo = rows_cdf[row]
    hi = rows_cdf[row + 1]
    fr = (u1 - lo) / jnp.maximum(hi - lo, 1e-12)
    ccdf = cols_cdf[row]  # (R, Wt+1)
    col = jnp.clip(_batched_searchsorted(ccdf, u2) - 1, 0, Wt - 1)
    lo2 = jnp.take_along_axis(ccdf, col[:, None], 1)[:, 0]
    hi2 = jnp.take_along_axis(ccdf, (col + 1)[:, None], 1)[:, 0]
    fc = (u2 - lo2) / jnp.maximum(hi2 - lo2, 1e-12)

    v = (row.astype(jnp.float32) + fr) / Ht
    u = (col.astype(jnp.float32) + fc) / Wt
    theta = v * jnp.pi
    phi = (u - 0.5) * (2.0 * jnp.pi)
    sin_t = jnp.sin(theta)
    d = jnp.stack([sin_t * jnp.sin(phi), jnp.cos(theta), -sin_t * jnp.cos(phi)], -1)
    pdf_w = pdf_uv[row, col] / jnp.maximum(2.0 * jnp.pi * jnp.pi * sin_t, 1e-8)
    return normalize3(d), pdf_w


def env_pdf_for_dir(rows_cdf, cols_cdf, pdf_uv, d):
    """Solid-angle pdf of sample_env_dir producing direction d (R,3)."""
    Ht, Wt = pdf_uv.shape
    u = 0.5 + jnp.arctan2(d[:, 0], -d[:, 2]) * (0.5 / jnp.pi)
    v = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0)) * (1.0 / jnp.pi)
    row = jnp.clip((v * Ht).astype(jnp.int32), 0, Ht - 1)
    col = jnp.clip((u * Wt).astype(jnp.int32), 0, Wt - 1)
    sin_t = jnp.sqrt(jnp.clip(1.0 - d[:, 1] ** 2, 1e-8, 1.0))
    return pdf_uv[row, col] / jnp.maximum(2.0 * jnp.pi * jnp.pi * sin_t, 1e-8)


def _batched_searchsorted(cdf_rows, u):
    """searchsorted per row: cdf_rows (R, K), u (R,) -> (R,) index."""
    return jnp.sum(cdf_rows <= u[:, None], axis=1).astype(jnp.int32)
