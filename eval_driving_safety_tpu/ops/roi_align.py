"""ROIAlign as vectorized bilinear gathers — TPU-native, static shapes.

Replaces the C++/CUDA `model.roi_layers.ROIAlign` extension
(/root/reference/attack/Stereo-RCNN/stereo_rcnn.py:18,44-45,132-134) with
torchvision-compatible semantics (aligned=False, fixed sampling ratio),
fully differentiable so attack gradients flow through ROI pooling to the
input pixels.

Features are NHWC. ROIs are (N, 5): [batch_idx, x1, y1, x2, y2] in image
coordinates.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear_sample(feat, ys, xs):
    """Sample (H,W,C) at float coords; torchvision ROIAlign border semantics.

    Points with y < -1 or y > H (resp. x) produce 0; in-range coords are
    clamped to the valid grid.
    """
    h, w = feat.shape[0], feat.shape[1]
    oob = (ys < -1.0) | (ys > h * 1.0) | (xs < -1.0) | (xs > w * 1.0)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1 = jnp.minimum(y0 + 1.0, h - 1.0)
    x1 = jnp.minimum(x0 + 1.0, w - 1.0)
    ly = ys - y0
    lx = xs - x0
    hy = 1.0 - ly
    hx = 1.0 - lx
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    v00 = feat[y0i, x0i]
    v01 = feat[y0i, x1i]
    v10 = feat[y1i, x0i]
    v11 = feat[y1i, x1i]
    out = (v00 * (hy * hx)[..., None] + v01 * (hy * lx)[..., None]
           + v10 * (ly * hx)[..., None] + v11 * (ly * lx)[..., None])
    return jnp.where(oob[..., None], 0.0, out)


def roi_align(feat, rois, output_size: int, spatial_scale: float,
              sampling_ratio: int = 2):
    """ROIAlign. feat (B,H,W,C), rois (N,5) -> (N, P, P, C)."""
    p = output_size
    s = sampling_ratio

    def one_roi(roi):
        b = roi[0].astype(jnp.int32)
        fmap = jnp.take(feat, b, axis=0)  # (H,W,C)
        x1 = roi[1] * spatial_scale
        y1 = roi[2] * spatial_scale
        x2 = roi[3] * spatial_scale
        y2 = roi[4] * spatial_scale
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        bin_w = roi_w / p
        bin_h = roi_h / p
        # sample grid: (p*s) points per axis
        iy = (jnp.arange(p * s) + 0.5) / s  # in bin units
        ys = y1 + iy * bin_h
        xs = x1 + iy * bin_w
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")  # (p*s, p*s)
        vals = _bilinear_sample(fmap, yy, xx)  # (p*s, p*s, C)
        # average-pool s x s samples per bin
        c = vals.shape[-1]
        vals = vals.reshape(p, s, p, s, c)
        return vals.mean(axis=(1, 3))

    return jax.vmap(one_roi)(rois)


def roi_levels(rois, k0: float = 4.0, canonical: float = 224.0,
               lmin: int = 2, lmax: int = 5):
    """FPN level per ROI.

    NOTE: matches the reference's (quirky) natural-log rule
    `round(ln(sqrt(h*w)/224) + 4)` clamped to [2,5]
    (/root/reference/attack/Stereo-RCNN/stereo_rcnn.py:113-119) rather than
    the usual log2 rule.
    """
    h = rois[:, 4] - rois[:, 2] + 1.0
    w = rois[:, 3] - rois[:, 1] + 1.0
    lvl = jnp.round(jnp.log(jnp.sqrt(jnp.maximum(h * w, 1.0)) / canonical) + k0)
    return jnp.clip(lvl, lmin, lmax).astype(jnp.int32)


def pyramid_roi_align(feats: Sequence, rois, output_size: int,
                      strides: Sequence[int] = (4, 8, 16, 32),
                      sampling_ratio: int = 2):
    """Pyramid ROIAlign over p2..p5 with static shapes.

    Every ROI is aligned against all 4 levels and the right level selected
    with a mask — O(4x) compute but zero dynamic shapes, the TPU-native
    replacement for the reference's boolean-index routing
    (/root/reference/attack/Stereo-RCNN/stereo_rcnn.py:121-139).
    """
    lvls = roi_levels(rois)  # values in [2,5]
    out = None
    for i, (feat, stride) in enumerate(zip(feats, strides)):
        pooled = roi_align(feat, rois, output_size, 1.0 / stride,
                           sampling_ratio)
        sel = (lvls == (i + 2)).astype(pooled.dtype)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out
