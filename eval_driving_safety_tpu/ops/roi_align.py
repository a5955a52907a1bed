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

import jax.numpy as jnp


def roi_align(feat, rois, output_size: int, spatial_scale: float,
              sampling_ratio: int = 2):
    """ROIAlign. feat (B,H,W,C), rois (N,5) -> (N, P, P, C).

    Implemented as ONE batched gather over (batch_idx, y, x) index arrays —
    never materializes a per-roi copy of the feature map (a vmapped
    `take(feat, b)` would broadcast the full map N times: 23 GB for 300
    rois on a stride-4 FPN level).
    """
    p = output_size
    s = sampling_ratio
    h, w = feat.shape[1], feat.shape[2]
    b = rois[:, 0].astype(jnp.int32)                    # (N,)
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = rois[:, 3] * spatial_scale
    y2 = rois[:, 4] * spatial_scale
    bin_w = jnp.maximum(x2 - x1, 1.0) / p
    bin_h = jnp.maximum(y2 - y1, 1.0) / p
    iy = (jnp.arange(p * s) + 0.5) / s                  # (P,) in bin units
    ys = y1[:, None] + iy[None, :] * bin_h[:, None]     # (N, P)
    xs = x1[:, None] + iy[None, :] * bin_w[:, None]
    yy = ys[:, :, None]                                 # (N, P, 1)
    xx = xs[:, None, :]                                 # (N, 1, P)

    oob = ((yy < -1.0) | (yy > h * 1.0) | (xx < -1.0) | (xx > w * 1.0))
    yc = jnp.clip(yy, 0.0, h - 1.0)
    xc = jnp.clip(xx, 0.0, w - 1.0)
    y0 = jnp.floor(yc)
    x0 = jnp.floor(xc)
    ly = (yc - y0)
    lx = (xc - x0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    bi = b[:, None, None]

    def g(yi, xi):
        yi, xi = jnp.broadcast_arrays(yi, xi)
        return feat[jnp.broadcast_to(bi, yi.shape), yi, xi]   # (N,P,P,C)

    hy, hx = 1.0 - ly, 1.0 - lx
    vals = (g(y0i, x0i) * (hy * hx)[..., None]
            + g(y0i, x1i) * (hy * lx)[..., None]
            + g(y1i, x0i) * (ly * hx)[..., None]
            + g(y1i, x1i) * (ly * lx)[..., None])
    vals = jnp.where(jnp.broadcast_to(oob, vals.shape[:3])[..., None],
                     0.0, vals)
    n, c = rois.shape[0], feat.shape[-1]
    return vals.reshape(n, p, s, p, s, c).mean(axis=(2, 4))


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
