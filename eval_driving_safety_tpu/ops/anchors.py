"""Anchor generation for the FPN stereo RPN.

Replaces the reference's external `generate_anchors` + per-level shifting in
`_ProposalLayer`/`_AnchorTargetLayer`
(/root/reference/attack/Stereo-RCNN/stereo_rpn.py:43-46). One scale x 3
ratios per pyramid level (stereo_rpn.py:35 — `nc_score_out = 3*2`).

All anchors for all levels are generated once (static shapes) and
concatenated in the same level-major, row-major, anchor-minor order as the
RPN head flattens its predictions.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import numpy as np


def base_anchors(scale: float, ratios: Sequence[float]) -> np.ndarray:
    """(A,4) centered anchors with +1 width convention, area preserved per ratio."""
    out = []
    area = scale * scale
    for r in ratios:
        w = np.round(np.sqrt(area / r))
        h = np.round(w * r)
        out.append([-(w - 1) / 2.0, -(h - 1) / 2.0, (w - 1) / 2.0, (h - 1) / 2.0])
    return np.asarray(out, dtype=np.float32)


@lru_cache(maxsize=16)
def pyramid_anchors(feat_shapes: Tuple[Tuple[int, int], ...],
                    strides: Tuple[int, ...],
                    scales: Tuple[float, ...],
                    ratios: Tuple[float, ...]) -> np.ndarray:
    """All anchors over an FPN, shape (sum_l H_l*W_l*A, 4).

    Flattening order per level is (row, col, anchor) to match a head output
    of shape (H, W, A*k) reshaped to (H*W*A, k).
    """
    all_levels = []
    for (h, w), stride, scale in zip(feat_shapes, strides, scales):
        base = base_anchors(scale, ratios)  # (A,4)
        xs = (np.arange(w, dtype=np.float32) + 0.5) * stride - 0.5
        ys = (np.arange(h, dtype=np.float32) + 0.5) * stride - 0.5
        shift_x, shift_y = np.meshgrid(xs, ys)  # (h,w)
        shifts = np.stack([shift_x, shift_y, shift_x, shift_y], axis=-1)  # (h,w,4)
        anc = shifts[:, :, None, :] + base[None, None, :, :]  # (h,w,A,4)
        all_levels.append(anc.reshape(-1, 4))
    return np.concatenate(all_levels, axis=0)


def fpn_feat_shapes(height: int, width: int,
                    strides: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    return tuple((int(np.ceil(height / s)), int(np.ceil(width / s)))
                 for s in strides)
