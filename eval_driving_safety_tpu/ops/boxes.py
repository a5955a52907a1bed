"""Axis-aligned box ops: IoU, Faster-R-CNN deltas, stereo 6-coord deltas, clip.

Pure JAX, static shapes, jit/grad-safe. Replaces the reference's
`bbox_transform_inv` / `clip_boxes` torch utilities
(/root/reference/attack/Stereo-RCNN/predict_and_save_pgd.py:25-28,219-231)
and the numpy box math inside its proposal/anchor-target layers.

Box layout: [x1, y1, x2, y2], inclusive corners (width = x2 - x1 + 1,
the legacy Faster R-CNN convention used by the reference stack).
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def box_wh(boxes):
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    return w, h


def box_area(boxes):
    w, h = box_wh(boxes)
    return jnp.maximum(w, 0.0) * jnp.maximum(h, 0.0)


def pairwise_iou(boxes_a, boxes_b):
    """(N,4),(M,4) -> (N,M) IoU with +1 width convention."""
    a = boxes_a[:, None, :]
    b = boxes_b[None, :, :]
    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])
    iw = jnp.maximum(x2 - x1 + 1.0, 0.0)
    ih = jnp.maximum(y2 - y1 + 1.0, 0.0)
    inter = iw * ih
    union = box_area(boxes_a)[:, None] + box_area(boxes_b)[None, :] - inter
    return inter / jnp.maximum(union, EPS)


def encode_boxes(anchors, gt):
    """Anchor -> gt regression targets (dx, dy, dw, dh)."""
    aw, ah = box_wh(anchors)
    acx = anchors[..., 0] + 0.5 * (aw - 1.0)
    acy = anchors[..., 1] + 0.5 * (ah - 1.0)
    gw, gh = box_wh(gt)
    gcx = gt[..., 0] + 0.5 * (gw - 1.0)
    gcy = gt[..., 1] + 0.5 * (gh - 1.0)
    dx = (gcx - acx) / jnp.maximum(aw, EPS)
    dy = (gcy - acy) / jnp.maximum(ah, EPS)
    dw = jnp.log(jnp.maximum(gw, 1.0) / jnp.maximum(aw, EPS))
    dh = jnp.log(jnp.maximum(gh, 1.0) / jnp.maximum(ah, EPS))
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(anchors, deltas):
    """Apply (dx, dy, dw, dh) deltas to anchors -> boxes."""
    aw, ah = box_wh(anchors)
    acx = anchors[..., 0] + 0.5 * (aw - 1.0)
    acy = anchors[..., 1] + 0.5 * (ah - 1.0)
    cx = deltas[..., 0] * aw + acx
    cy = deltas[..., 1] * ah + acy
    w = jnp.exp(jnp.clip(deltas[..., 2], -10.0, 4.0)) * aw
    h = jnp.exp(jnp.clip(deltas[..., 3], -10.0, 4.0)) * ah
    return jnp.stack([cx - 0.5 * (w - 1.0), cy - 0.5 * (h - 1.0),
                      cx + 0.5 * (w - 1.0), cy + 0.5 * (h - 1.0)], axis=-1)


def encode_stereo_boxes(anchors, gt_left, gt_right):
    """Joint 6-coord stereo targets [dxl, dy, dwl, dh, dxr, dwr].

    Layout mirrors the reference's concatenation
    (/root/reference/attack/Stereo-RCNN/stereo_rpn.py:124-127: cols 0-3 =
    left (dx,dy,dw,dh), col 4 = right dx, col 5 = right dw).
    """
    left = encode_boxes(anchors, gt_left)
    right = encode_boxes(anchors, gt_right)
    return jnp.concatenate(
        [left, right[..., 0:1], right[..., 2:3]], axis=-1)


def decode_stereo_boxes(anchors, deltas6):
    """Inverse of `encode_stereo_boxes` -> (left_boxes, right_boxes).

    Right boxes share y-extent with left (rectified stereo).
    """
    left = decode_boxes(anchors, deltas6[..., :4])
    right_deltas = jnp.stack(
        [deltas6[..., 4], deltas6[..., 1], deltas6[..., 5], deltas6[..., 3]],
        axis=-1)
    right = decode_boxes(anchors, right_deltas)
    right = right.at[..., 1].set(left[..., 1]).at[..., 3].set(left[..., 3])
    return left, right


def clip_boxes(boxes, height, width):
    """Clamp boxes to image bounds [0, W-1] x [0, H-1]."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width - 1.0)
    y1 = jnp.clip(boxes[..., 1], 0.0, height - 1.0)
    x2 = jnp.clip(boxes[..., 2], 0.0, width - 1.0)
    y2 = jnp.clip(boxes[..., 3], 0.0, height - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def union_boxes(left, right):
    """Merged left/right box (the reference's gt_boxes_merge)."""
    return jnp.stack([
        jnp.minimum(left[..., 0], right[..., 0]),
        jnp.minimum(left[..., 1], right[..., 1]),
        jnp.maximum(left[..., 2], right[..., 2]),
        jnp.maximum(left[..., 3], right[..., 3]),
    ], axis=-1)


def smooth_l1(diff, sigma: float = 1.0):
    """Elementwise smooth-L1 with the Faster-R-CNN sigma convention."""
    s2 = sigma * sigma
    absd = jnp.abs(diff)
    return jnp.where(absd < 1.0 / s2, 0.5 * s2 * diff * diff, absd - 0.5 / s2)
