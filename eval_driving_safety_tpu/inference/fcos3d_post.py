"""FCOS3D-style postprocessor for DSGN BEV head outputs.

Capability parity: the external `make_fcos3d_postprocessor` consumed at
/root/reference/attack/DSGN/predict_and_save_pgd.py:29,192-197 — score
threshold, rotated BEV NMS, decoding to 3D boxes, and the KITTI writer
contract (class, alpha = -atan2(x, z) + ry, 2D bbox from projected corners,
h/w/l, bottom-center location, ry, score —
predict_and_save_pgd.py:250-284).

TPU-first: fixed-size top-k + masked rotated NMS inside jit; only the final
(max_detections, ...) arrays cross to the host for txt export.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eval_driving_safety_tpu.config import DSGNConfig
from eval_driving_safety_tpu.models.rpn3d_loss import bev_cell_centers
from eval_driving_safety_tpu.ops.nms import rotated_nms


class Detections3D(NamedTuple):
    """Fixed-size per-image detections (device arrays)."""
    boxes3d: jnp.ndarray   # (B, K, 7) [x, y_bottom, z, h, w, l, ry]
    scores: jnp.ndarray    # (B, K)
    classes: jnp.ndarray   # (B, K) int, 0-based
    valid: jnp.ndarray     # (B, K) bool


def decode_bev_outputs(outputs: Dict, cfg: DSGNConfig,
                       pre_nms_top_k: int = 256) -> Detections3D:
    """cls (B,Z,X,C) + reg (B,Z,X,8) + centerness (B,Z,X) -> NMS'd boxes."""
    zz, xx = bev_cell_centers(cfg)
    cls_logits = outputs["bbox_cls"]
    reg = outputs["bbox_reg"]
    ctr = outputs["bbox_centerness"]
    scores_map = jax.nn.sigmoid(cls_logits) * \
        jax.nn.sigmoid(ctr)[..., None]                  # (B, Z, X, C)

    def per_image(smap, r):
        flat_scores = smap.reshape(-1)                  # (Z*X*C,)
        top_s, top_i = jax.lax.top_k(flat_scores, pre_nms_top_k)
        c = smap.shape[-1]
        cell = top_i // c
        klass = top_i % c
        rf = r.reshape(-1, 8)[cell]
        cx = xx.reshape(-1)[cell] + rf[:, 0]
        cz = zz.reshape(-1)[cell] + rf[:, 1]
        cy = rf[:, 2]
        h = jnp.exp(rf[:, 3])
        w = jnp.exp(rf[:, 4])
        l = jnp.exp(rf[:, 5])
        ry = jnp.arctan2(rf[:, 6], rf[:, 7])
        ok = top_s > cfg.score_thresh
        # KITTI ry -> rotated-op angle is NEGATED (ops.rotated.kitti_bev_box5)
        bev5 = jnp.stack([cx, cz, w, l, -ry], axis=-1)
        keep, keep_mask = rotated_nms(bev5, top_s, cfg.max_detections,
                                      cfg.nms_thresh, valid=ok)
        b7 = jnp.stack([cx, cy, cz, h, w, l, ry], axis=-1)[keep]
        return b7, top_s[keep], klass[keep], keep_mask & ok[keep]

    b7, s, k, v = jax.vmap(per_image)(scores_map, reg)
    return Detections3D(b7, s, k, v)


def box3d_corners(box7: np.ndarray) -> np.ndarray:
    """8 corners (camera frame) of [x, y_bottom, z, h, w, l, ry] — one
    shared KITTI corner convention (ops.box_solver._box_corners_cam)."""
    from eval_driving_safety_tpu.ops.box_solver import _box_corners_cam
    x, y, z, h, w, l, ry = box7
    return _box_corners_cam(x, y, z, (h, w, l), ry)


def detections_to_kitti(dets: Detections3D, calib, image_hw,
                        class_names=("Car",)) -> list:
    """One image's Detections3D row -> list of dicts for
    `data.kitti.write_detections` (2D box = projected 3D corners clipped
    to the image, the reference's convention)."""
    out = []
    h_img, w_img = image_hw
    boxes = np.asarray(dets.boxes3d)
    scores = np.asarray(dets.scores)
    classes = np.asarray(dets.classes)
    valid = np.asarray(dets.valid)
    for i in range(boxes.shape[0]):
        if not valid[i]:
            continue
        b = boxes[i]
        corners = box3d_corners(b)
        uv = calib.project_rect_to_image(corners)
        x1, y1 = uv.min(axis=0)
        x2, y2 = uv.max(axis=0)
        bbox = np.array([max(x1, 0.0), max(y1, 0.0),
                         min(x2, w_img - 1.0), min(y2, h_img - 1.0)])
        if bbox[2] <= bbox[0] or bbox[3] <= bbox[1]:
            continue
        out.append({
            "type": class_names[int(classes[i]) % len(class_names)],
            "bbox": bbox,
            "dimensions": (float(b[3]), float(b[4]), float(b[5])),
            "location": (float(b[0]), float(b[1]), float(b[2])),
            "rotation_y": float(b[6]),
            "score": float(scores[i]),
        })
    return out
