"""RPN3D loss: anchor-free BEV cls/reg/centerness targets + losses for DSGN.

Capability parity: the external `RPN3DLoss` the reference's attacks ascend
(/root/reference/attack/DSGN/pgd_attack.py:31,321-330) — classification,
box regression and centerness terms over the 3D detection grid, combined
with the multi-scale disparity smooth-L1 loss (weights [0.5, 0.7, 1.0],
pgd_attack.py:314-319).

TPU-first: targets are computed *inside jit* from zero-padded (G, 8) gt
arrays with validity masks — no host-side assignment, so `jax.grad` of
`dsgn_total_loss` w.r.t. the input images is a single compiled program.

gt boxes3d layout per row: [x, y_bottom, z, h, w, l, ry, class_id>=1],
padded with zeros; `num_boxes` gives the valid count per image.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from eval_driving_safety_tpu.config import DSGNConfig
from eval_driving_safety_tpu.ops.boxes import smooth_l1


def bev_cell_centers(cfg: DSGNConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Z, X) grids of BEV cell centers in camera coords (z forward, x right)."""
    xs = jnp.linspace(cfg.voxel_x_min, cfg.voxel_x_max, cfg.num_voxels_x)
    zs = jnp.linspace(cfg.voxel_z_min, cfg.voxel_z_max, cfg.num_voxels_z)
    zz, xx = jnp.meshgrid(zs, xs, indexing="ij")
    return zz, xx


class BEVTargets(NamedTuple):
    labels: jnp.ndarray       # (B, Z, X) 0 = bg, >=1 class id
    reg: jnp.ndarray          # (B, Z, X, 8)
    centerness: jnp.ndarray   # (B, Z, X) in [0, 1]
    pos_mask: jnp.ndarray     # (B, Z, X) bool


def assign_bev_targets(boxes3d, num_boxes, cfg: DSGNConfig) -> BEVTargets:
    """FCOS-style assignment: a BEV cell is positive iff its center lies
    inside a gt box's (slightly expanded) BEV rectangle; ties go to the
    smallest-footprint box. Centerness = sqrt(prod of normalized inset)."""
    zz, xx = bev_cell_centers(cfg)
    expand = cfg.centerness_radius

    def per_image(boxes, nb):
        g = boxes.shape[0]
        valid = jnp.arange(g) < nb
        bx, by, bz = boxes[:, 0], boxes[:, 1], boxes[:, 2]
        bh, bw, bl = boxes[:, 3], boxes[:, 4], boxes[:, 5]
        ry, cls_id = boxes[:, 6], boxes[:, 7]
        # cell -> box-frame coords (KITTI: ry about y; heading along +x at 0)
        dx = xx[..., None] - bx                     # (Z, X, G)
        dz = zz[..., None] - bz
        cu = dx * jnp.cos(ry) - dz * jnp.sin(ry)    # along length l
        cv = dx * jnp.sin(ry) + dz * jnp.cos(ry)    # along width w
        half_l = jnp.maximum(bl, 0.1) / 2.0 * expand
        half_w = jnp.maximum(bw, 0.1) / 2.0 * expand
        inside = (jnp.abs(cu) <= half_l) & (jnp.abs(cv) <= half_w) & valid
        area = jnp.where(valid, bw * bl, 1e9)
        cand = jnp.where(inside, area, 1e9)
        best = jnp.argmin(cand, axis=-1)            # (Z, X)
        pos = inside.any(axis=-1)
        labels = jnp.where(pos, cls_id[best].astype(jnp.int32), 0)

        take = lambda v: v[best]
        reg = jnp.stack([
            take(bx) - xx, take(bz) - zz, take(by),
            jnp.log(jnp.maximum(take(bh), 1e-3)),
            jnp.log(jnp.maximum(take(bw), 1e-3)),
            jnp.log(jnp.maximum(take(bl), 1e-3)),
            jnp.sin(take(ry)), jnp.cos(take(ry)),
        ], axis=-1)
        u = jnp.take_along_axis(cu, best[..., None], -1)[..., 0]
        v = jnp.take_along_axis(cv, best[..., None], -1)[..., 0]
        hu = jnp.take_along_axis(
            jnp.broadcast_to(half_l, cu.shape), best[..., None], -1)[..., 0]
        hv = jnp.take_along_axis(
            jnp.broadcast_to(half_w, cv.shape), best[..., None], -1)[..., 0]
        ctr = jnp.sqrt(jnp.clip((1 - jnp.abs(u) / hu)
                                * (1 - jnp.abs(v) / hv), 0.0, 1.0))
        return labels, reg, jnp.where(pos, ctr, 0.0), pos

    labels, reg, ctr, pos = jax.vmap(per_image)(boxes3d, num_boxes)
    return BEVTargets(labels, reg, ctr, pos)


def sigmoid_focal_loss(logits, targets01, alpha: float, gamma: float):
    """Elementwise sigmoid focal loss (RetinaNet form)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.logaddexp(0.0, logits) - logits * targets01
    p_t = p * targets01 + (1 - p) * (1 - targets01)
    a_t = alpha * targets01 + (1 - alpha) * (1 - targets01)
    return a_t * ((1 - p_t) ** gamma) * ce


def rpn3d_loss(cls_logits, reg_pred, ctr_logits, boxes3d, num_boxes,
               cfg: DSGNConfig) -> Dict[str, jnp.ndarray]:
    """cls (B,Z,X,C), reg (B,Z,X,8), ctr (B,Z,X) vs padded gt boxes3d
    (B,G,8). Returns dict with total + components (the reference's
    rpn3d_{cls,reg,centerness}_loss split, pgd_attack.py:324-330)."""
    t = assign_bev_targets(boxes3d, num_boxes, cfg)
    num_pos = jnp.maximum(t.pos_mask.sum(), 1.0)

    onehot = jax.nn.one_hot(t.labels - 1, cfg.num_classes) \
        * t.pos_mask[..., None]
    cls_l = sigmoid_focal_loss(cls_logits, onehot, cfg.focal_alpha,
                               cfg.focal_gamma).sum() / num_pos

    reg_diff = smooth_l1(reg_pred - t.reg).sum(-1)
    reg_l = (reg_diff * t.pos_mask).sum() / num_pos

    ctr_bce = (jnp.logaddexp(0.0, ctr_logits) - ctr_logits * t.centerness)
    ctr_l = (ctr_bce * t.pos_mask).sum() / num_pos

    return {"rpn3d_cls": cls_l, "rpn3d_reg": reg_l,
            "rpn3d_centerness": ctr_l,
            "rpn3d_total": cls_l + reg_l + ctr_l}


def disparity_loss(depth_preds, depth_gt, cfg: DSGNConfig) -> jnp.ndarray:
    """Multi-scale smooth-L1 depth loss, masked to (min_depth, max_depth],
    weights cfg.disp_loss_weights aligned to the *last* predictions
    (/root/reference/attack/DSGN/pgd_attack.py:310-319)."""
    mask = (depth_gt > cfg.min_depth) & (depth_gt <= cfg.max_depth)
    denom = jnp.maximum(mask.sum(), 1.0)
    weights = cfg.disp_loss_weights[-len(depth_preds):]
    total = jnp.float32(0.0)
    for w, pred in zip(weights, depth_preds):
        per = smooth_l1(pred - depth_gt) * mask
        total = total + w * per.sum() / denom
    return total


def dsgn_total_loss(outputs, depth_gt, boxes3d, num_boxes,
                    cfg: DSGNConfig) -> Tuple[jnp.ndarray, Dict]:
    """The scalar the attacks ascend: disp loss + RPN3D loss
    (pgd_attack.py:310-336)."""
    losses = {}
    total = jnp.float32(0.0)
    if cfg.loss_disp:
        dl = disparity_loss(outputs["depth_preds"], depth_gt, cfg)
        losses["disp"] = dl
        total = total + dl
    if cfg.rpn3d_enable:
        r = rpn3d_loss(outputs["bbox_cls"], outputs["bbox_reg"],
                       outputs["bbox_centerness"], boxes3d, num_boxes, cfg)
        losses.update(r)
        total = total + r["rpn3d_total"]
    losses["total"] = total
    return total, losses
