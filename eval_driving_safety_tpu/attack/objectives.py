"""Attack objectives beyond the reference's total-training-loss ascent.

The reference's PGD maximizes the detector's full training loss
(/root/reference/attack/DSGN/pgd_attack.py:310-336). The stereo-attack
literature (see PAPERS.md: Stereopagnosia arXiv:2009.10142, Left-right
Discrepancy arXiv:2401.07188) shows depth-targeted objectives are stronger
against the stereo-matching core. These are optional objectives for the
same PGD/patch engines (all are `f(outputs, ...) -> scalar` maximized by
the attack):

* `total_loss` — reference behavior (disparity + RPN3D losses).
* `depth_divergence` — push predicted depth away from ground truth
  (masked L1), ignoring the detection heads.
* `depth_shift` — drive predicted depth toward a *target offset*
  (ghost-distance attack: make objects appear `shift_m` farther/closer).
"""
from __future__ import annotations

import jax.numpy as jnp

from eval_driving_safety_tpu.config import DSGNConfig
from eval_driving_safety_tpu.models.rpn3d_loss import dsgn_total_loss


def total_loss(outputs, depth_gt, boxes3d, num_boxes, cfg: DSGNConfig):
    t, _ = dsgn_total_loss(outputs, depth_gt, boxes3d, num_boxes, cfg)
    return t


def depth_divergence(outputs, depth_gt, cfg: DSGNConfig):
    """Mean |pred - gt| over valid-depth pixels, summed over scales."""
    mask = (depth_gt > cfg.min_depth) & (depth_gt <= cfg.max_depth)
    denom = jnp.maximum(mask.sum(), 1.0)
    total = jnp.float32(0.0)
    for pred in outputs["depth_preds"]:
        total = total + (jnp.abs(pred - depth_gt) * mask).sum() / denom
    return total


def depth_shift(outputs, depth_gt, shift_m: float, cfg: DSGNConfig):
    """Negative L1 to (gt + shift): ascending this drives predictions to a
    systematic depth offset — the targeted 'objects look farther' attack."""
    mask = (depth_gt > cfg.min_depth) & (depth_gt <= cfg.max_depth)
    denom = jnp.maximum(mask.sum(), 1.0)
    target = depth_gt + shift_m
    total = jnp.float32(0.0)
    for pred in outputs["depth_preds"]:
        total = total - (jnp.abs(pred - target) * mask).sum() / denom
    return total
