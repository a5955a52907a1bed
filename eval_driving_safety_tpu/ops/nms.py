"""Static-shape NMS (axis-aligned and rotated) for TPU.

Replaces the reference's CUDA `model.roi_layers.nms`
(/root/reference/attack/Stereo-RCNN/predict_and_save_pgd.py:26,300-302) and
the rotated NMS inside DSGN's FCOS3D postprocessor.

Design: every call returns a fixed number of kept indices plus a validity
mask — no data-dependent shapes, so the whole detection path stays inside
one jit region.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from eval_driving_safety_tpu.ops.boxes import pairwise_iou
from eval_driving_safety_tpu.ops.rotated import rotated_pairwise_iou

NEG_INF = -1e10


def _nms_from_iou(iou, scores, valid, max_out: int, iou_thresh: float):
    """Greedy NMS given a precomputed (N,N) IoU matrix.

    Returns (keep_idx (max_out,), keep_mask (max_out,)).
    """
    n = scores.shape[0]
    scores = jnp.where(valid, scores, NEG_INF)

    def body(state, _):
        live_scores, = state
        best = jnp.argmax(live_scores)
        best_ok = live_scores[best] > NEG_INF / 2
        sup = iou[best] > iou_thresh
        new_scores = jnp.where(sup, NEG_INF, live_scores)
        # always suppress the selected box itself
        new_scores = new_scores.at[best].set(NEG_INF)
        return (new_scores,), (best, best_ok)

    (_,), (keep_idx, keep_mask) = jax.lax.scan(
        body, (scores,), None, length=max_out)
    return keep_idx, keep_mask


def nms(boxes, scores, max_out: int, iou_thresh: float, valid=None):
    """Axis-aligned greedy NMS. boxes (N,4), scores (N,)."""
    if valid is None:
        valid = jnp.ones(scores.shape, dtype=bool)
    iou = pairwise_iou(boxes, boxes)
    return _nms_from_iou(iou, scores, valid, max_out, iou_thresh)


def _keep_fixpoint(iou, scores, valid, iou_thresh: float):
    """Parallel greedy-NMS keep mask via suppression-chain iteration.

    Box i survives iff no *surviving* higher-scored box overlaps it above
    the threshold — the defining fixpoint of sequential greedy NMS. Seeding
    with "only undominated boxes survive" and iterating
        keep <- not dominated-by-any-kept
    converges to the exact greedy solution in (suppression chain depth)
    steps — the dominance graph is acyclic in rank, so the while_loop below
    runs to the true fixpoint (bounded by n). Every step is an (N, N)
    masked matmul — MXU work instead of an N-step sequential scan (measured
    115 ms -> ~4 ms for 2000 boxes on one v5e).
    """
    n = scores.shape[0]
    scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores)
    rank = jnp.argsort(order)                       # rank[i]: position of i
    # dom[i, j] = True where j (higher rank) can suppress i
    higher = rank[None, :] < rank[:, None]
    dom = (iou > iou_thresh) & higher & valid[None, :] & valid[:, None]
    dom = dom.astype(jnp.float32)

    def step(keep):
        suppressed = dom @ keep                      # (N,) > 0 if any kept dominator
        return jnp.where(valid, (suppressed < 0.5).astype(jnp.float32), 0.0)

    # run to the fixpoint: every box's value is fixed once all higher-ranked
    # boxes are (the dominance graph is acyclic), so this terminates in
    # (suppression chain depth) iterations; `iters` pairs per loop step keep
    # the convergence check cheap, with a conservative cap of n steps
    def cond(state):
        keep, prev, i = state
        return (i < n) & jnp.any(keep != prev)

    def body(state):
        keep, _, i = state
        return step(keep), keep, i + 1

    init = step(valid.astype(jnp.float32))
    keep, _, _ = jax.lax.while_loop(
        cond, body, (step(init), init, jnp.asarray(0, jnp.int32)))
    return keep > 0.5


def nms_parallel(boxes, scores, max_out: int, iou_thresh: float, valid=None):
    """Greedy-equivalent NMS as a fixpoint of masked matmuls (see
    `_keep_fixpoint`). Same return contract as `nms`."""
    if valid is None:
        valid = jnp.ones(scores.shape, dtype=bool)
    iou = pairwise_iou(boxes, boxes)
    keep = _keep_fixpoint(iou, scores, valid, iou_thresh)
    masked = jnp.where(keep, scores, NEG_INF)
    vals, idx = jax.lax.top_k(masked, max_out)
    return idx, vals > NEG_INF / 2


def rotated_nms(boxes5, scores, max_out: int, iou_thresh: float, valid=None,
                parallel: bool = True):
    """Rotated (BEV) NMS. boxes5 (N,5) = (cx, cy, w, l, angle).

    Greedy-equivalent parallel fixpoint by default (see `_keep_fixpoint`);
    `parallel=False` keeps the sequential scan.
    """
    if valid is None:
        valid = jnp.ones(scores.shape, dtype=bool)
    iou = rotated_pairwise_iou(boxes5, boxes5)
    if not parallel:
        return _nms_from_iou(iou, scores, valid, max_out, iou_thresh)
    keep = _keep_fixpoint(iou, scores, valid, iou_thresh)
    masked = jnp.where(keep, scores, NEG_INF)
    vals, idx = jax.lax.top_k(masked, max_out)
    return idx, vals > NEG_INF / 2


