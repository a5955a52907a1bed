"""Static-shape proposal / anchor-target / proposal-target layers.

TPU-native replacements for the reference's dynamic-shape numpy/torch layers
`_ProposalLayer`, `_AnchorTargetLayer`, `_ProposalTargetLayer`
(/root/reference/attack/Stereo-RCNN/stereo_rpn.py:43-46,100-111;
stereo_rcnn.py:42,201-204). Everything returns fixed-size arrays with
validity masks so the whole detector + loss stays in one jit region, and the
loss path is always on (the property the attack relies on —
stereo_rcnn.py:199-204 keeps training-mode losses during eval).

Sampling uses jax.random ranking instead of host-side npr.choice.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eval_driving_safety_tpu.ops import boxes as B
from eval_driving_safety_tpu.ops.nms import nms_parallel

NEG_INF = -1e10


class Proposals(NamedTuple):
    rois_left: jnp.ndarray   # (B, P, 5) [batch_idx, x1, y1, x2, y2]
    rois_right: jnp.ndarray  # (B, P, 5)
    valid: jnp.ndarray       # (B, P) bool


def proposal_layer(cls_prob, deltas6, anchors, im_hw, *, pre_nms_top_n: int,
                   post_nms_top_n: int, nms_thresh: float, min_size: float):
    """RPN proposals from joint stereo predictions.

    cls_prob (B,N,2) softmaxed, deltas6 (B,N,6), anchors (N,4).
    NMS runs on the union of left/right boxes so a pair survives as a unit.
    """
    h, w = im_hw

    def per_image(scores_fg, d6):
        left, right = B.decode_stereo_boxes(anchors, d6)
        left = B.clip_boxes(left, h, w)
        right = B.clip_boxes(right, h, w)
        lw, lh = B.box_wh(left)
        rw, _ = B.box_wh(right)
        ok = (lw >= min_size) & (lh >= min_size) & (rw >= min_size)
        scores = jnp.where(ok, scores_fg, NEG_INF)
        top_scores, top_idx = jax.lax.top_k(scores, pre_nms_top_n)
        top_left = left[top_idx]
        top_right = right[top_idx]
        union = B.union_boxes(top_left, top_right)
        # parallel fixpoint NMS: greedy-equivalent, MXU matmuls instead of a
        # post_nms_top_n-step sequential scan
        keep, keep_mask = nms_parallel(union, top_scores, post_nms_top_n,
                                       nms_thresh,
                                       valid=top_scores > NEG_INF / 2)
        return top_left[keep], top_right[keep], keep_mask

    rois_l, rois_r, valid = jax.vmap(per_image)(cls_prob[..., 1], deltas6)
    bsz, p = valid.shape
    bidx = jnp.broadcast_to(jnp.arange(bsz, dtype=rois_l.dtype)[:, None, None],
                            (bsz, p, 1))
    rois_left = jnp.concatenate([bidx, rois_l], axis=-1)
    rois_right = jnp.concatenate([bidx, rois_r], axis=-1)
    # zero out invalid rois so downstream ROIAlign reads a harmless window
    m = valid[..., None]
    rois_left = jnp.where(m, rois_left, jnp.zeros_like(rois_left).at[..., 0].set(rois_left[..., 0]))
    rois_right = jnp.where(m, rois_right, jnp.zeros_like(rois_right).at[..., 0].set(rois_right[..., 0]))
    return Proposals(rois_left, rois_right, valid)


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray           # (B, N) in {-1 ignore, 0 bg, 1 fg}
    targets6: jnp.ndarray         # (B, N, 6) stereo regression targets
    inside_w: jnp.ndarray         # (B, N, 6)
    outside_w: jnp.ndarray        # (B, N, 6)


def anchor_target_layer(anchors, gt_left, gt_right, gt_merge, num_boxes,
                        im_hw, rng, *, batch_size: int = 256,
                        fg_fraction: float = 0.5,
                        positive_overlap: float = 0.7,
                        negative_overlap: float = 0.3):
    """Anchor classification/regression targets vs merged GT boxes.

    gt_* are (B, G, 4) zero-padded; num_boxes (B,).
    """
    h, w = im_hw
    n = anchors.shape[0]
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < w) & (anchors[:, 3] < h))

    def per_image(gl, gr, gm, nb, key):
        g = gl.shape[0]
        gt_valid = jnp.arange(g) < nb
        iou = B.pairwise_iou(anchors, gm)                    # (N, G)
        iou = jnp.where(gt_valid[None, :], iou, 0.0)
        max_iou = iou.max(axis=1)
        argmax_gt = iou.argmax(axis=1)
        # anchors that are the best for some gt are positive too; restrict
        # the per-gt argmax to INSIDE anchors (outside ones are labeled -1
        # below, which would strip edge objects of their only positive)
        iou_inside = jnp.where(inside[:, None], iou, -1.0)
        # (invalid gts scatter to index n, dropped — a -1 index would WRAP
        # to the last anchor)
        best_per_gt = jnp.where(gt_valid, iou_inside.argmax(axis=0), n)
        is_best = jnp.zeros((n,), bool).at[best_per_gt].set(
            True, mode="drop")
        labels = jnp.full((n,), -1, jnp.int32)
        labels = jnp.where(max_iou < negative_overlap, 0, labels)
        labels = jnp.where(is_best | (max_iou >= positive_overlap), 1, labels)
        labels = jnp.where(inside, labels, -1)

        # subsample: at most fg_fraction*batch_size fg, rest bg
        kf, kb = jax.random.split(key)
        num_fg = int(fg_fraction * batch_size)
        fg_rank = jnp.where(labels == 1, jax.random.uniform(kf, (n,)), -1.0)
        fg_keep_score, _ = jax.lax.top_k(fg_rank, num_fg)
        fg_cut = fg_keep_score[-1]
        drop_fg = (labels == 1) & (fg_rank < jnp.maximum(fg_cut, 0.0))
        labels = jnp.where(drop_fg, -1, labels)
        n_fg = (labels == 1).sum()
        num_bg = batch_size - jnp.minimum(n_fg, num_fg)
        # num_bg <= batch_size, so a bounded top_k replaces the full
        # descending sort of all ~190k anchor ranks (a full TPU sort here
        # is pure HBM traffic; top_k with small static k is not)
        bg_rank = jnp.where(labels == 0, jax.random.uniform(kb, (n,)), -1.0)
        bg_sorted, _ = jax.lax.top_k(bg_rank, batch_size)
        bg_cut = bg_sorted[jnp.clip(num_bg - 1, 0, batch_size - 1)]
        drop_bg = (labels == 0) & (bg_rank < bg_cut)
        labels = jnp.where(drop_bg, -1, labels)

        t6 = B.encode_stereo_boxes(anchors, gl[argmax_gt], gr[argmax_gt])
        inside_w = jnp.where((labels == 1)[:, None], 1.0, 0.0)
        num_examples = jnp.maximum((labels >= 0).sum(), 1)
        outside_w = jnp.where((labels >= 0)[:, None],
                              1.0 / num_examples, 0.0)
        return labels, t6, jnp.broadcast_to(inside_w, t6.shape), \
            jnp.broadcast_to(outside_w, t6.shape)

    bsz = gt_left.shape[0]
    keys = jax.random.split(rng, bsz)
    labels, t6, iw, ow = jax.vmap(per_image)(
        gt_left, gt_right, gt_merge, num_boxes, keys)
    return AnchorTargets(labels, t6, iw, ow)


class RoiTargets(NamedTuple):
    rois_left: jnp.ndarray        # (B, R, 5)
    rois_right: jnp.ndarray       # (B, R, 5)
    valid: jnp.ndarray            # (B, R) real sampled roi (filler slots,
                                  # picked by top_k over zero scores when
                                  # few candidates exist, are False and
                                  # must not be trained on)
    labels: jnp.ndarray           # (B, R) class id, 0 = bg
    targets6: jnp.ndarray         # (B, R, 6) normalized
    targets_dim_orien: jnp.ndarray  # (B, R, 5)
    kpts_label: jnp.ndarray       # (B, R) in [0, 4*GRID)
    kpts_weight: jnp.ndarray      # (B, R)
    border_left_label: jnp.ndarray   # (B, R) in [0, GRID)
    border_left_weight: jnp.ndarray
    border_right_label: jnp.ndarray
    border_right_weight: jnp.ndarray
    inside_w: jnp.ndarray         # (B, R, 6) fg-only regression mask


def proposal_target_layer(props: Proposals, gt_left, gt_right, gt_dim_orien,
                          gt_kpts, num_boxes, rng, *, roi_batch_size: int = 128,
                          fg_fraction: float = 0.25, fg_thresh: float = 0.5,
                          bg_thresh_hi: float = 0.5, bg_thresh_lo: float = 0.0,
                          bbox_means=(0.0, 0.0, 0.0, 0.0),
                          bbox_stds=(0.1, 0.1, 0.2, 0.2), kpts_grid: int = 28):
    """Sample a fixed 128-roi minibatch with stereo/dim/keypoint targets.

    gt_left/gt_right: (B, G, 5) [x1,y1,x2,y2,cls]; gt_dim_orien (B, G, 5)
    [h,w,l,sin,cos]; gt_kpts (B, G, 6) [kpt_type, kpt_u, border_lu,
    border_ru, 0, 0] in *left-image pixel* coords (type < 0 => no keypoint).
    """
    stds = jnp.asarray(bbox_stds)
    stds6 = jnp.concatenate([stds, stds[0:1], stds[2:3]])
    means = jnp.asarray(bbox_means)
    means6 = jnp.concatenate([means, means[0:1], means[2:3]])

    def per_image(rl, rr, pvalid, gl, gr, gdo, gk, nb, key):
        g = gl.shape[0]
        gt_valid = jnp.arange(g) < nb
        # include gt boxes as candidate rois (reference behavior)
        gt_rois_l = jnp.concatenate([jnp.full((g, 1), rl[0, 0]), gl[:, :4]], axis=1)
        gt_rois_r = jnp.concatenate([jnp.full((g, 1), rr[0, 0]), gr[:, :4]], axis=1)
        all_l = jnp.concatenate([rl, gt_rois_l], axis=0)
        all_r = jnp.concatenate([rr, gt_rois_r], axis=0)
        all_valid = jnp.concatenate([pvalid, gt_valid], axis=0)

        iou = B.pairwise_iou(all_l[:, 1:], gl[:, :4])
        iou = jnp.where(gt_valid[None, :], iou, 0.0)
        max_iou = jnp.where(all_valid, iou.max(axis=1), -1.0)
        gt_assign = iou.argmax(axis=1)

        is_fg = max_iou >= fg_thresh
        is_bg = (max_iou < bg_thresh_hi) & (max_iou >= bg_thresh_lo) & all_valid

        kf, kb = jax.random.split(key)
        n_all = all_l.shape[0]
        fg_per_img = int(fg_fraction * roi_batch_size)
        # rank fg by random score, bg by random score; select fixed counts
        fg_score = jnp.where(is_fg, 1.0 + jax.random.uniform(kf, (n_all,)), 0.0)
        bg_score = jnp.where(is_bg, 1.0 + jax.random.uniform(kb, (n_all,)), 0.0)
        _, fg_idx = jax.lax.top_k(fg_score, fg_per_img)
        fg_ok = fg_score[fg_idx] > 0.0
        _, bg_idx = jax.lax.top_k(bg_score, roi_batch_size - fg_per_img)
        bg_ok = bg_score[bg_idx] > 0.0
        sel = jnp.concatenate([fg_idx, bg_idx])
        sel_fg = jnp.concatenate([fg_ok, jnp.zeros_like(bg_ok)])
        sel_ok = jnp.concatenate([fg_ok, bg_ok])

        rois_l = all_l[sel]
        rois_r = all_r[sel]
        assign = gt_assign[sel]
        labels = jnp.where(sel_fg, gl[assign, 4].astype(jnp.int32), 0)

        # left deltas vs the LEFT roi, right deltas vs the RIGHT roi —
        # matching the reference's per-view encoding and the decode in
        # inference/stereo_rcnn_predict.py (bbox_transform_inv on boxes_r)
        t_left = B.encode_boxes(rois_l[:, 1:], gl[assign, :4])
        t_right = B.encode_boxes(rois_r[:, 1:], gr[assign, :4])
        t6 = (jnp.concatenate(
            [t_left, t_right[:, 0:1], t_right[:, 2:3]], axis=-1)
            - means6) / stds6
        tdo = gdo[assign]
        inside_w = jnp.where(sel_fg[:, None], 1.0, 0.0)

        # keypoint / border targets: pixel coords -> grid bins within left roi
        roi_x1 = rois_l[:, 1]
        roi_w = jnp.maximum(rois_l[:, 3] - roi_x1 + 1.0, 1.0)

        def to_bin(u):
            return jnp.clip(((u - roi_x1) / roi_w * kpts_grid).astype(jnp.int32),
                            0, kpts_grid - 1)

        kpt_type = gk[assign, 0]
        kpt_u = gk[assign, 1]
        kpt_in = (kpt_u >= roi_x1) & (kpt_u <= rois_l[:, 3]) & (kpt_type >= 0)
        kpts_label = (jnp.clip(kpt_type.astype(jnp.int32), 0, 3) * kpts_grid
                      + to_bin(kpt_u))
        kpts_weight = jnp.where(sel_fg & kpt_in, 1.0, 0.0)

        bl_u = gk[assign, 2]
        br_u = gk[assign, 3]
        bl_in = (bl_u >= roi_x1) & (bl_u <= rois_l[:, 3])
        br_in = (br_u >= roi_x1) & (br_u <= rois_l[:, 3])
        bl_label = to_bin(bl_u)
        br_label = to_bin(br_u)
        bl_weight = jnp.where(sel_fg & bl_in, 1.0, 0.0)
        br_weight = jnp.where(sel_fg & br_in, 1.0, 0.0)

        return (rois_l, rois_r, sel_ok, labels, t6, tdo, kpts_label,
                kpts_weight, bl_label, bl_weight, br_label, br_weight,
                jnp.broadcast_to(inside_w, t6.shape))

    bsz = gt_left.shape[0]
    keys = jax.random.split(rng, bsz)
    outs = jax.vmap(per_image)(props.rois_left, props.rois_right, props.valid,
                               gt_left, gt_right, gt_dim_orien, gt_kpts,
                               num_boxes, keys)
    return RoiTargets(*outs)
