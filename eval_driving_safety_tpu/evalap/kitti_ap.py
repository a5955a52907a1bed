"""KITTI object-detection AP (R40) evaluator.

Capability parity: the external `kitti-object-eval-python` the reference
shells out to after attacked inference
(/root/reference/attack/DSGN/predict_and_save_pgd.py:287-301): 40-point
interpolated AP for 2D / BEV / 3D boxes with the official
easy/moderate/hard difficulty gating and DontCare handling.

Host-side numpy (+ the framework's rotated-IoU op on CPU); per-image box
counts are tiny, so no accelerator kernel is warranted — the upstream numba
CUDA is replaced by vectorized numpy.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Sequence

import numpy as np

from eval_driving_safety_tpu.data.kitti import KittiObject, read_label

# official difficulty gates: (min bbox height, max occlusion, max truncation)
DIFFICULTY_GATES = {
    "easy": (40.0, 0, 0.15),
    "moderate": (25.0, 1, 0.30),
    "hard": (25.0, 2, 0.50),
}


@dataclass
class Difficulty:
    name: str = "moderate"

    @property
    def gates(self):
        return DIFFICULTY_GATES[self.name]


def _iou_2d(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) -> (N,M), +0 width convention (modern KITTI eval)."""
    if a.size == 0 or b.size == 0:
        return np.zeros((a.shape[0], b.shape[0]))
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter,
                              1e-9)


def _bev_boxes(objs: Sequence[KittiObject]) -> np.ndarray:
    """(N,5) rotated boxes in ops.rotated convention (angle = -ry; see
    ops.rotated.kitti_bev_box5)."""
    if not objs:
        return np.zeros((0, 5))
    return np.array([[o.location[0], o.location[2], o.dimensions[1],
                      o.dimensions[2], -o.rotation_y] for o in objs])


def _iou_bev(a_objs, b_objs) -> np.ndarray:
    a, b = _bev_boxes(a_objs), _bev_boxes(b_objs)
    if a.shape[0] == 0 or b.shape[0] == 0:
        return np.zeros((a.shape[0], b.shape[0]))
    import jax
    import jax.numpy as jnp
    from eval_driving_safety_tpu.ops.rotated import rotated_pairwise_iou
    with jax.default_device(jax.devices("cpu")[0] if any(
            d.platform == "cpu" for d in jax.devices()) else jax.devices()[0]):
        return np.asarray(rotated_pairwise_iou(jnp.asarray(a),
                                               jnp.asarray(b)))


def _iou_3d(a_objs, b_objs) -> np.ndarray:
    """BEV rotated IoU x vertical overlap."""
    bev = _iou_bev(a_objs, b_objs)
    if bev.size == 0:
        return bev
    ya = np.array([[o.location[1], o.dimensions[0]] for o in a_objs])
    yb = np.array([[o.location[1], o.dimensions[0]] for o in b_objs])
    # y is the bottom; box spans [y-h, y]
    top = np.minimum(ya[:, None, 0], yb[None, :, 0])
    bot = np.maximum(ya[:, None, 0] - ya[:, None, 1],
                     yb[None, :, 0] - yb[None, :, 1])
    inter_h = np.clip(top - bot, 0, None)
    # recompose: bev gives inter_area/union_area; approximate 3D IoU by
    # scaling overlap heights through the volumes
    a_bev = _bev_boxes(a_objs)
    b_bev = _bev_boxes(b_objs)
    area_a = a_bev[:, 2] * a_bev[:, 3]
    area_b = b_bev[:, 2] * b_bev[:, 3]
    inter_area = bev * (area_a[:, None] + area_b[None, :]) / (1.0 + bev)
    inter_vol = inter_area * inter_h
    vol_a = area_a * ya[:, 1]
    vol_b = area_b * yb[:, 1]
    return inter_vol / np.maximum(
        vol_a[:, None] + vol_b[None, :] - inter_vol, 1e-9)


def _gt_status(objs: Sequence[KittiObject], cls: str, difficulty) -> List[int]:
    """1 = counted gt, 0 = ignored (other difficulty / Van for Car),
    -1 = irrelevant class."""
    min_h, max_occ, max_trunc = difficulty.gates
    out = []
    for o in objs:
        h = o.bbox[3] - o.bbox[1]
        if o.type == cls:
            hard = (h < min_h or o.occluded > max_occ
                    or o.truncated > max_trunc)
            out.append(0 if hard else 1)
        elif cls == "Car" and o.type == "Van":
            out.append(0)       # neighboring class: ignored, never fp
        else:
            out.append(-1)
    return out


def _match_image(gts, dets, ious, gt_status, dontcare, iou_thresh,
                 min_height: float = 0.0):
    """Returns (scores, tp_flags) for counted dets + number of counted gts.

    Greedy: dets in score order claim the best unmatched counted gt.
    Official ignore rules (evaluate_object.cpp): a det shorter than the
    difficulty's min bbox height is ignored (neither TP nor FP); a det that
    matched an ignored gt is not scored; an unmatched det whose
    intersection / det-area with a DontCare region exceeds 0.5 is dropped.
    """
    order = np.argsort([-d.score for d in dets])
    matched = np.zeros(len(gts), bool)
    scores, tps, sims = [], [], []
    for di in order:
        det_h = dets[di].bbox[3] - dets[di].bbox[1]
        small_det = det_h < min_height
        best_iou, best_gt = iou_thresh, -1
        ignored_hit = False
        for gi in range(len(gts)):
            if gt_status[gi] == -1 or matched[gi]:
                continue
            if ious[gi, di] >= best_iou:
                if gt_status[gi] == 1 and not small_det:
                    best_iou, best_gt = ious[gi, di], gi
                else:
                    ignored_hit = True
        if best_gt >= 0:
            matched[best_gt] = True
            scores.append(dets[di].score)
            tps.append(True)
            # orientation similarity (AOS, evaluate_object.cpp): TPs score
            # (1 + cos(gt_alpha - det_alpha)) / 2, FPs contribute 0
            sims.append(0.5 * (1.0 + np.cos(gts[best_gt].alpha
                                            - dets[di].alpha)))
        elif ignored_hit or small_det:
            continue            # ignored: neither TP nor FP
        else:
            # DontCare absorption: intersection / det-area > 0.5 (2D only)
            if dontcare is not None and len(dontcare):
                bb = dets[di].bbox
                dc = np.asarray(dontcare)
                ix = np.clip(np.minimum(dc[:, 2], bb[2])
                             - np.maximum(dc[:, 0], bb[0]), 0, None)
                iy = np.clip(np.minimum(dc[:, 3], bb[3])
                             - np.maximum(dc[:, 1], bb[1]), 0, None)
                det_area = max((bb[2] - bb[0]) * (bb[3] - bb[1]), 1e-9)
                if (ix * iy / det_area).max(initial=0.0) > 0.5:
                    continue
            scores.append(dets[di].score)
            tps.append(False)
            sims.append(0.0)
    return scores, tps, sims, int(sum(1 for s in gt_status if s == 1))


def _ap_r40(scores, tps, num_gt, sims=None) -> float:
    """R40 interpolated AP; with `sims` (per-det orientation similarities)
    the precision numerator becomes the cumulative similarity — the AOS of
    the official evaluator (same envelope + 40-point sweep)."""
    if num_gt == 0:
        return 0.0
    order = np.argsort(-np.asarray(scores)) if scores else []
    tp_sorted = np.asarray(tps, bool)[order] if len(scores) else np.zeros(0, bool)
    tp_cum = np.cumsum(tp_sorted)
    fp_cum = np.cumsum(~tp_sorted)
    recall = tp_cum / num_gt
    if sims is not None:
        num = np.cumsum(np.asarray(sims, float)[order]) if len(scores) \
            else np.zeros(0)
    else:
        num = tp_cum
    precision = num / np.maximum(tp_cum + fp_cum, 1)
    # monotone envelope
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    ap = 0.0
    for r in np.linspace(1.0 / 40.0, 1.0, 40):
        idx = np.searchsorted(recall, r, side="left")
        ap += precision[idx] if idx < len(precision) else 0.0
    return float(ap / 40.0)


def evaluate_detections(gt_per_image: Sequence[Sequence[KittiObject]],
                        det_per_image: Sequence[Sequence[KittiObject]],
                        cls: str = "Car", iou_thresh: float = 0.7,
                        difficulty: str = "moderate") -> Dict[str, float]:
    """AP (R40) for 2D bbox / BEV / 3D at the given difficulty."""
    diff = Difficulty(difficulty)
    result = {}
    for metric in ("bbox", "bev", "3d"):
        all_scores, all_tps, all_sims, total_gt = [], [], [], 0
        for gts, dets in zip(gt_per_image, det_per_image):
            dets_c = [d for d in dets if d.type == cls]
            status = _gt_status(gts, cls, diff)
            dontcare = np.asarray([g.bbox for g in gts
                                   if g.type == "DontCare"]) \
                if metric == "bbox" else None
            if metric == "bbox":
                ious = _iou_2d(np.asarray([g.bbox for g in gts]).reshape(-1, 4),
                               np.asarray([d.bbox for d in dets_c]).reshape(-1, 4))
            elif metric == "bev":
                ious = _iou_bev(gts, dets_c)
            else:
                ious = _iou_3d(gts, dets_c)
            s, t, sim, n = _match_image(gts, dets_c, ious, status, dontcare,
                                        iou_thresh,
                                        min_height=diff.gates[0])
            all_scores += s
            all_tps += t
            all_sims += sim
            total_gt += n
        result[f"ap_{metric}"] = _ap_r40(all_scores, all_tps, total_gt)
        if metric == "bbox":
            # AOS rides the 2D-bbox matching (the official convention)
            result["ap_aos"] = _ap_r40(all_scores, all_tps, total_gt,
                                       sims=all_sims)
    return result


def evaluate_folders(gt_dir: str, det_dir: str, cls: str = "Car",
                     iou_thresh: float = 0.7,
                     difficulty: str = "moderate") -> Dict[str, float]:
    """Label-folder interface matching the reference's kitti_eval hook
    (predict_and_save_pgd.py:287-301): det txts are matched to gt txts by
    file name; missing det files count as empty."""
    gts, dets = _load_folders(gt_dir, det_dir)
    return evaluate_detections(gts, dets, cls, iou_thresh, difficulty)


# official per-class 3D/BEV IoU thresholds (evaluate_object.cpp)
CLASS_IOU_THRESH = {"Car": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5}
DIFFICULTIES = ("easy", "moderate", "hard")


def _load_folders(gt_dir: str, det_dir: str):
    gt_names = sorted(n for n in os.listdir(gt_dir) if n.endswith(".txt"))
    gts, dets = [], []
    for n in gt_names:
        gts.append(read_label(os.path.join(gt_dir, n)))
        dp = os.path.join(det_dir, n)
        dets.append(read_label(dp) if os.path.exists(dp) else [])
    return gts, dets


def evaluate_full_table(gt_per_image, det_per_image,
                        classes: Sequence[str] = ("Car",)) -> Dict[str, Dict]:
    """Full easy/moderate/hard AP table per class — the output shape of the
    reference's eval hook (/root/reference/attack/DSGN/
    predict_and_save_pgd.py:287-301 shells out to print exactly this).

    Returns {cls: {difficulty: {ap_bbox, ap_bev, ap_3d}}}.
    """
    table: Dict[str, Dict] = {}
    for cls in classes:
        thr = CLASS_IOU_THRESH.get(cls, 0.5)
        table[cls] = {
            d: evaluate_detections(gt_per_image, det_per_image, cls, thr, d)
            for d in DIFFICULTIES}
    return table


def evaluate_folders_full(gt_dir: str, det_dir: str,
                          classes: Sequence[str] = ("Car",)) -> Dict[str, Dict]:
    gts, dets = _load_folders(gt_dir, det_dir)
    return evaluate_full_table(gts, dets, classes)


def format_ap_table(table: Dict[str, Dict]) -> str:
    """Human-readable AP table (AP in %, R40), one class block per line
    group, mirroring the official evaluator's printout."""
    lines = []
    for cls, per_diff in table.items():
        lines.append(f"{cls} AP(%) @ IoU "
                     f"{CLASS_IOU_THRESH.get(cls, 0.5):.2f} (R40):")
        header = "  {:<10}" + "{:>10}" * len(DIFFICULTIES)
        lines.append(header.format("", *DIFFICULTIES))
        for metric, label in (("ap_bbox", "bbox"), ("ap_aos", "aos"),
                              ("ap_bev", "bev"), ("ap_3d", "3d")):
            row = "  {:<10}".format(label) + "".join(
                "{:>10.2f}".format(100.0 * per_diff[d][metric])
                for d in DIFFICULTIES)
            lines.append(row)
    return "\n".join(lines)
