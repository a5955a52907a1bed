"""KITTI AP evaluator: perfect/missed/spurious detections, difficulty gates."""
import numpy as np

from eval_driving_safety_tpu.data.kitti import KittiObject
from eval_driving_safety_tpu.evalap.kitti_ap import (
    _ap_r40, evaluate_detections)


def _obj(typ="Car", bbox=(100, 100, 200, 160), score=None, occ=0, trunc=0.0,
         loc=(2.0, 1.6, 15.0), dims=(1.5, 1.7, 4.0), ry=0.1):
    return KittiObject(type=typ, truncated=trunc, occluded=occ, alpha=0.0,
                       bbox=np.array(bbox, float),
                       dimensions=np.array(dims, float),
                       location=np.array(loc, float), rotation_y=ry,
                       score=score)


def test_perfect_detections_ap_one():
    gt = [[_obj(), _obj(bbox=(300, 80, 380, 140), loc=(-3.0, 1.6, 20.0))]]
    det = [[_obj(score=0.9), _obj(bbox=(300, 80, 380, 140),
                                  loc=(-3.0, 1.6, 20.0), score=0.8)]]
    r = evaluate_detections(gt, det)
    assert r["ap_bbox"] == 1.0
    assert r["ap_bev"] == 1.0
    assert r["ap_3d"] == 1.0


def test_missed_detection_halves_recall():
    gt = [[_obj(), _obj(bbox=(300, 80, 380, 140), loc=(-3.0, 1.6, 20.0))]]
    det = [[_obj(score=0.9)]]
    r = evaluate_detections(gt, det)
    assert 0.45 <= r["ap_bbox"] <= 0.55


def test_spurious_detection_lowers_precision():
    gt = [[_obj()]]
    det = [[_obj(score=0.9),
            _obj(bbox=(500, 100, 600, 160), loc=(8.0, 1.6, 15.0), score=0.95)]]
    r = evaluate_detections(gt, det)
    assert r["ap_bbox"] < 1.0


def test_shifted_3d_box_fails_3d_but_passes_2d():
    gt = [[_obj()]]
    det = [[_obj(score=0.9, loc=(4.5, 1.6, 15.0))]]   # 2.5 m lateral error
    r = evaluate_detections(gt, det)
    assert r["ap_bbox"] == 1.0
    assert r["ap_3d"] == 0.0


def test_difficulty_gate_ignores_small_gt():
    # 20px-high gt is beyond even 'hard'; detecting nothing is perfect=0 gts
    gt = [[_obj(bbox=(100, 100, 140, 120))]]
    det = [[]]
    r = evaluate_detections(gt, det, difficulty="moderate")
    assert r["ap_bbox"] == 0.0          # zero counted gts -> AP defined as 0
    # and a det matching the ignored gt must not count as a false positive
    det2 = [[_obj(bbox=(100, 100, 140, 120), score=0.9)]]
    gt2 = [[_obj(), _obj(bbox=(100, 100, 140, 120))]]
    det_both = [[_obj(score=0.8), _obj(bbox=(100, 100, 140, 120), score=0.9)]]
    r2 = evaluate_detections(gt2, det_both)
    assert r2["ap_bbox"] == 1.0


def test_dontcare_region_absorbs_detections():
    gt = [[_obj(), _obj(typ="DontCare", bbox=(500, 100, 600, 160))]]
    det = [[_obj(score=0.9),
            _obj(bbox=(505, 105, 595, 155), score=0.95)]]  # inside DontCare
    r = evaluate_detections(gt, det)
    assert r["ap_bbox"] == 1.0


def test_van_ignored_for_car_class():
    gt = [[_obj(), _obj(typ="Van", bbox=(300, 80, 380, 140),
                        loc=(-3.0, 1.6, 20.0))]]
    det = [[_obj(score=0.9), _obj(bbox=(300, 80, 380, 140),
                                  loc=(-3.0, 1.6, 20.0), score=0.8)]]
    r = evaluate_detections(gt, det)
    assert r["ap_bbox"] == 1.0          # Van match is neither tp nor fp


def test_ap_r40_basic():
    assert _ap_r40([0.9, 0.8], [True, True], 2) == 1.0
    assert _ap_r40([], [], 2) == 0.0
    assert 0.4 < _ap_r40([0.9, 0.8], [True, False], 2) < 0.6


def test_small_detection_is_ignored_not_fp():
    """A det below the difficulty's min height must not count as FP."""
    gt = [[_obj()]]
    det = [[_obj(score=0.9),
            _obj(bbox=(500, 100, 540, 118), score=0.95,   # 18px tall
                 loc=(8.0, 1.6, 40.0))]]
    r = evaluate_detections(gt, det, difficulty="moderate")
    assert r["ap_bbox"] == 1.0


def test_dontcare_inter_over_det_area():
    """A det whose area mostly covers a DontCare region is absorbed even
    when symmetric IoU is small (large det, small DontCare)."""
    gt = [[_obj(), _obj(typ="DontCare", bbox=(500, 100, 560, 160))]]
    det = [[_obj(score=0.9),
            _obj(bbox=(505, 105, 555, 155), score=0.95)]]  # inside DontCare
    r = evaluate_detections(gt, det)
    assert r["ap_bbox"] == 1.0
