"""KITTI AP evaluation (host-side)."""
from eval_driving_safety_tpu.evalap.kitti_ap import (  # noqa: F401
    evaluate_folders, evaluate_detections, Difficulty)
