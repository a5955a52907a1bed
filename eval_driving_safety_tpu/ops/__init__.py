from eval_driving_safety_tpu.ops import boxes, anchors, nms, roi_align, rotated  # noqa: F401
