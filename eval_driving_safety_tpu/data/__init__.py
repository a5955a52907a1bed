from eval_driving_safety_tpu.data.kitti import (  # noqa: F401
    Calibration,
    KittiObject,
    read_calib,
    read_label,
    write_label,
    format_detection_line,
    write_detections,
)
