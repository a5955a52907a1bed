"""TPU-native stereo-vision attack & driving-safety evaluation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DexterJZ/eval_driving_safety (reference: /root/reference): adversarial
attacks (PGD, universal patch) on stereo 3D detectors (DSGN, Stereo R-CNN),
KITTI-format detection export, scene-semantics classifiers, CommonRoad
scenario conversion, A* motion planning, collision checking and safety
metrics.

Layers (cf. SURVEY.md §1):
  data/      KITTI stereo data layer (L0)
  ops/       geometry + vision ops: boxes, NMS, ROIAlign, cost volumes (L1 kernels)
  models/    DSGN + Stereo R-CNN + classifiers in Flax (L1, L4)
  attack/    PGD + universal-patch engines (L2)
  parallel/  mesh / sharding utilities (DP + volume sharding)
  safety/    scenario conversion, planner, collision, metrics (L5, L6)
  evalap/    KITTI AP evaluator (host-side)
  utils/     config/checkpoint/logging
"""

__version__ = "0.1.0"
