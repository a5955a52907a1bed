"""Ground-truth labels -> CommonRoad scenarios CLI.

Capability parity: /root/reference/evaluation/convert_gt_scenarios.py —
static_label / dynamic_label(+annotation) / road_dynamic_label(+annotation)
classes with the n/0/1/-1 annotation codes and randomized constant-velocity
rollouts.
"""
from __future__ import annotations

import argparse

from eval_driving_safety_tpu.cli.common import log
from eval_driving_safety_tpu.safety.convert import convert_gt_folder


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_folder", required=True,
                   help="kitti_labeled/ tree (static_label, dynamic_label, "
                        "dynamic_annotation, road_dynamic_label, "
                        "road_dynamic_annotation)")
    p.add_argument("--output_folder", required=True)
    p.add_argument("--direction", choices=("straight", "left", "right"),
                   default="straight")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    written = convert_gt_folder(args.input_folder, args.output_folder,
                                direction=args.direction, seed=args.seed)
    log(f"wrote {len(written)} GT scenarios to {args.output_folder}")


if __name__ == "__main__":
    main()
