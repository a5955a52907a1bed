"""Detection labels -> CommonRoad scenarios CLI.

Capability parity: /root/reference/evaluation/convert_scenarios.py — each
detection txt becomes a scenario XML; road type (template band) chosen by
presence of the file in the road-dynamic label folder.
"""
from __future__ import annotations

import argparse

from eval_driving_safety_tpu.cli.common import log
from eval_driving_safety_tpu.safety.convert import convert_detection_folder


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_folder", required=True,
                   help="folder of KITTI detection label txts")
    p.add_argument("--output_folder", required=True)
    p.add_argument("--dyna_obj_folder", default=None,
                   help="road-dynamic label folder (presence => highway "
                        "band, convert_scenarios.py:106-112)")
    p.add_argument("--direction", choices=("straight", "left", "right"),
                   default="straight")
    args = p.parse_args()
    written = convert_detection_folder(
        args.input_folder, args.output_folder,
        road_dynamic_label_dir=args.dyna_obj_folder,
        direction=args.direction)
    log(f"wrote {len(written)} scenarios to {args.output_folder}")


if __name__ == "__main__":
    main()
