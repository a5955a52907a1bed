"""Safety-metrics CLI.

Capability parity: /root/reference/evaluation/eval.py — the five metrics
with per-metric flags; collision is checked against the GT scenario folder
while solutions were planned on detected scenarios (the benchmark's central
asymmetry, eval.py:77-78).
"""
from __future__ import annotations

import argparse
import json

from eval_driving_safety_tpu.cli.common import log
from eval_driving_safety_tpu.safety.metrics import evaluate_all


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenario_path", required=True,
                   help="detected-scenario folder (denominator)")
    p.add_argument("--solution_path", required=True)
    p.add_argument("--gt_scenario_path", default=None,
                   help="GT scenarios for collision checking "
                        "(default: scenario_path)")
    p.add_argument("--success_rate", action="store_true")
    p.add_argument("--collision_rate", action="store_true")
    p.add_argument("--safe_driving_rate", action="store_true")
    p.add_argument("--trajectory_length", action="store_true")
    p.add_argument("--travel_time", action="store_true")
    p.add_argument("--json", action="store_true", help="print one JSON line")
    args = p.parse_args()
    m = evaluate_all(args.scenario_path, args.solution_path,
                     args.gt_scenario_path)
    show_all = not any((args.success_rate, args.collision_rate,
                        args.safe_driving_rate, args.trajectory_length,
                        args.travel_time))
    if args.json:
        print(json.dumps(m.as_dict()))
        return
    if show_all or args.success_rate:
        log(f"successful planning rate: {m.success_rate:.4f} "
            f"({m.num_solutions}/{m.num_scenarios})")
    if show_all or args.collision_rate:
        log(f"collision rate: {m.collision_rate:.4f} "
            f"({m.num_collisions}/{m.num_solutions})")
    if show_all or args.safe_driving_rate:
        log(f"safe driving rate: {m.safe_driving_rate:.4f}")
    if show_all or args.trajectory_length:
        log(f"average trajectory length: {m.avg_trajectory_length:.4f} m")
    if show_all or args.travel_time:
        log(f"average travel time: {m.avg_travel_time:.4f} s")


if __name__ == "__main__":
    main()
