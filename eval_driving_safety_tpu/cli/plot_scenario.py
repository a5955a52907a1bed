"""Scenario / solution rendering CLI.

Capability parity: /root/reference/evaluation/plot_scenario.py and
plot_solution.py.
"""
from __future__ import annotations

import argparse
import os

from eval_driving_safety_tpu.cli.common import log
from eval_driving_safety_tpu.safety.commonroad_io import (read_scenario,
                                                          read_solution)
from eval_driving_safety_tpu.safety.plot import plot_scenario


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenario_path", required=True)
    p.add_argument("--solution_path", default=None,
                   help="overlay this solution's ego trajectory")
    p.add_argument("--output", required=True, help="output PNG path")
    args = p.parse_args()
    scenario = read_scenario(args.scenario_path)
    traj = None
    if args.solution_path:
        _, _, traj = read_solution(args.solution_path)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    plot_scenario(scenario, args.output, trajectory=traj)
    log(f"wrote {args.output}")


if __name__ == "__main__":
    main()
