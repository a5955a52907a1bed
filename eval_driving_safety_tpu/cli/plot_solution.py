"""Solution rendering CLI (scenario + ego trajectory).

Capability parity: /root/reference/evaluation/plot_solution.py. Same
implementation as `plot_scenario` with the solution overlay required.
"""
from __future__ import annotations

import argparse
import os

from eval_driving_safety_tpu.cli.common import log
from eval_driving_safety_tpu.safety.commonroad_io import (read_scenario,
                                                          read_solution)
from eval_driving_safety_tpu.safety.plot import plot_solution


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenario_path", required=True)
    p.add_argument("--solution_path", required=True)
    p.add_argument("--output", required=True, help="output PNG path")
    args = p.parse_args()
    scenario = read_scenario(args.scenario_path)
    _, _, traj = read_solution(args.solution_path)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    plot_solution(scenario, traj, args.output)
    log(f"wrote {args.output}")


if __name__ == "__main__":
    main()
