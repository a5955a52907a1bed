"""Collision-check CLI.

Capability parity: /root/reference/evaluation/check_collision.py — batch
mode pairs every solution to its GT scenario by the 6-char id in the file
name, prints colliding ids + the collision rate, writes `collision.txt`;
single mode checks one pair and saves a plot.
"""
from __future__ import annotations

import argparse

from eval_driving_safety_tpu.cli.common import log
from eval_driving_safety_tpu.safety.collision import (check_solution_folder,
                                                      collides)
from eval_driving_safety_tpu.safety.commonroad_io import (read_scenario,
                                                          read_solution)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--check_all", action="store_true")
    p.add_argument("--scenario_path", required=True,
                   help="GT scenario folder (batch) or file (single)")
    p.add_argument("--solution_path", required=True)
    p.add_argument("--plot", default=None,
                   help="single mode: save a scenario+trajectory plot here")
    args = p.parse_args()
    if args.check_all:
        n, ids = check_solution_folder(args.scenario_path,
                                       args.solution_path,
                                       collision_txt="collision.txt")
        for i in ids:
            log(i)
        total = max(len(_solutions(args.solution_path)), 1)
        log(f"collision rate: {n / total}")
    else:
        scenario = read_scenario(args.scenario_path)
        _, _, traj = read_solution(args.solution_path)
        hit = collides(scenario, traj)
        log(f"Does collision exist?  {hit}")
        if args.plot:
            from eval_driving_safety_tpu.safety.plot import plot_solution
            plot_solution(scenario, traj, args.plot)


def _solutions(path):
    import os
    return [n for n in os.listdir(path)] if os.path.isdir(path) else [path]


if __name__ == "__main__":
    main()
