"""Motion-planning CLI: scenario XMLs -> CommonRoad solution XMLs.

Capability parity: /root/reference/evaluation/plan_motion.py — A* over the
band's KS motion primitives (street 6-8 / highway 11-13, chosen by the
road-dynamic label folder), skip on failure/trivial path, per-scenario
timing printout.
"""
from __future__ import annotations

import argparse
import os
import time

from eval_driving_safety_tpu.cli.common import log
from eval_driving_safety_tpu.safety.commonroad_io import (read_scenario,
                                                          write_solution)
from eval_driving_safety_tpu.safety.planner import plan_scenario


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_folder", required=True)
    p.add_argument("--output_folder", required=True)
    p.add_argument("--dyna_obj_folder", default=None,
                   help="road-dynamic label folder: presence of "
                        "<id>.txt selects the 11-13 primitive band "
                        "(plan_motion.py:67-72)")
    args = p.parse_args()
    names = sorted(n for n in os.listdir(args.input_folder)
                   if n.endswith(".xml"))
    n_solved = 0
    for name in names:
        sid = name.rsplit(".", 1)[0]
        t0 = time.time()
        scenario = read_scenario(os.path.join(args.input_folder, name))
        is_highway = bool(args.dyna_obj_folder and os.path.exists(
            os.path.join(args.dyna_obj_folder, sid + ".txt")))
        traj = plan_scenario(scenario, is_highway)
        if traj is None:
            log(f"{sid}: no path")
            continue
        write_solution(args.output_folder, sid, traj,
                       scenario.planning_problems[0].problem_id)
        n_solved += 1
        log(f"{sid}: {len(traj.states)} states, "
            f"time cost {time.time() - t0:.2f} s")
    log(f"solved {n_solved}/{len(names)}")


if __name__ == "__main__":
    main()
