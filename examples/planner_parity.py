"""Planner-parity sweep: GT-convert + A*-plan EVERY reference
`kitti_labeled` label (the reference's own evaluation corpus, consumed as
data) and report per-class planning success rates and timing.

This quantifies L6 parity beyond the single-template smoke test: the
reference pipeline plans each GT scenario with commonroad-search's A*
(/root/reference/evaluation/plan_motion.py:74-126, skip-on-failure at
:94-95) and reports "successful planning rate" as a headline safety metric
(/root/reference/evaluation/README.md:88-96, eval.py:50-67). This
framework's `safety.planner.AStarPlanner` must succeed on a comparable
fraction; the measured rate is pinned by
tests/test_safety.py::test_planner_parity_rate_on_reference_labels and
recorded in PARITY.md.

Usage:
    python examples/planner_parity.py \
        --kitti_labeled /root/reference/evaluation/kitti_labeled \
        [--limit N] [--classes static,dynamic,road_dynamic]

Prints one JSON line per class plus a `total` summary line.
"""
from __future__ import annotations

import argparse
import json
import os
import time

from eval_driving_safety_tpu.config import ScenarioConfig
from eval_driving_safety_tpu.data.kitti import read_label
from eval_driving_safety_tpu.safety.convert import convert_gt_scenario
from eval_driving_safety_tpu.safety.planner import plan_scenario

CLASSES = (
    # (name, label subdir, annotation subdir, is_highway, seed base)
    ("static", "static_label", None, False, 0),
    ("dynamic", "dynamic_label", "dynamic_annotation", False, 1000),
    ("road_dynamic", "road_dynamic_label", "road_dynamic_annotation",
     True, 2000),
)


def sweep(kitti_labeled: str, limit: int | None = None,
          classes=("static", "dynamic", "road_dynamic"),
          direction: str = "straight", seed: int = 0, verbose: bool = True):
    cfg = ScenarioConfig()
    results = {}
    for name, sub, anno_sub, is_highway, base in CLASSES:
        if name not in classes:
            continue
        label_dir = os.path.join(kitti_labeled, sub)
        files = sorted(os.listdir(label_dir))[:limit]
        n_ok, times = 0, []
        for i, fn in enumerate(files):
            objs = read_label(os.path.join(label_dir, fn))
            annos = None
            if anno_sub:
                ap = os.path.join(kitti_labeled, anno_sub, fn)
                if os.path.exists(ap):
                    annos = open(ap).read().splitlines()
            sc = convert_gt_scenario(objs, annos, is_highway, direction,
                                     cfg, seed=seed + base + i)
            t0 = time.perf_counter()
            traj = plan_scenario(sc, is_highway)
            times.append(time.perf_counter() - t0)
            n_ok += traj is not None
            if verbose and (i + 1) % 25 == 0:
                print(f"# {name}: {i + 1}/{len(files)} "
                      f"ok={n_ok} avg={sum(times)/len(times):.2f}s",
                      flush=True)
        results[name] = {
            "n": len(files), "planned": n_ok,
            "success_rate": round(n_ok / max(len(files), 1), 4),
            "avg_plan_seconds": round(sum(times) / max(len(times), 1), 3),
            "max_plan_seconds": round(max(times), 3) if times else None,
        }
        print(json.dumps({"class": name, **results[name]}), flush=True)
    total_n = sum(r["n"] for r in results.values())
    total_ok = sum(r["planned"] for r in results.values())
    summary = {"class": "total", "n": total_n, "planned": total_ok,
               "success_rate": round(total_ok / max(total_n, 1), 4)}
    print(json.dumps(summary), flush=True)
    return results, summary


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kitti_labeled",
                    default="/root/reference/evaluation/kitti_labeled")
    ap.add_argument("--limit", type=int, default=None,
                    help="first N labels per class")
    ap.add_argument("--classes", default="static,dynamic,road_dynamic")
    ap.add_argument("--direction", default="straight",
                    choices=("straight", "left", "right"))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    sweep(args.kitti_labeled, args.limit,
          tuple(args.classes.split(",")), args.direction, args.seed)


if __name__ == "__main__":
    main()
