"""KITTI label -> CommonRoad scenario converters.

Capability parity:
* detection -> scenario: every Car/Van/Truck/Misc becomes a static
  PARKED_VEHICLE at position (z, -x), orientation -(ry - pi/2), shape
  Rectangle(width=w, length=l); template chosen by road type
  (/root/reference/evaluation/convert_scenarios.py:98-143).
* GT -> scenario: three classes — static_label (all static),
  dynamic_label + annotations (street band), road_dynamic_label +
  annotations (highway band); annotation codes per label line:
  'n' ignore / '0' static / '1','-1' dynamic; dynamic obstacles get a
  19-step constant-velocity rollout with v ~ U(vmin, vmax) and heading
  = orientation + pi (/root/reference/evaluation/convert_gt_scenarios.py:
  106-147,217-229).

Coordinate transform (KITTI camera frame -> CommonRoad ego plane):
position = (z, -x); orientation = -(ry - pi/2), wrapped to [-pi, pi].
"""
from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence

import numpy as np

from eval_driving_safety_tpu.config import ScenarioConfig
from eval_driving_safety_tpu.data.kitti import KittiObject, read_label
from eval_driving_safety_tpu.safety.commonroad_io import (
    DynamicObstacle, RectShape, Scenario, State, StaticObstacle, Trajectory,
    write_scenario)
from eval_driving_safety_tpu.safety.templates import make_init_scenario

OBSTACLE_CLASSES = ("Car", "Van", "Truck", "Misc")


def wrap_pi(a: float) -> float:
    while a < -math.pi:
        a += 2 * math.pi
    while a > math.pi:
        a -= 2 * math.pi
    return a


def camera_to_ego(obj: KittiObject):
    """(position (2,), orientation) in the CommonRoad ego plane."""
    x, _, z = obj.location
    return np.array([z, -x]), wrap_pi(-(obj.rotation_y - 0.5 * math.pi))


def static_obstacle_from(obj: KittiObject, scenario: Scenario) -> StaticObstacle:
    pos, orient = camera_to_ego(obj)
    _, w, l = obj.dimensions
    return StaticObstacle(
        obstacle_id=scenario.generate_object_id(),
        obstacle_type="parkedVehicle",
        shape=RectShape(length=l, width=w),
        initial_state=State(position=pos, orientation=orient, time_step=0),
    )


def dynamic_obstacle_from(obj: KittiObject, scenario: Scenario, vmin: float,
                          vmax: float, rng: np.random.RandomState,
                          steps: int = 19) -> DynamicObstacle:
    pos, orient = camera_to_ego(obj)
    _, w, l = obj.dimensions
    v = float(rng.uniform(vmin, vmax))
    # movement heading is the obstacle orientation + pi (mod 2pi) — the
    # reference's flip (convert_gt_scenarios.py:130-132)
    heading = (orient + math.pi) % (2 * math.pi)
    states = []
    for j in range(1, steps + 1):
        p = pos + v * scenario.dt * j * np.array(
            [math.cos(heading), math.sin(heading)])
        states.append(State(position=p, orientation=orient, velocity=v,
                            time_step=j))
    return DynamicObstacle(
        obstacle_id=scenario.generate_object_id(),
        obstacle_type="car",
        shape=RectShape(length=l, width=w),
        initial_state=State(position=pos, orientation=orient, velocity=v,
                            time_step=0),
        trajectory=Trajectory(1, states),
    )


def convert_detection_scenario(objects: Sequence[KittiObject],
                               is_highway: bool,
                               direction: str = "straight",
                               cfg: ScenarioConfig = ScenarioConfig()) -> Scenario:
    """Detections -> all-static scenario (worst-case for the planner)."""
    band = "11_13" if is_highway else "6_8"
    sc = make_init_scenario(direction, band)
    for o in objects:
        if o.type not in cfg.obstacle_classes:
            continue
        sc.static_obstacles.append(static_obstacle_from(o, sc))
    return sc


def convert_gt_scenario(objects: Sequence[KittiObject],
                        annotations: Optional[Sequence[str]],
                        is_highway: bool, direction: str = "straight",
                        cfg: ScenarioConfig = ScenarioConfig(),
                        seed: int = 0) -> Scenario:
    """GT labels (+ per-line motion annotations) -> mixed scenario.

    `annotations[i]` corresponds to label line i over ALL lines (including
    non-vehicle classes), matching the reference's indexing
    (convert_gt_scenarios.py:217-229). None => all static.
    """
    band = "11_13" if is_highway else "6_8"
    vmin, vmax = ((cfg.highway_vmin, cfg.highway_vmax) if is_highway
                  else (cfg.street_vmin, cfg.street_vmax))
    rng = np.random.RandomState(seed)
    sc = make_init_scenario(direction, band)
    for i, o in enumerate(objects):
        if o.type not in cfg.obstacle_classes:
            continue
        code = annotations[i].strip() if annotations is not None else "0"
        if code == "n":
            continue
        if code == "0":
            sc.static_obstacles.append(static_obstacle_from(o, sc))
        elif code in ("1", "-1"):
            sc.dynamic_obstacles.append(dynamic_obstacle_from(
                o, sc, vmin, vmax, rng, cfg.dynamic_rollout_steps))
    return sc


# ---------------------------------------------------------------------------
# Folder-level drivers (the reference's CLI contracts)
# ---------------------------------------------------------------------------

def convert_detection_folder(label_dir: str, out_dir: str,
                             road_dynamic_label_dir: Optional[str] = None,
                             direction: str = "straight",
                             cfg: ScenarioConfig = ScenarioConfig()) -> List[str]:
    """Each label txt -> scenario XML named <id>.xml. Road type = highway
    iff the same file name exists in `road_dynamic_label_dir`
    (convert_scenarios.py:106-112)."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for name in sorted(os.listdir(label_dir)):
        if not name.endswith(".txt"):
            continue
        objs = read_label(os.path.join(label_dir, name))
        is_highway = bool(
            road_dynamic_label_dir
            and os.path.exists(os.path.join(road_dynamic_label_dir, name)))
        sc = convert_detection_scenario(objs, is_highway, direction, cfg)
        stem = name.rsplit(".", 1)[0]
        sc.benchmark_id = stem
        path = os.path.join(out_dir, stem + ".xml")
        write_scenario(sc, path)
        written.append(path)
    return written


def convert_gt_folder(kitti_labeled_dir: str, out_dir: str,
                      direction: str = "straight",
                      cfg: ScenarioConfig = ScenarioConfig(),
                      seed: int = 0) -> List[str]:
    """The reference's three-class GT conversion over a `kitti_labeled/`
    tree: static_label/, dynamic_label/ + dynamic_annotation/,
    road_dynamic_label/ + road_dynamic_annotation/
    (convert_gt_scenarios.py:154-271)."""
    os.makedirs(out_dir, exist_ok=True)
    written = []

    def emit(objs, annos, is_highway, stem, idx):
        sc = convert_gt_scenario(objs, annos, is_highway, direction, cfg,
                                 seed=seed + idx)
        sc.benchmark_id = stem
        path = os.path.join(out_dir, stem + ".xml")
        write_scenario(sc, path)
        written.append(path)

    def labels_in(sub):
        d = os.path.join(kitti_labeled_dir, sub)
        return sorted(os.listdir(d)) if os.path.isdir(d) else []

    for i, name in enumerate(labels_in("static_label")):
        objs = read_label(os.path.join(kitti_labeled_dir, "static_label", name))
        emit(objs, None, False, name.rsplit(".", 1)[0], i)
    for i, name in enumerate(labels_in("dynamic_label")):
        objs = read_label(os.path.join(kitti_labeled_dir, "dynamic_label", name))
        anno_path = os.path.join(kitti_labeled_dir, "dynamic_annotation", name)
        annos = open(anno_path).read().splitlines() if os.path.exists(anno_path) else None
        emit(objs, annos, False, name.rsplit(".", 1)[0], 1000 + i)
    for i, name in enumerate(labels_in("road_dynamic_label")):
        objs = read_label(os.path.join(kitti_labeled_dir, "road_dynamic_label", name))
        anno_path = os.path.join(kitti_labeled_dir, "road_dynamic_annotation", name)
        annos = open(anno_path).read().splitlines() if os.path.exists(anno_path) else None
        emit(objs, annos, True, name.rsplit(".", 1)[0], 2000 + i)
    return written
