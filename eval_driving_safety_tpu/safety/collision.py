"""Collision checking: ctypes wrapper over the C++ OBB core + numpy fallback.

Capability parity: /root/reference/evaluation/check_collision.py:70-107 —
rebuild the ego trajectory as a sequence of BMW320i rectangles, test against
the (ground-truth) scenario with time-step alignment for dynamic obstacles,
count collisions over a solution folder, and write `collision.txt`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from eval_driving_safety_tpu.safety.commonroad_io import (
    Scenario, Trajectory, read_scenario, read_solution)
from eval_driving_safety_tpu.safety.vehicle import BMW320I

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcollision.so")
_lib = None


def _build_native() -> bool:
    src = os.path.join(_NATIVE_DIR, "collision.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", _LIB_PATH],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_native():
    """Load (building if needed) the C++ collision library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build_native():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.obb_intersect.restype = ctypes.c_int
        lib.trajectory_first_collision.restype = ctypes.c_int
        _lib = lib
        return _lib
    except OSError:
        return None


# ---------------------------------------------------------------------------
# numpy fallback (identical semantics)
# ---------------------------------------------------------------------------

def _obb_overlap_np(a, b) -> bool:
    """rows: (cx, cy, orient, length, width)."""
    ca, sa = np.cos(a[2]), np.sin(a[2])
    cb, sb = np.cos(b[2]), np.sin(b[2])
    d = np.array([b[0] - a[0], b[1] - a[1]])
    for ax, ay in ((ca, sa), (-sa, ca), (cb, sb), (-sb, cb)):
        dist = abs(d[0] * ax + d[1] * ay)
        ra = (a[3] / 2) * abs(ax * ca + ay * sa) + \
             (a[4] / 2) * abs(-ax * sa + ay * ca)
        rb = (b[3] / 2) * abs(ax * cb + ay * sb) + \
             (b[4] / 2) * abs(-ax * sb + ay * cb)
        if dist > ra + rb:
            return False
    return True


def obb_intersect(a, b) -> bool:
    lib = get_native()
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    if lib is not None:
        return bool(lib.obb_intersect(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_double))))
    return _obb_overlap_np(a, b)


# ---------------------------------------------------------------------------
# scenario-level API
# ---------------------------------------------------------------------------

def scenario_arrays(scenario: Scenario) -> Tuple[np.ndarray, np.ndarray]:
    """(static (M,5), dynamic (N,6)) arrays for the native core.

    Dynamic rows include the obstacle's initial state (t=0) plus every
    trajectory state.
    """
    stat = []
    for ob in scenario.static_obstacles:
        s = ob.initial_state
        stat.append([s.position[0], s.position[1], s.orientation,
                     ob.shape.length, ob.shape.width])
    dyn = []
    for ob in scenario.dynamic_obstacles:
        for s in [ob.initial_state] + list(ob.trajectory.states):
            dyn.append([float(s.time_step), s.position[0], s.position[1],
                        s.orientation, ob.shape.length, ob.shape.width])
    return (np.asarray(stat, np.float64).reshape(-1, 5),
            np.asarray(dyn, np.float64).reshape(-1, 6))


def ego_array(trajectory: Trajectory, length: float = BMW320I.length,
              width: float = BMW320I.width) -> np.ndarray:
    rows = [[float(s.time_step), s.position[0], s.position[1],
             s.orientation, length, width] for s in trajectory.states]
    return np.asarray(rows, np.float64).reshape(-1, 6)


def first_collision_arrays(ego: np.ndarray, stat: np.ndarray,
                           dyn: np.ndarray) -> int:
    """Index of the first colliding ego row, or -1.

    ego (T,6) rows (t, cx, cy, orient, len, wid); stat (M,5); dyn (N,6)
    time-stamped. Native C++ core with a numpy fallback — the single
    entry point shared by the scenario API and the planner's segment
    pruning."""
    ego = np.ascontiguousarray(ego, np.float64)
    stat = np.ascontiguousarray(stat, np.float64)
    dyn = np.ascontiguousarray(dyn, np.float64)
    lib = get_native()
    if lib is not None:
        return int(lib.trajectory_first_collision(
            ego.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(ego),
            stat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(stat),
            dyn.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(dyn)))
    for i, e in enumerate(ego):
        for s_row in stat:
            if _obb_overlap_np(e[1:], s_row):
                return i
        for d_row in dyn:
            if d_row[0] == e[0] and _obb_overlap_np(e[1:], d_row[1:]):
                return i
    return -1


def first_collision(scenario: Scenario, trajectory: Trajectory,
                    length: float = BMW320I.length,
                    width: float = BMW320I.width) -> int:
    """Index of the first colliding ego state, or -1."""
    ego = ego_array(trajectory, length, width)
    stat, dyn = scenario_arrays(scenario)
    return first_collision_arrays(ego, stat, dyn)


def collides(scenario: Scenario, trajectory: Trajectory, **kw) -> bool:
    return first_collision(scenario, trajectory, **kw) >= 0


def check_solution_folder(gt_scenario_dir: str, solution_dir: str,
                          collision_txt: Optional[str] = None,
                          return_trajectories: bool = False):
    """Pair every solution with its GT scenario via the 6-char id embedded
    in the solution file name (check_collision.py:58-64), count collisions,
    optionally write `collision.txt` with the count (:106-107)."""
    names = sorted(
        f for f in os.listdir(solution_dir)
        if f.startswith("solution") and f.endswith(".xml")) \
        if os.path.isdir(solution_dir) else []
    colliding = []
    trajectories = {}
    for name in names:
        sid = name[17:23]
        scen_path = os.path.join(gt_scenario_dir, sid + ".xml")
        if not os.path.exists(scen_path):
            # silently counting a missing scenario as collision-free would
            # corrupt every downstream rate — fail loudly like the reference
            raise FileNotFoundError(
                f"GT scenario for solution {name!r} not found: {scen_path}")
        scenario = read_scenario(scen_path)
        _, _, traj = read_solution(os.path.join(solution_dir, name))
        trajectories[name] = traj
        if collides(scenario, traj):
            colliding.append(sid)
    if collision_txt:
        with open(collision_txt, "w") as f:
            f.write(str(len(colliding)))
    if return_trajectories:
        return len(colliding), colliding, trajectories
    return len(colliding), colliding
