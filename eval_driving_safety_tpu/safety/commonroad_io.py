"""Minimal CommonRoad 2020a XML reader/writer (the subset the pipeline uses).

File-format compatibility targets (so scenarios/solutions interoperate with
the reference tooling):
* scenario XML structure as in the reference's init templates
  (/root/reference/evaluation/init_scenario/straight/initial_scenario_6_8.xml:
  commonRoad@timeStepSize/benchmarkID, lanelet/leftBound/rightBound points,
  planningProblem initial/goal states) plus static/dynamic obstacles written
  the way commonroad-io 2020a serializes them (consumed at
  /root/reference/evaluation/convert_scenarios.py:112-143);
* solution XML with benchmark id `KS1:SM1:<scenario_id>:2020a` and the file
  name `solution_KS1:SM1:<scenario_id>:2020a.xml` whose chars [17:23] are
  the 6-digit KITTI id (relied on by
  /root/reference/evaluation/check_collision.py:63).

Host-side pure Python (xml.etree); tiny data — not a TPU workload.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple
from xml.etree import ElementTree as ET

import numpy as np


# ---------------------------------------------------------------------------
# Data model
# ---------------------------------------------------------------------------

@dataclass
class State:
    position: np.ndarray            # (2,)
    orientation: float = 0.0
    time_step: int = 0
    velocity: float = 0.0
    steering_angle: Optional[float] = None
    yaw_rate: Optional[float] = None
    slip_angle: Optional[float] = None


@dataclass
class Trajectory:
    initial_time_step: int
    states: List[State]


@dataclass
class RectShape:
    length: float
    width: float
    orientation: float = 0.0
    center: Tuple[float, float] = (0.0, 0.0)


@dataclass
class StaticObstacle:
    obstacle_id: int
    obstacle_type: str              # e.g. "parkedVehicle"
    shape: RectShape
    initial_state: State


@dataclass
class DynamicObstacle:
    obstacle_id: int
    obstacle_type: str              # e.g. "car"
    shape: RectShape
    initial_state: State
    trajectory: Trajectory


@dataclass
class Interval:
    start: float
    end: float


@dataclass
class GoalState:
    position: RectShape
    orientation: Interval
    time: Interval
    velocity: Interval


@dataclass
class PlanningProblem:
    problem_id: int
    initial_state: State
    goal: GoalState


@dataclass
class Lanelet:
    lanelet_id: int
    left_bound: np.ndarray          # (N, 2)
    right_bound: np.ndarray         # (N, 2)
    lanelet_type: str = "urban"
    adjacent_left: Optional[Tuple[int, str]] = None
    adjacent_right: Optional[Tuple[int, str]] = None


@dataclass
class Scenario:
    benchmark_id: str
    dt: float = 0.1
    lanelets: List[Lanelet] = field(default_factory=list)
    static_obstacles: List[StaticObstacle] = field(default_factory=list)
    dynamic_obstacles: List[DynamicObstacle] = field(default_factory=list)
    planning_problems: List[PlanningProblem] = field(default_factory=list)
    author: str = ""
    affiliation: str = ""

    _next_id: int = 1000

    def generate_object_id(self) -> int:
        self._next_id += 1
        return self._next_id

    @property
    def obstacles(self):
        return list(self.static_obstacles) + list(self.dynamic_obstacles)


# ---------------------------------------------------------------------------
# Parsing helpers
# ---------------------------------------------------------------------------

def _f(el, tag, default=None):
    c = el.find(tag)
    return float(c.text) if c is not None and c.text else default


def _exact_or_interval(el):
    """Returns (exact, Interval) — one of the two is None."""
    if el is None:
        return None, None
    e = el.find("exact")
    if e is not None:
        return float(e.text), None
    s, t = el.find("intervalStart"), el.find("intervalEnd")
    if s is not None:
        return None, Interval(float(s.text), float(t.text))
    return None, None


def _parse_point(el):
    return np.array([_f(el, "x"), _f(el, "y")])


def _parse_bound(el):
    return np.array([[_f(p, "x"), _f(p, "y")] for p in el.findall("point")])


def _parse_state(el) -> State:
    pos_el = el.find("position/point")
    pos = _parse_point(pos_el) if pos_el is not None else np.zeros(2)
    orient, _ = _exact_or_interval(el.find("orientation"))
    t, _ = _exact_or_interval(el.find("time"))
    v, _ = _exact_or_interval(el.find("velocity"))
    yr, _ = _exact_or_interval(el.find("yawRate"))
    sa, _ = _exact_or_interval(el.find("slipAngle"))
    st, _ = _exact_or_interval(el.find("steeringAngle"))
    return State(position=pos, orientation=orient or 0.0,
                 time_step=int(t or 0), velocity=v or 0.0,
                 steering_angle=st, yaw_rate=yr, slip_angle=sa)


def _parse_rect(el) -> RectShape:
    center_el = el.find("center")
    center = ((float(_f(center_el, "x")), float(_f(center_el, "y")))
              if center_el is not None else (0.0, 0.0))
    return RectShape(length=_f(el, "length"), width=_f(el, "width"),
                     orientation=_f(el, "orientation", 0.0), center=center)


def read_scenario(path: str) -> Scenario:
    root = ET.parse(path).getroot()
    sc = Scenario(
        benchmark_id=root.get("benchmarkID", ""),
        dt=float(root.get("timeStepSize", "0.1")),
        author=root.get("author", ""),
        affiliation=root.get("affiliation", ""),
    )
    max_id = 1000
    for lel in root.findall("lanelet"):
        lid = int(lel.get("id"))
        max_id = max(max_id, lid)
        adj_l = lel.find("adjacentLeft")
        adj_r = lel.find("adjacentRight")
        sc.lanelets.append(Lanelet(
            lanelet_id=lid,
            left_bound=_parse_bound(lel.find("leftBound")),
            right_bound=_parse_bound(lel.find("rightBound")),
            lanelet_type=(lel.findtext("laneletType") or "urban").strip(),
            adjacent_left=(int(adj_l.get("ref")), adj_l.get("drivingDir"))
            if adj_l is not None else None,
            adjacent_right=(int(adj_r.get("ref")), adj_r.get("drivingDir"))
            if adj_r is not None else None,
        ))
    for oel in root.findall("staticObstacle"):
        oid = int(oel.get("id"))
        max_id = max(max_id, oid)
        sc.static_obstacles.append(StaticObstacle(
            obstacle_id=oid,
            obstacle_type=(oel.findtext("type") or "parkedVehicle").strip(),
            shape=_parse_rect(oel.find("shape/rectangle")),
            initial_state=_parse_state(oel.find("initialState")),
        ))
    for oel in root.findall("dynamicObstacle"):
        oid = int(oel.get("id"))
        max_id = max(max_id, oid)
        states = [_parse_state(s) for s in
                  oel.findall("trajectory/state")]
        init = _parse_state(oel.find("initialState"))
        sc.dynamic_obstacles.append(DynamicObstacle(
            obstacle_id=oid,
            obstacle_type=(oel.findtext("type") or "car").strip(),
            shape=_parse_rect(oel.find("shape/rectangle")),
            initial_state=init,
            trajectory=Trajectory(states[0].time_step if states else 1,
                                  states),
        ))
    for pel in root.findall("planningProblem"):
        goal_el = pel.find("goalState")
        _, orient_iv = _exact_or_interval(goal_el.find("orientation"))
        _, time_iv = _exact_or_interval(goal_el.find("time"))
        _, vel_iv = _exact_or_interval(goal_el.find("velocity"))
        sc.planning_problems.append(PlanningProblem(
            problem_id=int(pel.get("id")),
            initial_state=_parse_state(pel.find("initialState")),
            goal=GoalState(
                position=_parse_rect(goal_el.find("position/rectangle")),
                orientation=orient_iv or Interval(-np.pi, np.pi),
                time=time_iv or Interval(0, 1000),
                velocity=vel_iv or Interval(0.0, 100.0),
            ),
        ))
    sc._next_id = max_id
    return sc


# ---------------------------------------------------------------------------
# Writing
# ---------------------------------------------------------------------------

def _sub(parent, tag, text=None, **attrs):
    el = ET.SubElement(parent, tag, {k: str(v) for k, v in attrs.items()})
    if text is not None:
        el.text = str(text)
    return el


def _write_point(parent, xy):
    p = _sub(parent, "point")
    _sub(p, "x", f"{xy[0]}")
    _sub(p, "y", f"{xy[1]}")


def _write_exact(parent, tag, value):
    _sub(_sub(parent, tag), "exact", value)


def _write_interval(parent, tag, iv: Interval):
    el = _sub(parent, tag)
    _sub(el, "intervalStart", iv.start)
    _sub(el, "intervalEnd", iv.end)


def _write_state(parent, tag, s: State, with_kinematics=False):
    el = _sub(parent, tag)
    pos = _sub(el, "position")
    _write_point(pos, s.position)
    _write_exact(el, "orientation", s.orientation)
    _write_exact(el, "time", s.time_step)
    _write_exact(el, "velocity", s.velocity)
    if with_kinematics:
        _write_exact(el, "yawRate", s.yaw_rate or 0.0)
        _write_exact(el, "slipAngle", s.slip_angle or 0.0)
    return el


def _write_rect(parent, r: RectShape, with_center=False):
    rect = _sub(_sub(parent, "shape"), "rectangle")
    _sub(rect, "length", r.length)
    _sub(rect, "width", r.width)
    if with_center:
        _sub(rect, "orientation", r.orientation)
        c = _sub(rect, "center")
        _sub(c, "x", r.center[0])
        _sub(c, "y", r.center[1])
    return rect


def write_scenario(sc: Scenario, path: str) -> None:
    root = ET.Element("commonRoad", {
        "timeStepSize": str(sc.dt),
        "commonRoadVersion": "2020a",
        "author": sc.author,
        "affiliation": sc.affiliation,
        "source": "",
        "benchmarkID": sc.benchmark_id,
        "date": "2026-01-01",
    })
    loc = _sub(root, "location")
    _sub(loc, "geoNameId", -999)
    _sub(loc, "gpsLatitude", 999.0)
    _sub(loc, "gpsLongitude", 999.0)
    tags = _sub(root, "scenarioTags")
    _sub(tags, "interstate")
    _sub(tags, "critical")
    for ll in sc.lanelets:
        lel = _sub(root, "lanelet", id=ll.lanelet_id)
        lb = _sub(lel, "leftBound")
        for p in ll.left_bound:
            _write_point(lb, p)
        rb = _sub(lel, "rightBound")
        for p in ll.right_bound:
            _write_point(rb, p)
        if ll.adjacent_left:
            _sub(lel, "adjacentLeft", ref=ll.adjacent_left[0],
                 drivingDir=ll.adjacent_left[1])
        if ll.adjacent_right:
            _sub(lel, "adjacentRight", ref=ll.adjacent_right[0],
                 drivingDir=ll.adjacent_right[1])
        _sub(lel, "laneletType", ll.lanelet_type)
    for ob in sc.static_obstacles:
        oel = _sub(root, "staticObstacle", id=ob.obstacle_id)
        _sub(oel, "type", ob.obstacle_type)
        _write_rect(oel, ob.shape)
        _write_state(oel, "initialState", ob.initial_state)
    for ob in sc.dynamic_obstacles:
        oel = _sub(root, "dynamicObstacle", id=ob.obstacle_id)
        _sub(oel, "type", ob.obstacle_type)
        _write_rect(oel, ob.shape)
        _write_state(oel, "initialState", ob.initial_state)
        tr = _sub(oel, "trajectory")
        for s in ob.trajectory.states:
            _write_state(tr, "state", s)
    for pp in sc.planning_problems:
        pel = _sub(root, "planningProblem", id=pp.problem_id)
        _write_state(pel, "initialState", pp.initial_state,
                     with_kinematics=True)
        goal = _sub(pel, "goalState")
        pos = _sub(goal, "position")
        rect = _sub(pos, "rectangle")
        _sub(rect, "length", pp.goal.position.length)
        _sub(rect, "width", pp.goal.position.width)
        _sub(rect, "orientation", pp.goal.position.orientation)
        c = _sub(rect, "center")
        _sub(c, "x", pp.goal.position.center[0])
        _sub(c, "y", pp.goal.position.center[1])
        _write_interval(goal, "orientation", pp.goal.orientation)
        t = _sub(goal, "time")
        _sub(t, "intervalStart", int(pp.goal.time.start))
        _sub(t, "intervalEnd", int(pp.goal.time.end))
        _write_interval(goal, "velocity", pp.goal.velocity)
    tree = ET.ElementTree(root)
    ET.indent(tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tree.write(path, encoding="UTF-8", xml_declaration=True)


# ---------------------------------------------------------------------------
# Solutions
# ---------------------------------------------------------------------------

def solution_benchmark_id(scenario_id: str, vehicle: str = "KS1",
                          cost: str = "SM1") -> str:
    return f"{vehicle}:{cost}:{scenario_id}:2020a"


def solution_file_name(scenario_id: str) -> str:
    """`solution_KS1:SM1:<id>:2020a.xml` — chars [17:23] of the name are the
    scenario id (check_collision.py:63 contract)."""
    return f"solution_{solution_benchmark_id(scenario_id)}.xml"


def write_solution(output_dir: str, scenario_id: str, trajectory: Trajectory,
                   planning_problem_id: int, dt: float = 0.1) -> str:
    root = ET.Element("CommonRoadSolution", {
        "benchmark_id": solution_benchmark_id(scenario_id),
        "date": "2026-01-01",
    })
    pps = _sub(root, "planningProblemSolution",
               planningProblem=planning_problem_id)
    tr = _sub(pps, "trajectory")
    for s in trajectory.states:
        sel = _sub(tr, "state")
        pos = _sub(sel, "position")
        _write_point(pos, s.position)
        _write_exact(sel, "orientation", s.orientation)
        _write_exact(sel, "time", s.time_step)
        _write_exact(sel, "velocity", s.velocity)
        _write_exact(sel, "steeringAngle", s.steering_angle or 0.0)
    tree = ET.ElementTree(root)
    ET.indent(tree)
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, solution_file_name(scenario_id))
    tree.write(path, encoding="UTF-8", xml_declaration=True)
    return path


def read_solution(path: str) -> Tuple[str, int, Trajectory]:
    """Returns (benchmark_id, planning_problem_id, trajectory)."""
    root = ET.parse(path).getroot()
    pps = root.find("planningProblemSolution")
    states = [_parse_state(s) for s in pps.findall("trajectory/state")]
    return (root.get("benchmark_id", ""),
            int(pps.get("planningProblem", "100")),
            Trajectory(states[0].time_step if states else 0, states))
