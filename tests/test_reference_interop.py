"""Interop against the REAL reference artifacts mounted at /root/reference:
the six 43.5k-line init-scenario templates and the kitti_labeled GT
annotation tree (VERDICT.md missing #4). Skipped when the reference mount
is absent."""
import os
import shutil

import numpy as np
import pytest

REF = "/root/reference/evaluation"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not mounted")

from eval_driving_safety_tpu.safety.commonroad_io import read_scenario  # noqa: E402
from eval_driving_safety_tpu.safety.templates import (  # noqa: E402
    GOAL_Y, V_BANDS, make_init_scenario)

DIRECTIONS = ("straight", "left", "right")
BANDS = ("6_8", "11_13")


def _ref_template(direction, band):
    return os.path.join(REF, "init_scenario", direction,
                        f"initial_scenario_{band}.xml")


@pytest.mark.parametrize("direction", DIRECTIONS)
@pytest.mark.parametrize("band", BANDS)
def test_reference_templates_parse_and_match_spec(direction, band):
    sc = read_scenario(_ref_template(direction, band))
    assert len(sc.lanelets) == 27
    # 3.5 m lanes tiling y in [-47.25, 47.25], x in [-10, 189], 200 pts
    ys = sorted(l.right_bound[0, 1] for l in sc.lanelets)
    np.testing.assert_allclose(ys, -47.25 + 3.5 * np.arange(27))
    for l in sc.lanelets:
        assert l.left_bound.shape == (200, 2)
        np.testing.assert_allclose(l.left_bound[0, 0], -10.0)
        np.testing.assert_allclose(l.left_bound[-1, 0], 189.0)
        np.testing.assert_allclose(
            l.left_bound[0, 1] - l.right_bound[0, 1], 3.5)
    # adjacency chain: exactly one lanelet lacks each side
    assert sum(l.adjacent_left is None for l in sc.lanelets) == 1
    assert sum(l.adjacent_right is None for l in sc.lanelets) == 1

    assert len(sc.planning_problems) == 1
    pp = sc.planning_problems[0]
    assert pp.problem_id == 100
    np.testing.assert_allclose(pp.initial_state.position, [0.0, 0.0])
    assert pp.initial_state.velocity == 0.0
    g = pp.goal
    assert (g.position.length, g.position.width) == (5.0, 3.5)
    np.testing.assert_allclose(g.position.center, (15.0, GOAL_Y[direction]))
    assert (g.velocity.start, g.velocity.end) == V_BANDS[band]
    assert (g.time.start, g.time.end) == (4, 30)
    assert (g.orientation.start, g.orientation.end) == (-0.5, 0.5)


@pytest.mark.parametrize("direction", DIRECTIONS)
@pytest.mark.parametrize("band", BANDS)
def test_generated_template_matches_reference_geometry(direction, band):
    """safety.templates reproduces the reference road/goal exactly
    (VERDICT.md weak #3: 27 lanelets, not 25)."""
    ref = read_scenario(_ref_template(direction, band))
    mine = make_init_scenario(direction, band)
    assert len(mine.lanelets) == len(ref.lanelets) == 27
    ref_ys = sorted(l.right_bound[0, 1] for l in ref.lanelets)
    my_ys = sorted(l.right_bound[0, 1] for l in mine.lanelets)
    np.testing.assert_allclose(my_ys, ref_ys)
    for rl, ml in zip(sorted(ref.lanelets, key=lambda l: l.right_bound[0, 1]),
                      sorted(mine.lanelets, key=lambda l: l.right_bound[0, 1])):
        assert ml.left_bound.shape == rl.left_bound.shape == (200, 2)
        np.testing.assert_allclose(ml.left_bound, rl.left_bound)
        np.testing.assert_allclose(ml.right_bound, rl.right_bound)
    rg, mg = ref.planning_problems[0].goal, mine.planning_problems[0].goal
    np.testing.assert_allclose(mg.position.center, rg.position.center)
    assert (mg.velocity.start, mg.velocity.end) == (rg.velocity.start,
                                                    rg.velocity.end)
    assert (mg.time.start, mg.time.end) == (rg.time.start, rg.time.end)


def test_plan_on_reference_template():
    """The A* planner solves the real reference scenario file directly."""
    from eval_driving_safety_tpu.safety.planner import plan_scenario
    sc = read_scenario(_ref_template("straight", "6_8"))
    traj = plan_scenario(sc, is_highway=False)
    assert traj is not None
    final = traj.states[-1]
    # inside the 5 x 3.5 goal rectangle at (15, 0), within band and window
    assert 12.5 <= final.position[0] <= 17.5
    assert abs(final.position[1]) <= 1.75
    assert 6.0 <= final.velocity <= 8.0
    assert 4 <= final.time_step <= 30


def _first_n(sub, n):
    d = os.path.join(REF, "kitti_labeled", sub)
    return sorted(os.listdir(d))[:n]


def _expected_counts(label_path, anno_path):
    """Counts derived from the raw files per the reference semantics
    (convert_gt_scenarios.py:183,214-229): vehicle classes only, annotation
    line i maps to label line i, n=skip / 0=static / 1,-1=dynamic."""
    classes = ("Car", "Van", "Truck", "Misc")
    types = [ln.split()[0] for ln in open(label_path).read().splitlines()
             if ln.strip()]
    annos = (open(anno_path).read().splitlines() if anno_path else
             ["0"] * len(types))
    n_static = n_dyn = 0
    for t, a in zip(types, annos):
        if t not in classes:
            continue
        a = a.strip()
        if a == "0":
            n_static += 1
        elif a in ("1", "-1"):
            n_dyn += 1
    return n_static, n_dyn


def test_convert_gt_folder_on_reference_annotations(tmp_path):
    """convert_gt_folder runs on a sample of the REAL kitti_labeled tree;
    obstacle counts match the raw annotation codes, dynamic obstacles get
    19-step rollouts in the right velocity band."""
    from eval_driving_safety_tpu.safety.convert import convert_gt_folder

    labeled = tmp_path / "kitti_labeled"
    picked = {}
    for sub in ("static_label", "dynamic_label", "road_dynamic_label"):
        os.makedirs(labeled / sub)
        picked[sub] = _first_n(sub, 3)
        for name in picked[sub]:
            shutil.copy(os.path.join(REF, "kitti_labeled", sub, name),
                        labeled / sub / name)
    for sub in ("dynamic_annotation", "road_dynamic_annotation"):
        os.makedirs(labeled / sub)
        label_sub = sub.replace("annotation", "label")
        for name in picked[label_sub]:
            shutil.copy(os.path.join(REF, "kitti_labeled", sub, name),
                        labeled / sub / name)

    out = tmp_path / "scenarios"
    written = convert_gt_folder(str(labeled), str(out))
    assert len(written) == 9

    for sub, band in (("static_label", (6.0, 8.0)),
                      ("dynamic_label", (6.0, 8.0)),
                      ("road_dynamic_label", (11.0, 13.0))):
        anno_sub = sub.replace("label", "annotation")
        for name in picked[sub]:
            stem = name.rsplit(".", 1)[0]
            sc = read_scenario(str(out / f"{stem}.xml"))
            anno_path = (os.path.join(REF, "kitti_labeled", anno_sub, name)
                         if sub != "static_label" else None)
            ns, nd = _expected_counts(
                os.path.join(REF, "kitti_labeled", sub, name), anno_path)
            assert len(sc.static_obstacles) == ns, (sub, name)
            assert len(sc.dynamic_obstacles) == nd, (sub, name)
            assert len(sc.lanelets) == 27
            for dyn in sc.dynamic_obstacles:
                assert len(dyn.trajectory.states) == 19
                assert band[0] <= dyn.initial_state.velocity <= band[1]
