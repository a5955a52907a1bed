"""Scenario / solution plotting (matplotlib).

Capability parity: /root/reference/evaluation/plot_scenario.py and
plot_solution.py — render lanelets, obstacles, the planning goal and (for
solutions) the ego trajectory to PNG.
"""
from __future__ import annotations

import math
import numpy as np


def _rect_corners(cx, cy, length, width, orient):
    c, s = math.cos(orient), math.sin(orient)
    pts = np.array([[length / 2, width / 2], [length / 2, -width / 2],
                    [-length / 2, -width / 2], [-length / 2, width / 2]])
    rot = pts @ np.array([[c, s], [-s, c]])
    return rot + np.array([cx, cy])


def plot_scenario(scenario, out_path: str, trajectory=None,
                  xlim=(-10, 40), ylim=(-15, 15)):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Polygon

    fig, ax = plt.subplots(figsize=(10, 6))
    for ll in scenario.lanelets:
        ax.plot(ll.left_bound[:, 0], ll.left_bound[:, 1], color="#cccccc",
                lw=0.5)
        ax.plot(ll.right_bound[:, 0], ll.right_bound[:, 1], color="#cccccc",
                lw=0.5)
    for ob in scenario.static_obstacles:
        st = ob.initial_state
        ax.add_patch(Polygon(_rect_corners(
            st.position[0], st.position[1], ob.shape.length, ob.shape.width,
            st.orientation), closed=True, facecolor="#4477aa",
            edgecolor="k", alpha=0.8))
    for ob in scenario.dynamic_obstacles:
        for st in [ob.initial_state] + list(ob.trajectory.states):
            ax.add_patch(Polygon(_rect_corners(
                st.position[0], st.position[1], ob.shape.length,
                ob.shape.width, st.orientation), closed=True,
                facecolor="#ee8866", edgecolor="none", alpha=0.25))
    for pp in scenario.planning_problems:
        gp = pp.goal.position
        ax.add_patch(Polygon(_rect_corners(
            gp.center[0], gp.center[1], gp.length, gp.width, gp.orientation),
            closed=True, facecolor="#66bb66", alpha=0.4, edgecolor="g"))
        ax.plot(*pp.initial_state.position, "k^", markersize=8)
    if trajectory is not None:
        xs = [s.position[0] for s in trajectory.states]
        ys = [s.position[1] for s in trajectory.states]
        ax.plot(xs, ys, "g-", lw=2)
        for s in trajectory.states[:: max(len(trajectory.states) // 8, 1)]:
            ax.add_patch(Polygon(_rect_corners(
                s.position[0], s.position[1], 4.508, 1.610, s.orientation),
                closed=True, facecolor="none", edgecolor="green", lw=0.8))
    ax.set_xlim(*xlim)
    ax.set_ylim(*ylim)
    ax.set_aspect("equal")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_solution(scenario, trajectory, out_path: str, **kw):
    plot_scenario(scenario, out_path, trajectory=trajectory, **kw)
