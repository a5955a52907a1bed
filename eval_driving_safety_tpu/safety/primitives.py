"""Kinematic-single-track (KS) motion-primitive generation.

Capability parity: the motion-primitive XMLs named at
/root/reference/evaluation/plan_motion.py:36-37 —
`V_{6.0_8.0|11.0_13.0}_Vstep_{0|2.0}_SA_-1.066_1.066_SAstep_0.36_T_0.5_Model_BMW320i`
— consumed by commonroad-search's maneuver automaton. The reference does not
vendor these files (SURVEY.md §7 hard parts); here they are *generated* by
forward-simulating the KS model:

    x' = v cos(psi),  y' = v sin(psi),
    delta' = v_delta, v' = a, psi' = v / L tan(delta)

with constant input rates over T = 0.5 s, sampled at dt = 0.1 s.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from typing import List

import numpy as np

from eval_driving_safety_tpu.config import PlannerConfig
from eval_driving_safety_tpu.safety.vehicle import BMW320I, VehicleParams


@dataclass(frozen=True)
class MotionPrimitive:
    """One maneuver: (v0, sa0) -> (v1, sa1) over T seconds.

    `states` is a (K+1, 5) array of (x, y, orientation, velocity,
    steering_angle) starting at the origin pose; row 0 is the start state.
    """
    v_start: float
    v_end: float
    sa_start: float
    sa_end: float
    states: np.ndarray

    @property
    def num_steps(self) -> int:
        return self.states.shape[0] - 1


def simulate_ks(v0: float, sa0: float, v1: float, sa1: float, *,
                duration: float, dt: float,
                vehicle: VehicleParams = BMW320I) -> np.ndarray:
    """Integrate the KS model with constant a / v_delta (RK-free fine-step
    Euler: 10 substeps per dt keeps the 0.5 s arc accurate to < 1 mm)."""
    n = int(round(duration / dt))
    a = (v1 - v0) / duration
    vd = (sa1 - sa0) / duration
    sub = 10
    h = dt / sub
    x = y = psi = 0.0
    v, sa = v0, sa0
    out = [(x, y, psi, v, sa)]
    for _ in range(n):
        for _ in range(sub):
            x += v * math.cos(psi) * h
            y += v * math.sin(psi) * h
            psi += v / vehicle.wheelbase * math.tan(sa) * h
            v += a * h
            sa += vd * h
        out.append((x, y, psi, v, sa))
    return np.asarray(out)


def sample_values(lo: float, hi: float, step: float) -> List[float]:
    """Inclusive sampling; step <= 0 means just the endpoints."""
    if step <= 0:
        return [lo, hi] if hi > lo else [lo]
    vals = list(np.arange(lo, hi + 1e-9, step))
    if abs(vals[-1] - hi) > 1e-6:
        vals.append(hi)
    return [float(v) for v in vals]


def generate_primitives(vmin: float, vmax: float, vstep: float,
                        cfg: PlannerConfig = PlannerConfig(),
                        vehicle: VehicleParams = BMW320I
                        ) -> List[MotionPrimitive]:
    """The full primitive set for one velocity band.

    Connectivity: steering may move to an adjacent sample (or stay);
    velocity to any sample reachable within a_max * T.
    """
    v_samples = sample_values(vmin, vmax, vstep)
    sa_samples = sample_values(cfg.steering_min, cfg.steering_max,
                               cfg.steering_step)
    max_dv = vehicle.a_max * cfg.primitive_duration
    prims = []
    for v0 in v_samples:
        for v1 in v_samples:
            if abs(v1 - v0) > max_dv + 1e-9:
                continue
            for sa0 in sa_samples:
                for sa1 in sa_samples:
                    if abs(sa1 - sa0) > cfg.steering_step + 1e-9:
                        continue
                    states = simulate_ks(
                        v0, sa0, v1, sa1,
                        duration=cfg.primitive_duration, dt=cfg.dt,
                        vehicle=vehicle)
                    prims.append(MotionPrimitive(v0, v1, sa0, sa1, states))
    return prims


@lru_cache(maxsize=8)
def primitives_for_band(is_highway: bool,
                        cfg: PlannerConfig = PlannerConfig()
                        ) -> List[MotionPrimitive]:
    """Street 6-8 (vstep 0 -> endpoints) or highway 11-13 (vstep 2), the
    reference's two named primitive files (plan_motion.py:36-37,67-72).
    Cached: the bank depends only on (is_highway, cfg) and the reference
    likewise builds its automaton once per sweep."""
    band = cfg.highway_v if is_highway else cfg.street_v
    return generate_primitives(band[0], band[1], band[2], cfg)


def transform_states(states: np.ndarray, x: float, y: float,
                     psi: float) -> np.ndarray:
    """Rigid-transform primitive-local states into the world pose."""
    c, s = math.cos(psi), math.sin(psi)
    out = states.copy()
    out[:, 0] = x + c * states[:, 0] - s * states[:, 1]
    out[:, 1] = y + s * states[:, 0] + c * states[:, 1]
    out[:, 2] = psi + states[:, 2]
    return out
