"""Vehicle parameter tables.

Capability parity: vehiclemodels.parameters_vehicle2 (BMW 320i) consumed at
/root/reference/evaluation/check_collision.py:25,78-79 and the KS
(kinematic single-track) model used by the planner/solution format
(plan_motion.py:113-118: VehicleModel.KS, VehicleType.BMW_320i).
Values are the published CommonRoad vehicle-model constants.
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class VehicleParams:
    name: str
    length: float            # l  [m]
    width: float             # w  [m]
    wheelbase: float         # a + b [m]
    steering_min: float      # delta min [rad]
    steering_max: float
    steering_v_min: float    # steering rate bounds [rad/s]
    steering_v_max: float
    v_min: float             # longitudinal velocity bounds [m/s]
    v_max: float
    a_max: float             # max acceleration [m/s^2]


# CommonRoad vehicle model 2 (BMW 320i)
BMW320I = VehicleParams(
    name="BMW_320i",
    length=4.508,
    width=1.610,
    wheelbase=2.578,         # a=1.1561957064, b=1.4227170936
    steering_min=-1.066,
    steering_max=1.066,
    steering_v_min=-0.4,
    steering_v_max=0.4,
    v_min=-13.6,
    v_max=50.8,
    a_max=11.5,
)

# CommonRoad vehicle model 1 (Ford Escort)
FORD_ESCORT = VehicleParams(
    name="FORD_ESCORT", length=4.298, width=1.674, wheelbase=2.389,
    steering_min=-0.910, steering_max=0.910,
    steering_v_min=-0.4, steering_v_max=0.4,
    v_min=-11.2, v_max=45.8, a_max=11.5)

# CommonRoad vehicle model 3 (VW Vanagon)
VW_VANAGON = VehicleParams(
    name="VW_VANAGON", length=4.569, width=1.844, wheelbase=3.775,
    steering_min=-1.023, steering_max=1.023,
    steering_v_min=-0.4, steering_v_max=0.4,
    v_min=-11.2, v_max=41.7, a_max=11.5)

VEHICLES = {1: FORD_ESCORT, 2: BMW320I, 3: VW_VANAGON}
