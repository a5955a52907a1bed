"""End-to-end demonstration of the full framework story:

  train (overfit) a tiny DSGN on a synthetic stereo scene
    -> detect the planted car
    -> PGD-attack the images
    -> detections degrade
    -> convert both to CommonRoad scenarios, plan, collision-check
    -> safety metrics flip.

Run on TPU (default env) or CPU (JAX_PLATFORMS=cpu, slower):
    python examples/end_to_end_demo.py
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eval_driving_safety_tpu.attack.pgd import pgd_attack
from eval_driving_safety_tpu.config import DSGNConfig
from eval_driving_safety_tpu.data.kitti import Calibration
from eval_driving_safety_tpu.inference.fcos3d_post import (
    decode_bev_outputs, detections_to_kitti)
from eval_driving_safety_tpu.models.dsgn import DSGN
from eval_driving_safety_tpu.models.rpn3d_loss import dsgn_total_loss

# --------------------------------------------------------------------------
# 1. synthetic stereo scene: textured card at (x=2, z=20) on a noise field
# --------------------------------------------------------------------------
cfg = DSGNConfig.tiny()
H, W = cfg.height, cfg.width
F_U, BASELINE = 200.0, 0.54
CU, CV = W / 2.0, H / 2.0
# the car sits ON the ego's straight path to the goal (x~0, 10 m ahead):
# a correct detection forces the planner around it; a degraded one lets
# the plan cut through the REAL car -> collision (the paper's thesis)
CAR = dict(x=0.0, y=1.6, z=10.0, h=1.5, w=1.7, l=4.0, ry=0.0)

rng = np.random.RandomState(0)
bg = rng.rand(H, W + 64, 3).astype(np.float32) * 0.3


def render_view(shift_px: float) -> np.ndarray:
    """Paint the textured car rectangle at its projected position minus the
    view's disparity shift."""
    img = bg[:, 32: 32 + W].copy()
    u = int(F_U * CAR["x"] / CAR["z"] + CU - shift_px)
    v = int(F_U * (CAR["y"] - CAR["h"] / 2) / CAR["z"] + CV)
    du = max(int(F_U * CAR["l"] / CAR["z"] / 2), 6)
    dv = max(int(F_U * CAR["h"] / CAR["z"] / 2), 4)
    texture = np.random.RandomState(7).rand(2 * dv, 2 * du, 3).astype(
        np.float32) * 0.6 + 0.4
    img[v - dv: v + dv, u - du: u + du] = texture[: 2 * dv, : 2 * du]
    return img


disp = F_U * BASELINE / CAR["z"]
im_l = jnp.asarray(render_view(0.0))[None]
im_r = jnp.asarray(render_view(disp))[None]
calib_vec = (jnp.array([F_U]), jnp.array([BASELINE]),
             jnp.array([CU]), jnp.array([CV]))
boxes3d = jnp.zeros((1, 8, 8)).at[0, 0].set(jnp.array(
    [CAR["x"], CAR["y"], CAR["z"], CAR["h"], CAR["w"], CAR["l"],
     CAR["ry"], 1.0]))
num_boxes = jnp.array([1], jnp.int32)
depth_gt = jnp.full((1, H, W), 0.0)
# depth supervision only on the card
u0 = int(F_U * CAR["x"] / CAR["z"] + CU)
v0 = int(F_U * (CAR["y"] - CAR["h"] / 2) / CAR["z"] + CV)
depth_gt = depth_gt.at[0, v0 - 6: v0 + 6, u0 - 8: u0 + 8].set(CAR["z"])

mean = np.asarray(cfg.input.mean, np.float32)
std = np.asarray(cfg.input.std, np.float32)

# --------------------------------------------------------------------------
# 2. overfit the detector on the scene
# --------------------------------------------------------------------------
model = DSGN(cfg)
params = jax.jit(model.init)(jax.random.PRNGKey(0),
                             (im_l - mean) / std, (im_r - mean) / std,
                             *calib_vec)
tx = optax.adam(2e-3)
opt_state = tx.init(params)


def loss_fn(p, il01, ir01):
    out = model.apply(p, (il01 - mean) / std, (ir01 - mean) / std,
                      *calib_vec)
    total, parts = dsgn_total_loss(out, depth_gt, boxes3d, num_boxes, cfg)
    return total, parts


@jax.jit
def train_step(p, o, il01, ir01):
    (total, parts), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(p, il01, ir01)
    updates, o = tx.update(grads, o)
    return optax.apply_updates(p, updates), o, total


print("training tiny DSGN on the synthetic scene ...")
for step in range(400):
    params, opt_state, total = train_step(params, opt_state, im_l, im_r)
    if step % 100 == 0:
        print(f"  step {step}: loss {float(total):.4f}")
print(f"  final loss {float(total):.4f}")


@jax.jit
def detect(il01, ir01):
    out = model.apply(params, (il01 - mean) / std, (ir01 - mean) / std,
                      *calib_vec)
    return decode_bev_outputs(out, cfg)


def describe(dets, tag):
    v = np.asarray(dets.valid[0])
    n = int(v.sum())
    if n == 0:
        print(f"{tag}: NO detections")
        return None
    b = np.asarray(dets.boxes3d[0, 0])
    s = float(dets.scores[0, 0])
    err = float(np.hypot(b[0] - CAR["x"], b[2] - CAR["z"]))
    print(f"{tag}: {n} dets; top score {s:.3f}, BEV pos "
          f"({b[0]:.2f}, {b[2]:.2f}) vs gt ({CAR['x']}, {CAR['z']}) "
          f"-> err {err:.2f} m")
    return dict(n=n, score=s, err=err, box=b)


clean = describe(detect(im_l, im_r), "clean")
assert clean is not None and clean["err"] < 3.0, \
    "training failed to localize the planted car"

# --------------------------------------------------------------------------
# 3. white-box PGD attack on the trained detector
# --------------------------------------------------------------------------
print("running PGD attack (iters=8, eps=0.1) ...")


@jax.jit
def run_attack(il01, ir01):
    def ascend(l, r):
        total, _ = loss_fn(params, l, r)
        return total
    return pgd_attack(ascend, il01, ir01, num_iters=8, alpha=2 / 255,
                      eps=0.1, clip_min=0.0, clip_max=1.0)


res = run_attack(im_l, im_r)
adv = describe(detect(res.adv_left, res.adv_right), "attacked")
print(f"  attack loss ascent: {float(res.losses[0]):.3f} -> "
      f"{float(res.losses[-1]):.3f}")

# --------------------------------------------------------------------------
# 4. safety impact: scenarios -> plan -> collide -> metrics
# --------------------------------------------------------------------------
from eval_driving_safety_tpu.data.kitti import KittiObject, write_detections
from eval_driving_safety_tpu.safety.collision import collides
from eval_driving_safety_tpu.safety.convert import (
    convert_detection_scenario)
from eval_driving_safety_tpu.safety.planner import plan_scenario

calib = Calibration.default(f_u=F_U, c_u=CU, c_v=CV, baseline=BASELINE)


def to_objects(dets):
    if dets is None:
        return []
    kitti = detections_to_kitti(
        type("Row", (), {"boxes3d": None})(), calib, (H, W)) \
        if False else None
    objs = []
    b = dets["box"]
    objs.append(KittiObject(
        type="Car", truncated=0, occluded=0, alpha=0.0,
        bbox=np.array([0, 0, 10, 10.0]),
        dimensions=np.array([b[3], b[4], b[5]]),
        location=np.array([b[0], b[1], b[2]]), rotation_y=float(b[6])))
    return objs


def safety(tag, det_objs):
    scen = convert_detection_scenario(det_objs, is_highway=False)
    gt_scen = convert_detection_scenario(to_objects(clean), is_highway=False)
    # ground truth scene uses the TRUE car pose
    gt_scen.static_obstacles[0].initial_state.position = np.array(
        [CAR["z"], -CAR["x"]])
    traj = plan_scenario(scen, is_highway=False)
    if traj is None:
        print(f"{tag}: planning FAILED (no path found)")
        return {"success": 0, "collision": 0}
    hit = collides(gt_scen, traj)
    print(f"{tag}: planned {len(traj.states)} states; collision vs GT "
          f"scene: {hit}")
    return {"success": 1, "collision": int(hit)}


m_clean = safety("clean detections ", to_objects(clean))
m_adv = safety("attacked detections", to_objects(adv) if adv else [])
print("\n=== safety metrics (1 scenario) ===")
print(f"successful planning rate: clean {m_clean['success']:.0%} -> "
      f"attacked {m_adv['success']:.0%}")
print(f"collision rate:           clean {m_clean['collision']} -> "
      f"attacked {m_adv['collision']}")
# machine-readable tail for tests/test_dsgn_end_to_end.py
print("METRICS " + json.dumps({
    "clean": m_clean, "adv": m_adv,
    "clean_score": clean["score"], "clean_err": clean["err"],
    "adv_score": (adv["score"] if adv else 0.0),
    "attack_ascent": float(res.losses[-1]) - float(res.losses[0]),
}))
print("DONE")
