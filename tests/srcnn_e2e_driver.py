"""Driver for tests/test_srcnn_end_to_end.py — runs in its OWN process on
the default accelerator (NOT the test suite's virtual CPU mesh: ~2000
training steps take ~40 s on one TPU chip but hours on this host's CPU,
so the test skips without an accelerator).

Overfits a tiny Stereo R-CNN on a planted-car stereo scene with the same
joint (network, uncert) descent cli.train_detector uses, probes detections
during training, then PGD-attacks the trained model. Prints ONE json line
with the outcome.
"""
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eval_driving_safety_tpu.attack.pgd import pgd_attack
from eval_driving_safety_tpu.config import StereoRCNNConfig
from eval_driving_safety_tpu.data.dataset import srcnn_clip_bounds
from eval_driving_safety_tpu.data.kitti import Calibration, KittiObject
from eval_driving_safety_tpu.inference.stereo_rcnn_predict import \
    predict_image
from eval_driving_safety_tpu.models.stereo_rcnn import (StereoRCNN,
                                                        make_gt_batch,
                                                        total_attack_loss)

GT_BBOX = np.array([140.0, 40.0, 180.0, 70.0])


def iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def main():
    print(f"# platform: {jax.devices()[0].platform}", file=sys.stderr,
          flush=True)
    cfg = StereoRCNNConfig.tiny()
    H, W = cfg.input.height, cfg.input.width
    calib = Calibration.default(f_u=200.0, c_u=160.0, c_v=48.0)
    obj = KittiObject(type="Car", truncated=0, occluded=0, alpha=0.1,
                      bbox=GT_BBOX.copy(),
                      dimensions=np.array([1.5, 1.7, 4.0]),
                      location=np.array([0.5, 1.6, 12.0]),
                      rotation_y=math.pi / 2)
    bg = np.random.RandomState(0).rand(H, W, 3).astype(np.float32) * 0.3
    disp = int(200.0 * 0.54 / 12.0)
    tex = np.random.RandomState(7).rand(30, 40, 3).astype(np.float32) \
        * 0.6 + 0.4
    im_l = bg.copy()
    im_l[40:70, 140:180] = tex
    im_r = bg.copy()
    im_r[40:70, 140 - disp:180 - disp] = tex
    pm = np.array(cfg.input.pixel_means_bgr, np.float32)
    to_net = lambda x: (x[..., ::-1] * 255.0) - pm
    il = jnp.asarray(to_net(im_l))[None]
    ir = jnp.asarray(to_net(im_r))[None]
    gt = make_gt_batch([[obj]], [calib], cfg)

    model = StereoRCNN(cfg)
    rng = jax.random.PRNGKey(1)
    variables = dict(model.init(jax.random.PRNGKey(0), il, ir, gt=gt,
                                rng=rng, mode="attack"))
    constants = {k: v for k, v in variables.items() if k != "params"}
    state = {"params": variables["params"], "uncert": jnp.zeros((6,))}
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-3))
    opt = tx.init(state)

    @jax.jit
    def step(state, opt, r):
        def loss_fn(st):
            out = model.apply({"params": st["params"], **constants}, il, ir,
                              gt=gt, rng=r, mode="attack")
            return total_attack_loss(out.losses, st["uncert"])
        tot, g = jax.value_and_grad(loss_fn)(state)
        up, opt = tx.update(g, opt, state)
        return optax.apply_updates(state, up), opt, tot

    @jax.jit
    def infer(v, l, r):
        return model.apply(v, l, r, mode="infer")

    def detections(l, r):
        out = infer({"params": state["params"], **constants}, l, r)
        return predict_image(out, None, None, calib, cfg, image_hw=(H, W),
                             dense_align=False)

    import time
    t0 = time.time()
    k = jax.random.PRNGKey(2)
    best = None
    steps_used = 0
    for i in range(2501):
        k, r = jax.random.split(k)
        state, opt, tot = step(state, opt, r)
        if i % 250 == 0:
            print(f"# step {i} loss {float(tot):.2f} {time.time()-t0:.0f}s",
                  file=sys.stderr, flush=True)
        if i >= 1250 and i % 250 == 0:
            hits = [d for d in detections(il, ir) if d["type"] == "Car"
                    and iou(d["bbox"], GT_BBOX) > 0.3]
            print(f"# probe {i}: {len(hits)} hits {time.time()-t0:.0f}s",
                  file=sys.stderr, flush=True)
            if hits:
                best = max(hits, key=lambda d: d["score"])
                steps_used = i
                break
    if best is None:
        print(json.dumps({"ok": False, "why": "no detection"}))
        return

    cmin, cmax = srcnn_clip_bounds(cfg.input)
    full = {"params": state["params"], **constants}
    uncert = state["uncert"]

    def attack_loss(l, r):
        out = model.apply(full, l, r, gt=gt, rng=jax.random.PRNGKey(5),
                          mode="attack")
        return total_attack_loss(out.losses, uncert)

    res = pgd_attack(attack_loss, il, ir, num_iters=8, alpha=3.0,
                     eps=255.0 * 0.3, clip_min=jnp.asarray(cmin),
                     clip_max=jnp.asarray(cmax), collect=False)
    losses = [float(x) for x in np.asarray(res.losses)]
    adv_hits = [d for d in detections(res.adv_left, res.adv_right)
                if d["type"] == "Car" and iou(d["bbox"], GT_BBOX) > 0.3]
    print(json.dumps({
        "ok": True,
        "steps": steps_used,
        "clean_score": float(best["score"]),
        "clean_iou": float(iou(best["bbox"], GT_BBOX)),
        "attack_losses": losses,
        "max_delta": float(jnp.abs(res.adv_left - il).max()),
        "adv_score": max((d["score"] for d in adv_hits), default=0.0),
    }))


if __name__ == "__main__":
    main()
