"""Classifier validation CLI.

Capability parity: /root/reference/driving_constraint/validate.py and
/root/reference/dynamic_vehicles/validate.py — restore a checkpoint, run the
validation CSV, print accuracy (and the per-class breakdown the reference
prints).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from eval_driving_safety_tpu.cli.common import log
from eval_driving_safety_tpu.config import (DynamicVehicleConfig,
                                            RoadTypeConfig)
from eval_driving_safety_tpu.models.classifiers import (
    DynamicVehicleClassifier, RoadTypeClassifier, make_eval_step,
    read_csv_dataset)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", choices=("road_type", "dynamic_vehicle"),
                   required=True)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--val_csv", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()
    if args.task == "road_type":
        cfg = RoadTypeConfig()
        model = RoadTypeClassifier(dropout=cfg.dropout)
    else:
        cfg = DynamicVehicleConfig()
        model = DynamicVehicleClassifier(dropout=cfg.dropout)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
                          train=False)
    from eval_driving_safety_tpu.utils.checkpoint import restore_checkpoint
    ck = restore_checkpoint(args.ckpt, template={"params": template,
                                                 "opt_state": None,
                                                 "epoch": np.int32(0)})
    params = ck["params"]
    step = make_eval_step(model)
    rows = read_csv_dataset(args.val_csv)
    from eval_driving_safety_tpu.data.kitti import load_image
    correct = {0: 0, 1: 0}
    total = {0: 0, 1: 0}
    for s in range(0, len(rows), args.batch):
        chunk = rows[s: s + args.batch]
        imgs = []
        for name, _ in chunk:
            img = load_image(os.path.join(args.image_dir, name))
            img = np.asarray(jax.image.resize(
                jnp.asarray(img), (cfg.image_size, cfg.image_size, 3),
                "linear"))
            imgs.append((img - np.asarray(cfg.mean)) / np.asarray(cfg.std))
        probs = np.asarray(step(params, jnp.asarray(
            np.stack(imgs, dtype=np.float32))))
        for (name, label), prob in zip(chunk, probs):
            total[label] += 1
            if (prob > 0.5) == bool(label):
                correct[label] += 1
    n_total = total[0] + total[1]
    n_correct = correct[0] + correct[1]
    log(f"accuracy: {n_correct / max(n_total, 1):.4f} "
        f"({n_correct}/{n_total})")
    for c in (0, 1):
        if total[c]:
            log(f"  class {c}: {correct[c] / total[c]:.4f} "
                f"({correct[c]}/{total[c]})")


if __name__ == "__main__":
    main()
