"""Classifier training CLI — road-type and dynamic-vehicle.

Capability parity: /root/reference/driving_constraint/train.py and
/root/reference/dynamic_vehicles/train.py — CSV-listed image datasets,
frozen-backbone heads, BCE + Adam with the respective LR ladders, accuracy
check every 2 epochs, checkpoint every `ckpt_every` epochs.
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
    DynamicVehicleClassifier, RoadTypeClassifier, accuracy,
    make_dynamic_vehicle_schedule, make_road_type_schedule, make_train_state,
    make_train_step, read_csv_dataset)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", choices=("road_type", "dynamic_vehicle"),
                   required=True)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--train_csv", required=True,
                   help="rows `filename,label`")
    p.add_argument("--val_csv", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--ckpt_dir", default="classifier_ckpts")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def _load_batch(image_dir, rows, cfg):
    from eval_driving_safety_tpu.data.kitti import load_image
    imgs, labels = [], []
    for name, label in rows:
        img = load_image(os.path.join(image_dir, name))
        img = np.asarray(jax.image.resize(
            jnp.asarray(img), (cfg.image_size, cfg.image_size, 3), "linear"))
        imgs.append((img - np.asarray(cfg.mean)) / np.asarray(cfg.std))
        labels.append(label)
    return np.stack(imgs).astype(np.float32), np.asarray(labels, np.float32)


def main():
    args = parse_args()
    if args.task == "road_type":
        cfg = RoadTypeConfig()
        model = RoadTypeClassifier(dropout=cfg.dropout)
        head_names = ("head",)
    else:
        cfg = DynamicVehicleConfig()
        model = DynamicVehicleClassifier(dropout=cfg.dropout)
        head_names = ("fc1", "fc2")
    epochs = args.epochs or cfg.epochs
    batch = args.batch or cfg.batch_size
    rows = read_csv_dataset(args.train_csv)
    steps_per_epoch = max(len(rows) // batch, 1)
    sched = (make_road_type_schedule(cfg, steps_per_epoch)
             if args.task == "road_type"
             else make_dynamic_vehicle_schedule(cfg, steps_per_epoch))
    rng = jax.random.PRNGKey(args.seed)
    params, tx, opt_state = make_train_state(
        model, rng, (cfg.image_size, cfg.image_size, 3), sched, head_names)
    step = make_train_step(model, tx)

    from eval_driving_safety_tpu.utils.checkpoint import save_checkpoint
    val_rows = read_csv_dataset(args.val_csv) if args.val_csv else None
    ckpt_every = getattr(cfg, "ckpt_every", 5)
    for epoch in range(epochs):
        perm = np.random.RandomState(args.seed + epoch).permutation(len(rows))
        losses = []
        for s in range(0, len(rows) - batch + 1, batch):
            chunk = [rows[i] for i in perm[s: s + batch]]
            imgs, labels = _load_batch(args.image_dir, chunk, cfg)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(imgs), jnp.asarray(labels),
                jax.random.fold_in(rng, epoch * 10000 + s))
            losses.append(float(loss))
        log(f"epoch {epoch + 1}/{epochs}: loss {np.mean(losses):.4f}")
        if val_rows and (epoch + 1) % 2 == 0:
            acc = _val_accuracy(model, params, args.image_dir, val_rows,
                                cfg, batch)
            log(f"  val accuracy: {acc:.4f}")
        if (epoch + 1) % ckpt_every == 0:
            path = os.path.join(args.ckpt_dir, f"epoch{epoch + 1}")
            save_checkpoint(path, {"params": params, "opt_state": opt_state,
                                   "epoch": np.int32(epoch + 1)})
            log(f"  checkpoint -> {path}")


def _val_accuracy(model, params, image_dir, rows, cfg, batch):
    def batches():
        for s in range(0, len(rows), batch):
            yield _load_batch(image_dir, rows[s: s + batch], cfg)
    return accuracy(model, params, batches())


if __name__ == "__main__":
    main()
