"""DSGN detector training CLI.

The reference only *loads* published detector weights
(/root/reference/attack/DSGN/pgd_attack.py:142-145) — training lives in the
un-vendored upstream repos. This framework's loss stack is end-to-end
differentiable in one jit region, so detector training is a first-class
capability: jitted optax step over (disparity + RPN3D) losses, batch
sharding over the mesh, orbax epoch checkpoints with resume.

Usage:
  python -m eval_driving_safety_tpu.cli.train_detector \
      --data_path KITTI/object/training --split_file train.txt \
      --depth_dir depth_gt --epochs 20 --batch 2 --ckpt_dir ckpts/dsgn
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eval_driving_safety_tpu.cli.common import (add_dataset_args, log,
                                                make_dataset)
from eval_driving_safety_tpu.config import DSGNConfig


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    add_dataset_args(p)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup_steps", type=int, default=200)
    p.add_argument("--depth_dir", default=None,
                   help="depth gt .npy dir (cli.make_depth_gt); without it "
                        "only the detection losses train")
    p.add_argument("--ckpt_dir", default="dsgn_ckpts")
    p.add_argument("--ckpt_every", type=int, default=5)
    p.add_argument("--resume", action="store_true",
                   help="resume from the newest epochN checkpoint")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    from eval_driving_safety_tpu.data.dataset import (dsgn_boxes3d,
                                                      prepare_dsgn_batch)
    from eval_driving_safety_tpu.models.dsgn import DSGN
    from eval_driving_safety_tpu.models.rpn3d_loss import dsgn_total_loss
    from eval_driving_safety_tpu.utils.checkpoint import (latest_epoch_dir,
                                                          restore_checkpoint,
                                                          save_checkpoint)

    cfg = DSGNConfig.tiny() if args.tiny else DSGNConfig()
    model = DSGN(cfg)
    ds = make_dataset(args)
    mean = np.asarray(cfg.input.mean, np.float32)
    std = np.asarray(cfg.input.std, np.float32)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup_steps,
        max(args.epochs * max(len(ds) // args.batch, 1), args.warmup_steps + 1))
    tx = optax.adamw(sched, weight_decay=1e-4)

    @jax.jit
    def train_step(params, opt_state, il, ir, calib, depth, boxes, nb):
        def loss_fn(p):
            out = model.apply(p, (il - mean) / std, (ir - mean) / std,
                              *calib)
            total, parts = dsgn_total_loss(out, depth, boxes, nb, cfg)
            return total, parts

        (total, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total

    params = opt_state = None
    start_epoch = 0
    for epoch in range(args.epochs):
        losses = []
        for samples in ds.batches(args.batch, drop_remainder=True):
            b = prepare_dsgn_batch(samples, cfg.input,
                                   depth_dir=args.depth_dir)
            g = dsgn_boxes3d(samples)
            calib = tuple(jnp.asarray(b[k]) for k in
                          ("f_u", "baseline", "c_u", "c_v"))
            if params is None:
                params = jax.jit(model.init)(
                    jax.random.PRNGKey(args.seed),
                    jnp.asarray(b["im_left"][:1]),
                    jnp.asarray(b["im_right"][:1]),
                    *(c[:1] for c in calib))
                opt_state = tx.init(params)
                if args.resume:
                    newest = latest_epoch_dir(args.ckpt_dir)
                    if newest:
                        ck = restore_checkpoint(newest, template={
                            "params": params, "opt_state": opt_state,
                            "epoch": np.int32(0)})
                        params, opt_state = ck["params"], ck["opt_state"]
                        start_epoch = int(ck["epoch"])
                        log(f"resumed from {newest} (epoch {start_epoch})")
            params, opt_state, total = train_step(
                params, opt_state, jnp.asarray(b["im_left_01"]),
                jnp.asarray(b["im_right_01"]), calib,
                jnp.asarray(b["depth_gt"]), jnp.asarray(g["boxes3d"]),
                jnp.asarray(g["num_boxes"]))
            losses.append(float(total))
        e = start_epoch + epoch + 1
        log(f"epoch {e}: loss {np.mean(losses):.4f}")
        if e % args.ckpt_every == 0 or epoch == args.epochs - 1:
            path = os.path.join(args.ckpt_dir, f"epoch{e}")
            save_checkpoint(path, {"params": params, "opt_state": opt_state,
                                   "epoch": np.int32(e)})
            log(f"  checkpoint -> {path}")


if __name__ == "__main__":
    main()
