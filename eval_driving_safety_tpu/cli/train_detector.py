"""Detector training CLI — DSGN and Stereo R-CNN.

The reference only *loads* published detector weights
(/root/reference/attack/DSGN/pgd_attack.py:142-145,
/root/reference/attack/Stereo-RCNN/pgd_attack.py:93-97) — training lives in
the un-vendored upstream repos. This framework's loss stacks are end-to-end
differentiable in one jit region, so detector training is a first-class
capability: jitted optax steps, batch sharding over the mesh, orbax epoch
checkpoints with resume. For Stereo R-CNN the 6-term uncertainty weights
(the `uncert` vector the published checkpoint carries) are trained jointly
with the network, exactly the multi-task scheme the checkpoint's vector
came from.

Usage:
  python -m eval_driving_safety_tpu.cli.train_detector --detector dsgn \
      --data_path KITTI/object/training --split_file train.txt \
      --depth_dir depth_gt --epochs 20 --batch 2 --ckpt_dir ckpts/dsgn
  python -m eval_driving_safety_tpu.cli.train_detector --detector srcnn \
      --data_path KITTI/object/training --split_file train.txt \
      --epochs 12 --ckpt_dir ckpts/srcnn
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
from eval_driving_safety_tpu.config import DSGNConfig, StereoRCNNConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_dataset_args(p)
    p.add_argument("--detector", choices=("dsgn", "srcnn"), default="dsgn")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup_steps", type=int, default=200)
    p.add_argument("--depth_dir", default=None,
                   help="dsgn: depth gt .npy dir (cli.make_depth_gt); "
                        "without it only the detection losses train")
    p.add_argument("--ckpt_dir", default=None,
                   help="default: {detector}_ckpts")
    p.add_argument("--ckpt_every", type=int, default=5)
    p.add_argument("--resume", action="store_true",
                   help="resume from the newest epochN checkpoint")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    return p.parse_args(argv)


def _ckpt_io():
    from eval_driving_safety_tpu.utils.checkpoint import (
        latest_epoch_dir, restore_checkpoint, save_checkpoint)
    return latest_epoch_dir, restore_checkpoint, save_checkpoint


def _leaf_keys(path):
    return [str(getattr(p, "key", getattr(p, "name", p))) for p in path]


def make_detector_optimizer(sched):
    """adamw over the network weights, plain adam (no decay) over the
    `uncert` vector, and hard-frozen FrozenBatchNorm statistics.

    FrozenBatchNorm stores running mean/var as ordinary params
    (models/common.py) — without the mask, adamw's weight decay drags
    `var` toward 0 and rsqrt(var+eps) eventually NaNs; and decaying the
    multi-task uncert toward 0 deviates from the upstream scheme."""
    def mask(kind):
        def f(state):
            def leaf(path, _):
                keys = _leaf_keys(path)
                is_uncert = bool(keys) and keys[0] == "uncert"
                is_bnstat = bool(keys) and keys[-1] in ("mean", "var")
                if kind == "net":
                    return not is_uncert and not is_bnstat
                if kind == "uncert":
                    return is_uncert
                return not is_uncert and is_bnstat      # "freeze"
            return jax.tree_util.tree_map_with_path(leaf, state)
        return f

    return optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.masked(optax.adamw(sched, weight_decay=1e-4), mask("net")),
        optax.masked(optax.adam(sched), mask("uncert")),
        optax.masked(optax.set_to_zero(), mask("freeze")),
    )


def run_dsgn(args):
    from eval_driving_safety_tpu.data.dataset import (dsgn_boxes3d,
                                                      prepare_dsgn_batch_u8,
                                                      u8_to_01)
    from eval_driving_safety_tpu.models.dsgn import DSGN
    from eval_driving_safety_tpu.models.rpn3d_loss import dsgn_total_loss
    latest_epoch_dir, restore_checkpoint, save_checkpoint = _ckpt_io()

    cfg = DSGNConfig.tiny() if args.tiny else DSGNConfig()
    model = DSGN(cfg)
    # raw u8 uploads; conversion + normalization happen in-jit
    ds = make_dataset(args, dtype="uint8")
    ckpt_dir = args.ckpt_dir or "dsgn_ckpts"
    mean = np.asarray(cfg.input.mean, np.float32)
    std = np.asarray(cfg.input.std, np.float32)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup_steps,
        max(args.epochs * max(len(ds) // args.batch, 1), args.warmup_steps + 1))
    tx = make_detector_optimizer(sched)

    @jax.jit
    def train_step(params, opt_state, il_u8, ir_u8, calib, depth, boxes,
                   nb):
        il, ir = u8_to_01(il_u8), u8_to_01(ir_u8)

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
            b = prepare_dsgn_batch_u8(samples, cfg.input,
                                      depth_dir=args.depth_dir)
            g = dsgn_boxes3d(samples)
            calib = tuple(jnp.asarray(b[k]) for k in
                          ("f_u", "baseline", "c_u", "c_v"))
            if params is None:
                norm0 = (u8_to_01(b["im_left_u8"][:1]) - mean) / std
                params = jax.jit(model.init)(
                    jax.random.PRNGKey(args.seed),
                    jnp.asarray(norm0), jnp.asarray(norm0),
                    *(c[:1] for c in calib))
                opt_state = tx.init(params)
                if args.resume:
                    newest = latest_epoch_dir(ckpt_dir)
                    if newest:
                        ck = restore_checkpoint(newest, template={
                            "params": params, "opt_state": opt_state,
                            "epoch": np.int32(0)})
                        params, opt_state = ck["params"], ck["opt_state"]
                        start_epoch = int(ck["epoch"])
                        log(f"resumed from {newest} (epoch {start_epoch})")
            params, opt_state, total = train_step(
                params, opt_state, jnp.asarray(b["im_left_u8"]),
                jnp.asarray(b["im_right_u8"]), calib,
                jnp.asarray(b["depth_gt"]), jnp.asarray(g["boxes3d"]),
                jnp.asarray(g["num_boxes"]))
            losses.append(float(total))
        e = start_epoch + epoch + 1
        log(f"epoch {e}: loss {np.mean(losses):.4f}")
        if e % args.ckpt_every == 0 or epoch == args.epochs - 1:
            path = os.path.join(ckpt_dir, f"epoch{e}")
            save_checkpoint(path, {"params": params, "opt_state": opt_state,
                                   "epoch": np.int32(e)})
            log(f"  checkpoint -> {path}")


def run_srcnn(args):
    """Stereo R-CNN training: joint (network, uncert) descent on the 6-term
    loss sum_i loss_i*exp(-u_i) + u_i — the multi-task weighting whose
    learned `uncert` the published checkpoint ships
    (/root/reference/attack/Stereo-RCNN/pgd_attack.py:96)."""
    from eval_driving_safety_tpu.data.dataset import (
        prepare_srcnn_batch_u8, srcnn_clean01_device, srcnn_clean01_host)
    from eval_driving_safety_tpu.models.stereo_rcnn import (
        StereoRCNN, make_gt_batch, total_attack_loss)
    latest_epoch_dir, restore_checkpoint, save_checkpoint = _ckpt_io()

    cfg = StereoRCNNConfig.tiny() if args.tiny else StereoRCNNConfig()
    model = StereoRCNN(cfg)
    # raw u8 uploads + on-device exact integer resize (data.exact_resize)
    ds = make_dataset(args, dtype="uint8")
    ckpt_dir = args.ckpt_dir or "srcnn_ckpts"
    means_bgr = np.asarray(cfg.input.pixel_means_bgr, np.float32)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup_steps,
        max(args.epochs * max(len(ds) // args.batch, 1), args.warmup_steps + 1))
    tx = make_detector_optimizer(sched)

    # constants (the anchor table) ride as a runtime argument: they must
    # neither receive optimizer updates nor be baked into the jitted
    # program as literals (see models/stereo_rcnn.py anchor_table note)
    @jax.jit
    def train_step(state, constants, opt_state, il_u8, ir_u8, wargs, gt,
                   rng):
        il = srcnn_clean01_device(wargs, il_u8) * 255.0 - means_bgr
        ir = srcnn_clean01_device(wargs, ir_u8) * 255.0 - means_bgr

        def loss_fn(st):
            out = model.apply({"params": st["params"], **constants},
                              il, ir, gt=gt, rng=rng, mode="attack")
            return total_attack_loss(out.losses, st["uncert"]), out.losses

        (total, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state)
        updates, opt_state = tx.update(grads, opt_state, state)
        return optax.apply_updates(state, updates), opt_state, total, parts

    state = opt_state = constants = None
    start_epoch = 0
    rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.epochs):
        losses = []
        for samples in ds.batches(args.batch, drop_remainder=True):
            b = prepare_srcnn_batch_u8(samples, cfg.input)
            gt = make_gt_batch(b["objects"], b["calibs"], cfg,
                               image_scale=b["scales"])
            wargs = {k: jnp.asarray(b[k]) for k in ("ih", "iw", "den_h",
                                                    "den_w", "wmask", "c")}
            if state is None:
                cl0, cr0 = srcnn_clean01_host(b)
                variables = jax.jit(
                    lambda il, ir, g, r: model.init(
                        jax.random.PRNGKey(args.seed), il, ir, gt=g, rng=r,
                        mode="attack"))(
                    jnp.asarray(cl0[:1] * 255.0 - means_bgr),
                    jnp.asarray(cr0[:1] * 255.0 - means_bgr),
                    jax.tree_util.tree_map(lambda x: x[:1], gt), rng)
                variables = dict(variables)
                constants = {k: v for k, v in variables.items()
                             if k != "params"}
                state = {"params": variables["params"],
                         "uncert": jnp.zeros((6,))}
                opt_state = tx.init(state)
                if args.resume:
                    newest = latest_epoch_dir(ckpt_dir)
                    if newest:
                        ck = restore_checkpoint(newest, template={
                            "params": state["params"],
                            "uncert": state["uncert"],
                            "opt_state": opt_state, "epoch": np.int32(0)})
                        state = {"params": ck["params"],
                                 "uncert": ck["uncert"]}
                        opt_state = ck["opt_state"]
                        start_epoch = int(ck["epoch"])
                        log(f"resumed from {newest} (epoch {start_epoch})")
            rng, step_rng = jax.random.split(rng)
            state, opt_state, total, parts = train_step(
                state, constants, opt_state,
                jnp.asarray(b["im_left_u8"]),
                jnp.asarray(b["im_right_u8"]), wargs, gt, step_rng)
            losses.append(float(total))
        e = start_epoch + epoch + 1
        log(f"epoch {e}: loss {np.mean(losses):.4f} "
            f"uncert {np.asarray(state['uncert']).round(3).tolist()}")
        if e % args.ckpt_every == 0 or epoch == args.epochs - 1:
            path = os.path.join(ckpt_dir, f"epoch{e}")
            save_checkpoint(path, {"params": state["params"],
                                   "uncert": state["uncert"],
                                   "opt_state": opt_state,
                                   "epoch": np.int32(e)})
            log(f"  checkpoint -> {path}")


def main(argv=None):
    args = parse_args(argv)
    (run_dsgn if args.detector == "dsgn" else run_srcnn)(args)


if __name__ == "__main__":
    main()
