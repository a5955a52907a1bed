"""PGD attack CLI — both detectors, batched + mesh-sharded.

Capability parity: /root/reference/attack/DSGN/pgd_attack.py and
/root/reference/attack/Stereo-RCNN/pgd_attack.py — per-image iterated FGSM
on the detector's full training loss, saving every iteration's image pair
as `{prefix}_pgd_iters_{k}/image_{2,3}/<id>.png` (iteration 0 = clean).

TPU-native difference: the whole sweep is a batched jitted loop over a
device mesh instead of one image at a time (SURVEY.md §2.3).

Usage:
  python -m eval_driving_safety_tpu.cli.pgd_attack --detector dsgn \
      --data_path KITTI/object/training --split_file val.txt \
      --iter 4 --batch 2 --debug --debugnum 2
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from eval_driving_safety_tpu.cli.common import (add_dataset_args,
                                                add_io_args, add_scale_args,
                                                log, load_params,
                                                make_dataset, make_dsgn_cfg,
                                                make_dsgn_model, make_writer)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    add_dataset_args(p)
    p.add_argument("--detector", choices=("dsgn", "srcnn"), default="dsgn")
    p.add_argument("--iter", type=int, default=4)
    p.add_argument("--alpha", type=float, default=None,
                   help="default: 1/255 (dsgn, [0,1] space), 1.0 (srcnn, "
                        "pixel space)")
    p.add_argument("--eps", type=float, default=None,
                   help="default: 0.3 (dsgn), 255*0.3 (srcnn)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--depth_dir", default=None,
                   help="per-frame depth .npy ground truth for the "
                        "disparity loss (optional)")
    p.add_argument("--out_prefix", default=None,
                   help="default: {detector}_pgd")
    p.add_argument("--fp32", action="store_true",
                   help="keep the fp32 conv trunk for the SRCNN "
                        "attack (bf16 is the default; see "
                        "tests/test_stereo_rcnn.py bf16 effectiveness)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 conv trunk for the srcnn detector "
                        "(fp32 params/decode; see StereoRCNNConfig.dtype)")
    p.add_argument("--resume", action="store_true",
                   help="skip frames whose final-iteration outputs already "
                        "exist (idempotent per-image outputs make sweeps "
                        "resumable, SURVEY.md §5)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax.debug_nans for the sweep")
    p.add_argument("--transfer", choices=("signs", "full"), default="signs",
                   help="device->host strategy for the saved sweep: "
                        "'signs' fetches 2-bit packed gradient signs and "
                        "replays the update rule on the host (bit-exact, "
                        "16x less link traffic — the default); 'full' "
                        "fetches quantized iterates (dsgn only for now)")
    p.add_argument("--objective", default="total",
                   choices=("total", "depth_divergence", "depth_shift"),
                   help="dsgn attack objective (attack.objectives; "
                        "'total' = reference behavior)")
    p.add_argument("--depth_shift_m", type=float, default=10.0)
    add_scale_args(p)
    add_io_args(p)
    return p.parse_args()


def _shard_arrays(tree):
    """Shard batch-leading arrays over all devices (no-op on one device).
    The jitted attack is SPMD-partitioned by XLA from the input shardings —
    the multi-chip path exercised by __graft_entry__.dryrun_multichip."""
    if jax.device_count() == 1:
        return tree
    from eval_driving_safety_tpu.parallel.sharding import (dp_sharding,
                                                           make_mesh)
    mesh = make_mesh(jax.device_count(), 1)
    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.shape["data"] == 0:
            return jax.device_put(x, dp_sharding(mesh, x.ndim))
        return x
    return jax.tree_util.tree_map(put, tree)


# max queued sign-replay jobs: each pins ~2 packed trajectories in HBM and
# one decoded host batch, so a small cap keeps memory flat while still
# overlapping replay/encode with the device attack (ADVICE r4 #2)
_MAX_PENDING_REPLAYS = 3


def _already_done(prefix: str, n_iters: int, frame_ids) -> bool:
    import os
    return all(os.path.exists(os.path.join(
        f"{prefix}_iters_{n_iters}", "image_2", fid + ".png"))
        for fid in frame_ids)


def run_dsgn(args):
    from eval_driving_safety_tpu.attack.pgd import pgd_attack
    from eval_driving_safety_tpu.data.dataset import (
        dsgn_boxes3d, prepare_dsgn_batch_u8, save_attacked_images,
        save_sweep_from_signs, u8_to_01)
    cfg = make_dsgn_cfg(args)
    model, params = make_dsgn_model(args, cfg)
    # attack space = RGB 255-units: clean = the exact uint8 pixels as f32
    # (a lossless convert), the default unit step keeps every iterate on
    # the half-integer grid (f32 adds on half-integers < 2^24 are exact),
    # so the host sign replay is pure int16 arithmetic
    # (attack.pgd.replay_pgd_255). Same ball/updates as the reference's
    # [0,1] attack, scaled by exactly 255. --alpha/--eps stay in the
    # reference's [0,1] units.
    alpha = np.float32(1.0) if args.alpha is None \
        else np.float32(args.alpha * 255.0)
    eps = np.float32(76.5) if args.eps is None \
        else np.float32(args.eps * 255.0)
    kw = dict(alpha=alpha, eps=eps, clip_min=0.0, clip_max=255.0)
    prefix = args.out_prefix or "dsgn_pgd"
    signs = args.transfer == "signs"
    # both transfer modes ingest RAW u8: the clean pair is exactly the
    # loaded pixels (a host-normalized float upload denormalized on
    # device is NOT bit-exact, and costs 4x the bytes)
    ds = make_dataset(args, dtype="uint8")
    mean, std = np.asarray(cfg.input.mean), np.asarray(cfg.input.std)
    mean255 = (mean * 255.0).astype(np.float32)
    std255 = (std * 255.0).astype(np.float32)

    def make_loss(params, calib, depth_gt, boxes3d, num_boxes):
        def loss_fn(il255, ir255):
            from eval_driving_safety_tpu.attack import objectives as O
            out = model.apply(params, (il255 - mean255) / std255,
                              (ir255 - mean255) / std255, *calib)
            if args.objective == "depth_divergence":
                return O.depth_divergence(out, depth_gt, cfg)
            if args.objective == "depth_shift":
                return O.depth_shift(out, depth_gt, args.depth_shift_m, cfg)
            return O.total_loss(out, depth_gt, boxes3d, num_boxes, cfg)
        return loss_fn

    # params passed as an argument: closing over concrete weights would
    # bake them into the compiled program as constants (and overflow the
    # remote compiler's request limit at full model size)
    @jax.jit
    def attack(params, il_u8, ir_u8, calib, depth_gt, boxes3d, num_boxes):
        # clean = exact u8 pixels as f32 (lossless). With transfer="signs"
        # only packed gradient signs come back and the host replays the
        # update rule bit-exactly — 16-32x less link traffic per frame
        # than fetching quantized iterates. The "signs1" format (two
        # 1-bit planes + zero counts; only the positive plane is fetched
        # in the steady state) halves that again; shapes are static under
        # jit, so the divisibility gate resolves at trace time.
        clean_l = il_u8.astype(jnp.float32)
        clean_r = ir_u8.astype(jnp.float32)
        b1_ok = (il_u8.shape[-2] * il_u8.shape[-1]) % 8 == 0
        res = pgd_attack(make_loss(params, calib, depth_gt, boxes3d,
                                   num_boxes),
                         clean_l, clean_r, num_iters=args.iter,
                         collect=(("signs1" if b1_ok else "signs")
                                  if signs else True), **kw)
        if signs:
            return res.losses, res.trajectory
        # quantize the saved trajectory on device (truncation, the same
        # rule as the host replay): 4x less data through the link
        return res.losses, (res.trajectory[0].astype(jnp.uint8),
                            res.trajectory[1].astype(jnp.uint8))

    writer = make_writer(args)
    import concurrent.futures as cf
    replayer = cf.ThreadPoolExecutor(max_workers=2) if signs else None
    pending = []
    ident = lambda x: x

    def submit_replay(b, pl, pr):
        def job():
            save_sweep_from_signs(
                b, b["im_left_u8"], b["im_right_u8"],
                pl, pr, prefix, ident, writer, space_255=True, **kw)
        # backpressure: each queued job pins device-resident packed sign
        # trajectories + the host batch; bound in-flight replays so a long
        # sweep on a slow host can't grow HBM/RAM without limit
        if len(pending) >= _MAX_PENDING_REPLAYS:
            pending.pop(0).result()
        pending.append(replayer.submit(job))

    def _prep(samples):
        # pure host batch prep — runs in the prefetch workers, overlapped
        # with the previous batch's device dispatch (dataset.batches)
        if args.resume and _already_done(prefix, args.iter,
                                         [s.frame_id for s in samples]):
            return None
        return (prepare_dsgn_batch_u8(samples, cfg.input,
                                      depth_dir=args.depth_dir),
                dsgn_boxes3d(samples))

    try:
        for prepared in ds.batches(args.batch, prefetch=args.prefetch,
                                   io_workers=args.io_workers,
                                   prepare=_prep):
            if prepared is None:                   # --resume skip
                continue
            b, g = prepared
            im_l, im_r = b["im_left_u8"], b["im_right_u8"]
            if params is None:
                norm1 = (u8_to_01(im_l[:1]) - mean) / std
                norm2 = (u8_to_01(im_r[:1]) - mean) / std
                params = load_params(model, lambda: model.init(
                    jax.random.PRNGKey(0), jnp.asarray(norm1),
                    jnp.asarray(norm2),
                    jnp.asarray(b["f_u"][:1]),
                    jnp.asarray(b["baseline"][:1]),
                    jnp.asarray(b["c_u"][:1]), jnp.asarray(b["c_v"][:1])),
                    args.ckpt)
            sh = _shard_arrays({
                "il": im_l, "ir": im_r,
                "calib": tuple(jnp.asarray(b[k]) for k in
                               ("f_u", "baseline", "c_u", "c_v")),
                # absent depth gt is all-zero: create it ON DEVICE instead
                # of pushing zero bytes through the host->device link
                "depth": jnp.zeros(b["depth_gt"].shape, jnp.float32)
                if args.depth_dir is None else b["depth_gt"],
                "boxes": g["boxes3d"], "nb": g["num_boxes"]})
            losses, traj = attack(params, sh["il"], sh["ir"], sh["calib"],
                                  sh["depth"], sh["boxes"], sh["nb"])
            if signs:
                submit_replay(b, traj[0], traj[1])
            else:
                save_attacked_images(b, im_l, im_r,
                                     f"{prefix}_iters_0", ident,
                                     writer=writer)
                for k in range(args.iter):
                    save_attacked_images(b, traj[0][k], traj[1][k],
                                         f"{prefix}_iters_{k + 1}", ident,
                                         writer=writer)
            log(f"{b['frame_ids']}: losses "
                f"{np.asarray(losses).round(3).tolist()}")
    finally:
        for f in pending:
            f.result()
        if replayer is not None:
            replayer.shutdown()
        if writer is not None:
            writer.close()


def run_srcnn(args):
    from eval_driving_safety_tpu.attack.pgd import (pgd_attack, replay_pgd,
                                                    replay_pgd_ints,
                                                    signs1_to_packed2,
                                                    srcnn_replay_intable)
    from eval_driving_safety_tpu.data.dataset import (
        fetch_packed_signs, prepare_srcnn_batch_u8, quantize_v_batch_u8,
        quantize_v_rgb_u8, save_attacked_images, save_sweep,
        srcnn_cleanv_device, srcnn_cleanv_host, srcnn_cleanv_q0_host)
    from eval_driving_safety_tpu.models.stereo_rcnn import (
        StereoRCNN, make_gt_batch, total_attack_loss)

    from eval_driving_safety_tpu.cli.common import make_srcnn_cfg
    cfg = make_srcnn_cfg(args, default_bf16=True, default_s2d=True)
    model = StereoRCNN(cfg)
    # attack space = the INTEGER resize scale ("v-space", data.dataset
    # srcnn_cleanv_*): clean = den_h*den_w*255 * bgr01 — exact integers
    # < 2^24 even at paper scale (K = 16*3974), so the default unit-pixel
    # step keeps every iterate on the integer grid and the host sign
    # replay is pure int32 (gate: attack.pgd.srcnn_replay_intable,
    # exactness argument in its docstring). Same ball and
    # updates as the reference's mean-subtracted pixel space, scaled per
    # sample by den_h*den_w. --alpha/--eps stay in the reference's
    # BGR*255 pixel units (defaults 1.0 and 255*0.3).
    a_pix = args.alpha if args.alpha is not None else 1.0
    e_pix = args.eps if args.eps is not None else 255.0 * 0.3
    prefix = args.out_prefix or "stereo_rcnn_pgd"
    signs = args.transfer == "signs"
    ds = make_dataset(args, dtype="uint8")
    params = None
    uncert = jnp.zeros((6,))
    rng = jax.random.PRNGKey(11)
    means = np.asarray(cfg.input.pixel_means_bgr, np.float32)

    @jax.jit
    def attack(params, il_u8, ir_u8, wargs, gt, alpha_v, eps_v, max_v,
               c255):
        clean_l = srcnn_cleanv_device(wargs, il_u8)
        clean_r = srcnn_cleanv_device(wargs, ir_u8)
        cb = c255[:, None, None, None]

        def loss_fn(il_v, ir_v):
            out = model.apply(params, il_v * cb - means,
                              ir_v * cb - means, gt=gt, rng=rng,
                              mode="attack")
            return total_attack_loss(out.losses, uncert)

        b1_ok = (clean_l.shape[-2] * clean_l.shape[-1]) % 8 == 0
        res = pgd_attack(loss_fn, clean_l, clean_r, num_iters=args.iter,
                         alpha=alpha_v, eps=eps_v, clip_min=0.0,
                         clip_max=max_v,
                         collect=(("signs1" if b1_ok else "signs")
                                  if signs else True))
        if signs:
            return res.losses, res.trajectory
        # device-side v -> quantized RGB u8 for the fetched trajectory
        # (ONE multiply + truncation; the host replay quantizes with the
        # same op sequence, so both transfer modes write identical PNGs)
        return res.losses, (quantize_v_rgb_u8(res.trajectory[0], c255),
                            quantize_v_rgb_u8(res.trajectory[1], c255))

    ident = lambda x: x
    writer = make_writer(args)
    import concurrent.futures as cf
    replayer = cf.ThreadPoolExecutor(max_workers=2)
    pending = []
    _logged_path = set()

    def submit_replay(b, pl, pr, K, vkw):
        def job():
            # fused native resize + iteration-0 quantize (one pass/side)
            v2l, v2r, q0l, q0r = srcnn_cleanv_q0_host(b)
            c255 = b["c255"]
            a2 = 2.0 * a_pix * K
            e2 = 2.0 * e_pix * K
            intable = srcnn_replay_intable(a_pix, e_pix, K)
            if not _logged_path:
                _logged_path.add(1)
                log("host replay path: "
                    + ("native/int (bit-exact integer grid)" if intable
                       else "f32 per-iteration (non-grid alpha/eps or "
                            "values past the f32-exact bound)"))
            pl_, pr_, bits = fetch_packed_signs(pl, pr)
            if intable:
                from eval_driving_safety_tpu.attack.replay_native import \
                    replay_sweep_u8
                a2i = np.rint(a2).astype(np.int64)
                e2i = np.rint(e2).astype(np.int64)
                m2i = (510 * K).astype(np.int64)
                nat_l = replay_sweep_u8(v2l, pl_, alpha2=a2i, eps2=e2i,
                                        max2=m2i, c255=c255,
                                        flip_channels=True, bits=bits)
                if nat_l is not None:
                    nat_r = replay_sweep_u8(v2r, pr_, alpha2=a2i,
                                            eps2=e2i, max2=m2i, c255=c255,
                                            flip_channels=True, bits=bits)
                    frames = zip(nat_l, nat_r)
                else:
                    if bits == 1:
                        pl_ = signs1_to_packed2(pl_)
                        pr_ = signs1_to_packed2(pr_)
                    half = np.float32(0.5)
                    frames = ((quantize_v_rgb_u8(
                        a.astype(np.float32) * half, c255),
                        quantize_v_rgb_u8(
                        c.astype(np.float32) * half, c255))
                        for a, c in replay_pgd_ints(
                            v2l * 2, v2r * 2, pl_, pr_,
                            alpha2=a2i, eps2=e2i, clip_max2=m2i))
            else:
                if bits == 1:
                    pl_ = signs1_to_packed2(pl_)
                    pr_ = signs1_to_packed2(pr_)
                frames = ((quantize_v_rgb_u8(a, c255),
                           quantize_v_rgb_u8(c, c255))
                          for a, c in replay_pgd(
                              v2l.astype(np.float32),
                              v2r.astype(np.float32), pl_, pr_, **vkw))
            save_sweep(b, (q0l, q0r), frames, prefix, ident, writer)
        # backpressure: bound in-flight replays (see _MAX_PENDING_REPLAYS)
        if len(pending) >= _MAX_PENDING_REPLAYS:
            pending.pop(0).result()
        pending.append(replayer.submit(job))

    def _prep(samples):
        # pure host batch prep (resize weights + gt assembly) — runs in
        # the prefetch workers, off the dispatch thread (VERDICT r4 #1)
        if args.resume and _already_done(prefix, args.iter,
                                         [s.frame_id for s in samples]):
            return None
        b = prepare_srcnn_batch_u8(samples, cfg.input)
        gt = make_gt_batch(b["objects"], b["calibs"], cfg,
                           image_scale=b["scales"])
        K = b["den_h"].astype(np.float64) * b["den_w"]
        vkw = dict(alpha=(a_pix * K).astype(np.float32)
                   .reshape(-1, 1, 1, 1),
                   eps=(e_pix * K).astype(np.float32)
                   .reshape(-1, 1, 1, 1),
                   clip_min=0.0,
                   clip_max=(255.0 * K).astype(np.float32)
                   .reshape(-1, 1, 1, 1))
        return b, gt, K, vkw

    try:
        for prepared in ds.batches(args.batch, prefetch=args.prefetch,
                                   io_workers=args.io_workers,
                                   prepare=_prep):
            if prepared is None:                   # --resume skip
                continue
            b, gt, K, vkw = prepared
            wargs = {k: b[k] for k in ("ih", "iw", "den_h", "den_w",
                                       "wmask", "c")}
            c255 = b["c255"]
            if params is None:
                v2l0, v2r0 = srcnn_cleanv_host(b)
                params, aux = load_params(model, lambda: model.init(
                    jax.random.PRNGKey(0),
                    jnp.asarray(v2l0[:1] * b["c255"][0] - means),
                    jnp.asarray(v2r0[:1] * b["c255"][0] - means),
                    gt=jax.tree_util.tree_map(lambda x: x[:1], gt), rng=rng,
                    mode="attack"), args.ckpt, return_aux=True)
                if "uncert" in aux:
                    # the published checkpoint's 6-vector weighting the
                    # attack loss (reference pgd_attack.py:165-171)
                    uncert = jnp.asarray(aux["uncert"])
                    log(f"using checkpoint uncert="
                        f"{np.asarray(uncert).round(3)}")
                if cfg.dtype == "bfloat16":
                    from eval_driving_safety_tpu.models.common import \
                        cast_matmul_params
                    params = cast_matmul_params(params)
            sh = _shard_arrays({"il": b["im_left_u8"], "ir": b["im_right_u8"],
                                "wargs": wargs, "gt": gt,
                                "vkw": {k: v for k, v in vkw.items()
                                        if k != "clip_min"},
                                "c255": c255})
            losses, traj = attack(params, sh["il"], sh["ir"], sh["wargs"],
                                  sh["gt"], sh["vkw"]["alpha"],
                                  sh["vkw"]["eps"], sh["vkw"]["clip_max"],
                                  sh["c255"])
            if signs:
                submit_replay(b, traj[0], traj[1], K, vkw)
            else:
                v2l, v2r = srcnn_cleanv_host(b)
                q0l = quantize_v_batch_u8(v2l, b["c255"])
                q0r = quantize_v_batch_u8(v2r, b["c255"])
                save_attacked_images(b, q0l, q0r, f"{prefix}_iters_0",
                                     ident, writer=writer)
                for k in range(args.iter):
                    # trajectory is already device-quantized uint8 RGB
                    save_attacked_images(b, traj[0][k], traj[1][k],
                                         f"{prefix}_iters_{k + 1}",
                                         ident, writer=writer)
            log(f"{b['frame_ids']}: losses "
                f"{np.asarray(losses).round(3).tolist()}")
    finally:
        for f in pending:
            f.result()
        replayer.shutdown()
        if writer is not None:
            writer.close()


def main():
    args = parse_args()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    (run_dsgn if args.detector == "dsgn" else run_srcnn)(args)


if __name__ == "__main__":
    main()
