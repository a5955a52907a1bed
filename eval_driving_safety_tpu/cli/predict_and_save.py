"""Attacked-inference + KITTI export CLI — both detectors.

Capability parity: /root/reference/attack/*/predict_and_save_{pgd,patch}.py:
run the detector over (attacked) image dirs, write per-image KITTI label
txts, optionally evaluate AP against ground truth, compute depth error
metrics (DSGN), composite a trained patch at eval time with the four
placement modes (random / sp_left / sp_straight / sp_right,
predict_and_save_patch.py:361-391), and dump intermediate feature maps
(the reference's forward hooks, predict_and_save_pgd.py:134-167).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from eval_driving_safety_tpu.cli.common import (add_dataset_args,
                                                add_scale_args,
                                                append_metrics, log,
                                                load_params, make_dataset,
                                                make_dsgn_cfg,
                                                make_dsgn_model,
                                                metrics_path)
from eval_driving_safety_tpu.config import PLACEMENT_BANDS


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    add_dataset_args(p)
    p.add_argument("--detector", choices=("dsgn", "srcnn"), default="dsgn")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--result_dir", default="results")
    p.add_argument("--patch_npy", default=None,
                   help="composite this trained patch before inference")
    p.add_argument("--patch_mode", choices=tuple(PLACEMENT_BANDS),
                   default="random")
    p.add_argument("--eval_ap", action="store_true",
                   help="score AP vs the dataset's label_2 after export: "
                        "full easy/moderate/hard table (the reference eval "
                        "hook's output, predict_and_save_pgd.py:287-301)")
    p.add_argument("--eval_classes", default="Car",
                   help="comma-separated classes for --eval_ap")
    p.add_argument("--depth_dir", default=None,
                   help="depth gt .npy dir for depth error metrics (dsgn)")
    p.add_argument("--save_feat_dir", default=None,
                   help="dump intermediate activations per frame")
    p.add_argument("--save_input_dir", default=None,
                   help="dump the network input images (after any patch "
                        "compositing) as image_2/image_3 pngs — the "
                        "reference's attacked-image visibility")
    p.add_argument("--save_depth_dir", default=None,
                   help="dump predicted depth maps as .npy (dsgn)")
    p.add_argument("--save_lidar_dir", default=None,
                   help="dump pseudo-lidar point clouds as .bin (dsgn)")
    p.add_argument("--plot", action="store_true",
                   help="save detection panels (left+right boxes + BEV) to "
                        "result_dir/refer/<id>.png")
    p.add_argument("--vis_thresh", type=float, default=0.7)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 conv trunk for the srcnn detector. "
                        "This is the DEFAULT (detection equivalence "
                        "asserted in tests/test_srcnn_predict.py); "
                        "--fp32 opts out for checkpoint-parity runs")
    p.add_argument("--fp32", action="store_true",
                   help="fp32 conv trunk (checkpoint-parity runs)")
    add_scale_args(p)
    return p.parse_args()


def _save_inputs(args, b, il, ir, to_rgb01):
    from eval_driving_safety_tpu.data.kitti import save_image
    for i, fid in enumerate(b["frame_ids"]):
        for sub, img in (("image_2", il[i]), ("image_3", ir[i])):
            d = os.path.join(args.save_input_dir, sub)
            os.makedirs(d, exist_ok=True)
            save_image(os.path.join(d, fid + ".png"),
                       np.asarray(to_rgb01(np.asarray(img))))


def _composite(args, imgs_l, imgs_r, radius_shift=-64.0):
    from eval_driving_safety_tpu.attack.patch import (
        composite_patch_batch, load_patch, sample_patch_centers)
    patch = load_patch(args.patch_npy)
    radius = patch.shape[0] // 2
    h, w = imgs_l.shape[1:3]
    band = PLACEMENT_BANDS[args.patch_mode]
    cl, cr = sample_patch_centers(
        jax.random.PRNGKey(args.seed), imgs_l.shape[0], h, w, radius,
        col_band=band, disparity_shift=radius_shift)
    return (composite_patch_batch(imgs_l, patch, cl),
            composite_patch_batch(imgs_r, patch, cr))


def run_dsgn(args):
    from eval_driving_safety_tpu.data.dataset import (prepare_dsgn_batch_u8,
                                                      u8_to_01)
    from eval_driving_safety_tpu.data.kitti import write_detections
    from eval_driving_safety_tpu.inference.fcos3d_post import (
        decode_bev_outputs, detections_to_kitti)
    cfg = make_dsgn_cfg(args)
    model, params = make_dsgn_model(args, cfg)
    # raw u8 uploads (4x less host->device traffic); [0,1] conversion
    # happens on device (bit-identical to the host load, data.dataset)
    ds = make_dataset(args, dtype="uint8")
    mean = np.asarray(cfg.input.mean, np.float32)
    std = np.asarray(cfg.input.std, np.float32)
    mpath = metrics_path(args.result_dir)
    depth_errs = []

    # decoded detections cross the device->host link as ONE u32 buffer
    # (utils.packing): per-leaf fetches cost an RPC round-trip each on a
    # tunneled device. The depth map stays a separate device array — it
    # is only fetched when depth export/metrics actually read it.
    from eval_driving_safety_tpu.utils.packing import pack_tree, unpack_tree
    _spec = {}

    @jax.jit
    def infer(params, il01, ir01, calib):
        out = model.apply(params, (il01 - mean) / std, (ir01 - mean) / std,
                          *calib)
        buf, _spec["dets"] = pack_tree(decode_bev_outputs(out, cfg))
        return buf, out["depth_preds"][-1]

    def infer_with_feats(il01, ir01, calib):
        """Activation-dump variant (the reference's forward-hook tracing,
        predict_and_save_pgd.py:134-167) — unjitted, captures every
        submodule output."""
        out, state = model.apply(
            params, (il01 - mean) / std, (ir01 - mean) / std, *calib,
            capture_intermediates=True, mutable=["intermediates"])
        return decode_bev_outputs(out, cfg), out["depth_preds"][-1], \
            state["intermediates"]

    to01 = jax.jit(u8_to_01)
    for samples in ds.batches(args.batch):
        b = prepare_dsgn_batch_u8(samples, cfg.input,
                                  depth_dir=args.depth_dir)
        il = to01(jnp.asarray(b["im_left_u8"]))
        ir = to01(jnp.asarray(b["im_right_u8"]))
        if args.patch_npy:
            il, ir = _composite(args, il, ir)
        if args.save_input_dir:
            _save_inputs(args, b, il, ir, lambda x: x)
        if params is None:
            params = load_params(model, lambda: model.init(
                jax.random.PRNGKey(0), il[:1], ir[:1],
                jnp.asarray(b["f_u"][:1]), jnp.asarray(b["baseline"][:1]),
                jnp.asarray(b["c_u"][:1]), jnp.asarray(b["c_v"][:1])),
                args.ckpt)
        calib = tuple(jnp.asarray(b[k]) for k in
                      ("f_u", "baseline", "c_u", "c_v"))
        if args.save_feat_dir:
            dets, depth_pred, feats = infer_with_feats(il, ir, calib)
            flat_feats = jax.tree_util.tree_flatten_with_path(feats)[0]
        else:
            buf, depth_pred = infer(params, il, ir, calib)
            dets = unpack_tree(buf, _spec["dets"])
            flat_feats = None
        for i, fid in enumerate(b["frame_ids"]):
            row = jax.tree_util.tree_map(lambda x: x[i], dets)
            kitti = detections_to_kitti(row, b["calibs"][i],
                                        b["orig_hw"][i])
            write_detections(
                os.path.join(args.result_dir, "data", fid + ".txt"), kitti)
            if flat_feats is not None:
                d = _featdir(args, fid)
                for j, (path, val) in enumerate(flat_feats):
                    name = "_".join(getattr(p, "key", str(p))
                                    for p in path)[:120]
                    np.save(os.path.join(d, f"feat{j:02d}_{name}.npy"),
                            np.asarray(val[i] if val.ndim > 0 else val))
            if args.save_depth_dir or args.save_lidar_dir:
                from eval_driving_safety_tpu.inference.depth_export import (
                    save_depth_map, save_pseudo_lidar)
                dp = np.asarray(depth_pred[i])
                if args.save_depth_dir:
                    save_depth_map(
                        os.path.join(args.save_depth_dir, fid + ".npy"), dp)
                if args.save_lidar_dir:
                    save_pseudo_lidar(
                        os.path.join(args.save_lidar_dir, fid + ".bin"),
                        dp, b["calibs"][i])
            if args.plot:
                from eval_driving_safety_tpu.inference.depth_export import \
                    depth_to_points
                from eval_driving_safety_tpu.inference.vis import \
                    save_detection_panel
                pts = depth_to_points(np.asarray(depth_pred[i]),
                                      b["calibs"][i], stride=4)
                save_detection_panel(
                    os.path.join(args.result_dir, "refer", fid + ".png"),
                    np.asarray(il[i]), np.asarray(ir[i]), kitti,
                    points=pts, vis_thresh=args.vis_thresh)
            # depth error metrics (predict_and_save_pgd.py:202-247)
            gt = b["depth_gt"][i]
            m = (gt > cfg.min_depth) & (gt <= cfg.max_depth)
            if m.any():
                err = np.abs(np.asarray(depth_pred[i]) - gt)[m]
                depth_errs.append((float(err.mean()),
                                   float(np.median(err))))
        log(f"exported {len(samples)} frames")
    if depth_errs:
        mean_err = float(np.mean([e[0] for e in depth_errs]))
        med_err = float(np.mean([e[1] for e in depth_errs]))
        log(f"depth error: mean {mean_err:.3f} m, median {med_err:.3f} m")
        append_metrics(mpath, {"depth_mean_err": mean_err,
                               "depth_median_err": med_err})
    _maybe_eval_ap(args, ds, mpath)


def run_srcnn(args):
    from eval_driving_safety_tpu.data.dataset import prepare_srcnn_batch_u8
    from eval_driving_safety_tpu.data.kitti import write_detections
    from eval_driving_safety_tpu.inference.stereo_rcnn_predict import \
        predict_image
    from eval_driving_safety_tpu.models.stereo_rcnn import StereoRCNN

    from eval_driving_safety_tpu.cli.common import make_srcnn_cfg
    # bf16 trunk is the predict default too: 25.1 vs 16.0 imgs/s (r3
    # bench) with decoded detections equivalent to fp32
    # (tests/test_srcnn_predict.py::test_bf16_predict_matches_fp32);
    # --fp32 restores the checkpoint-parity trunk
    cfg = make_srcnn_cfg(args, default_bf16=True)
    model = StereoRCNN(cfg)
    # raw u8 uploads + on-device exact integer resize (data.exact_resize):
    # the old path resized ON DEVICE and pulled the floats back before
    # re-uploading (~57 MB/frame of link traffic); host-side copies for
    # the dense-align refinement now come from the bit-identical host
    # twin instead of a 28 MB/frame fetch
    ds = make_dataset(args, dtype="uint8")
    params = None
    mpath = metrics_path(args.result_dir)
    means = np.asarray(cfg.input.pixel_means_bgr, np.float32)

    @jax.jit
    def ingest(u8l, u8r, wargs):
        from eval_driving_safety_tpu.data.dataset import \
            srcnn_clean01_device
        return (srcnn_clean01_device(wargs, u8l) * 255.0 - means,
                srcnn_clean01_device(wargs, u8r) * 255.0 - means)

    # outputs fetched as ONE u32 buffer (utils.packing) — a dozen small
    # leaves would otherwise cost a dozen RPC round-trips per batch on a
    # tunneled device
    from eval_driving_safety_tpu.utils.packing import packed_jit
    infer, unpack_out = packed_jit(
        lambda params, il, ir: model.apply(params, il, ir, mode="infer"))

    def infer_with_feats(il, ir):
        """Activation-dump variant — the reference's forward hooks on the
        Stereo R-CNN predict path (predict_and_save_pgd.py:56-68)."""
        out, state = model.apply(params, il, ir, mode="infer",
                                 capture_intermediates=True,
                                 mutable=["intermediates"])
        return out, state["intermediates"]

    for samples in ds.batches(args.batch):
        b = prepare_srcnn_batch_u8(samples, cfg.input)
        wargs = {k: jnp.asarray(b[k]) for k in ("ih", "iw", "den_h",
                                                "den_w", "wmask", "c")}
        il, ir = ingest(jnp.asarray(b["im_left_u8"]),
                        jnp.asarray(b["im_right_u8"]), wargs)
        if args.patch_npy:
            il, ir = _composite(args, il, ir)
        if args.save_input_dir:
            from eval_driving_safety_tpu.data.kitti import srcnn_to_rgb01
            _save_inputs(args, b, il, ir,
                         lambda x: srcnn_to_rgb01(
                             x, cfg.input.pixel_means_bgr))
        if params is None:
            params = load_params(model, lambda: model.init(
                jax.random.PRNGKey(0), il[:1], ir[:1], mode="infer"),
                args.ckpt)
        if args.save_feat_dir:
            out, feats = infer_with_feats(il, ir)
            flat_feats = jax.tree_util.tree_flatten_with_path(feats)[0]
            for i, fid in enumerate(b["frame_ids"]):
                d = _featdir(args, fid)
                for j, (path, val) in enumerate(flat_feats):
                    name = "_".join(getattr(p, "key", str(p))
                                    for p in path)[:120]
                    arr = np.asarray(val)
                    np.save(os.path.join(d, f"feat{j:02d}_{name}.npy"),
                            arr[i] if arr.ndim > 0 and arr.shape[0] == len(
                                b["frame_ids"]) else arr)
        else:
            out = unpack_out(infer(params, il, ir))
        if args.patch_npy:
            # composited pixels exist only on device: fetch them
            il_host, ir_host = np.asarray(il), np.asarray(ir)
        else:
            from eval_driving_safety_tpu.data.dataset import \
                srcnn_clean01_host
            cl01, cr01 = srcnn_clean01_host(b)
            il_host = cl01 * 255.0 - means
            ir_host = cr01 * 255.0 - means
        for i, fid in enumerate(b["frame_ids"]):
            scale = float(b["scales"][i])
            dets = predict_image(out, il_host[i], ir_host[i],
                                 b["calibs"][i], cfg,
                                 image_hw=b["orig_hw"][i],
                                 batch_index=i, image_scale=scale)
            write_detections(
                os.path.join(args.result_dir, "data", fid + ".txt"), dets)
            if args.plot:
                from eval_driving_safety_tpu.data.kitti import srcnn_to_rgb01
                from eval_driving_safety_tpu.inference.vis import \
                    save_detection_panel
                dets_net_scale = [dict(d, bbox=d["bbox"] * scale)
                                  for d in dets]  # panel is network-scale
                save_detection_panel(
                    os.path.join(args.result_dir, "refer", fid + ".png"),
                    srcnn_to_rgb01(il_host[i], cfg.input.pixel_means_bgr),
                    srcnn_to_rgb01(ir_host[i], cfg.input.pixel_means_bgr),
                    dets_net_scale, vis_thresh=args.vis_thresh)
        log(f"exported {len(samples)} frames")
    _maybe_eval_ap(args, ds, mpath)


def _featdir(args, fid):
    d = os.path.join(args.save_feat_dir, fid)
    os.makedirs(d, exist_ok=True)
    return d


def _maybe_eval_ap(args, ds, mpath):
    if not args.eval_ap:
        return
    from eval_driving_safety_tpu.evalap.kitti_ap import (
        CLASS_IOU_THRESH, evaluate_folders_full, format_ap_table)
    classes = tuple(c.strip() for c in args.eval_classes.split(",")
                    if c.strip())
    table = evaluate_folders_full(
        ds.label_dir, os.path.join(args.result_dir, "data"), classes)
    log(format_ap_table(table))
    summary_cls = "Car" if "Car" in table else next(iter(table))
    r = table[summary_cls]["moderate"]
    log(f"AP ({summary_cls}, moderate, "
        f"IoU {CLASS_IOU_THRESH.get(summary_cls, 0.5):.2f}): "
        f"bbox {r['ap_bbox']:.4f} "
        f"bev {r['ap_bev']:.4f} 3d {r['ap_3d']:.4f}")
    append_metrics(mpath, {"ap_table": table, **r})


def main():
    args = parse_args()
    (run_dsgn if args.detector == "dsgn" else run_srcnn)(args)


if __name__ == "__main__":
    main()
