"""Classifier-inference bridge: run the trained road-type and
dynamic-vehicle classifiers over a split and materialize the
`kitti_labeled/`-style folder structure the scenario converters consume.

Capability parity: the reference's converters select templates and motion
annotations by the PRESENCE of files in `road_dynamic_label` /
`dyna_obj_folder` and by per-line `n/0/1/-1` annotation codes
(/root/reference/evaluation/convert_scenarios.py:40-41,108-112;
convert_gt_scenarios.py:154-271). The reference materialized those folders
offline; this CLI closes the L4 -> L5 gap so the classifier outputs drive
conversion end-to-end:

  out_dir/
    road_dynamic_label/<id>.txt       (highway frames: copy of label file)
    road_dynamic_annotation/<id>.txt  (one code per label line)
    dynamic_label/<id>.txt            (street frames)
    dynamic_annotation/<id>.txt

Codes: 'n' for non-vehicle lines, '1' for crops the dynamic-vehicle
classifier scores >= 0.5 (moving), '0' otherwise (static/parked). Crops
follow the reference's square max(w,h)+4 rule
(/root/reference/dynamic_vehicles/crop_image.py:60-72).

Usage:
  python -m eval_driving_safety_tpu.cli.classify_split \
      --data_path KITTI/object/training --split_file val.txt \
      --label_dir results/data \
      --road_ckpt ckpts/road/epoch20 --dyn_ckpt ckpts/dyn/epoch20 \
      --out_dir kitti_labeled_pred
"""
from __future__ import annotations

import argparse
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from eval_driving_safety_tpu.cli.common import (add_dataset_args, log,
                                                make_dataset)
from eval_driving_safety_tpu.config import (DynamicVehicleConfig,
                                            RoadTypeConfig, ScenarioConfig)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_dataset_args(p)
    p.add_argument("--label_dir", default=None,
                   help="label txts to bucket (detections or GT); default: "
                        "the dataset's label_2")
    p.add_argument("--road_ckpt", default=None,
                   help="road-type classifier checkpoint (orbax); without "
                        "it every frame is classed street")
    p.add_argument("--dyn_ckpt", default=None,
                   help="dynamic-vehicle classifier checkpoint; without it "
                        "every vehicle is classed static ('0')")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--thresh", type=float, default=0.5)
    return p.parse_args(argv)


def _resize_norm(img, cfg):
    x = jax.image.resize(jnp.asarray(img),
                         (cfg.image_size, cfg.image_size, 3), "linear")
    return (x - jnp.asarray(cfg.mean)) / jnp.asarray(cfg.std)


def _restore(ckpt):
    from eval_driving_safety_tpu.cli.common import unwrap_checkpoint
    from eval_driving_safety_tpu.utils.checkpoint import restore_checkpoint
    variables, _ = unwrap_checkpoint(restore_checkpoint(ckpt))
    return variables


def main(argv=None):
    args = parse_args(argv)
    from eval_driving_safety_tpu.data.kitti import read_label
    from eval_driving_safety_tpu.models.classifiers import (
        DynamicVehicleClassifier, RoadTypeClassifier, crop_vehicle,
        make_eval_step)

    ds = make_dataset(args)
    label_dir = args.label_dir or ds.label_dir
    vehicle_classes = ScenarioConfig().obstacle_classes

    road_cfg, dyn_cfg = RoadTypeConfig(), DynamicVehicleConfig()
    road_step = dyn_step = None
    if args.road_ckpt:
        road_model = RoadTypeClassifier(dropout=road_cfg.dropout)
        road_params = _restore(args.road_ckpt)
        road_eval = make_eval_step(road_model)
        road_step = lambda x: road_eval(road_params, x)
    if args.dyn_ckpt:
        dyn_model = DynamicVehicleClassifier(dropout=dyn_cfg.dropout)
        dyn_params = _restore(args.dyn_ckpt)
        dyn_eval = make_eval_step(dyn_model)
        dyn_step = lambda x: dyn_eval(dyn_params, x)

    for sub in ("road_dynamic_label", "road_dynamic_annotation",
                "dynamic_label", "dynamic_annotation"):
        os.makedirs(os.path.join(args.out_dir, sub), exist_ok=True)

    n_highway = n_frames = 0
    for i in range(len(ds)):
        sample = ds.get(i)
        label_path = os.path.join(label_dir, sample.frame_id + ".txt")
        if not os.path.exists(label_path):
            continue
        n_frames += 1
        img = sample.im_left

        is_highway = False
        if road_step is not None:
            score = float(road_step(_resize_norm(img, road_cfg)[None])[0])
            is_highway = score >= args.thresh
        n_highway += int(is_highway)

        codes = []
        objs = read_label(label_path)
        for o in objs:
            if o.type not in vehicle_classes:
                codes.append("n")
            elif dyn_step is None:
                codes.append("0")
            else:
                crop = crop_vehicle(img, o.bbox)
                score = float(dyn_step(_resize_norm(crop, dyn_cfg)[None])[0])
                codes.append("1" if score >= args.thresh else "0")

        bucket = "road_dynamic" if is_highway else "dynamic"
        shutil.copy(label_path, os.path.join(
            args.out_dir, f"{bucket}_label", sample.frame_id + ".txt"))
        with open(os.path.join(args.out_dir, f"{bucket}_annotation",
                               sample.frame_id + ".txt"), "w") as f:
            f.write("\n".join(codes) + ("\n" if codes else ""))
    log(f"classified {n_frames} frames: {n_highway} highway, "
        f"{n_frames - n_highway} street -> {args.out_dir}")


if __name__ == "__main__":
    main()
