"""Shared CLI plumbing: model construction, checkpoint loading, logging."""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Optional


def add_dataset_args(p: argparse.ArgumentParser):
    p.add_argument("--data_path", required=True,
                   help="KITTI object dir with image_2/image_3/calib/label_2")
    p.add_argument("--split_file", default=None,
                   help="txt with one frame id per line (e.g. val.txt)")
    p.add_argument("--image_2_dir", default=None,
                   help="override left-image dir (e.g. an attacked dir)")
    p.add_argument("--image_3_dir", default=None)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--debugnum", type=int, default=2,
                   help="with --debug: use only the first N frames "
                        "(the reference's smoke-test knob)")


def make_dataset(args):
    from eval_driving_safety_tpu.data.dataset import KittiStereoDataset
    ds = KittiStereoDataset(
        args.data_path, split_file=args.split_file,
        image_2_dir=args.image_2_dir, image_3_dir=args.image_3_dir)
    if args.debug:
        ds.ids = ds.ids[: args.debugnum]
    return ds


def load_params(model, init_fn, ckpt: Optional[str]):
    """orbax checkpoint if given, else fresh init (random weights —
    useful for pipeline smoke runs; detection parity needs real weights)."""
    params = init_fn()
    if ckpt:
        from eval_driving_safety_tpu.utils.checkpoint import \
            restore_checkpoint
        params = restore_checkpoint(ckpt, template=params)
        log(f"restored checkpoint from {ckpt}")
    else:
        log("WARNING: no --ckpt given; using randomly initialized weights")
    return params


def log(msg: str, **fields):
    """Structured JSONL on stderr + human line on stdout."""
    print(msg, flush=True)
    if fields:
        print(json.dumps({"ts": time.time(), "msg": msg, **fields}),
              file=sys.stderr, flush=True)


def metrics_path(out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    return os.path.join(out_dir, "metrics.jsonl")


def append_metrics(path: str, record: dict) -> None:
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
