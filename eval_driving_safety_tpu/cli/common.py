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


def make_dataset(args, dtype: str = "float32"):
    from eval_driving_safety_tpu.data.dataset import KittiStereoDataset
    ds = KittiStereoDataset(
        args.data_path, split_file=args.split_file,
        image_2_dir=args.image_2_dir, image_3_dir=args.image_3_dir,
        dtype=dtype)
    if args.debug:
        ds.ids = ds.ids[: args.debugnum]
    return ds


def add_io_args(p: argparse.ArgumentParser):
    """Host-IO overlap knobs for sweep CLIs (prefetching loader + async
    PNG writer, data/dataset.py)."""
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches of PNG decodes kept in flight ahead of "
                        "the device (0 = synchronous loads)")
    p.add_argument("--io_workers", type=int, default=4,
                   help="loader thread-pool size (the reference used 12 "
                        "DataLoader workers)")
    p.add_argument("--png_level", type=int, default=0,
                   help="PNG zlib level for attacked-image writes. 0 "
                        "(store) is ~4x faster to encode with bit-"
                        "identical pixels — adversarial frames barely "
                        "compress anyway; use 6 for archival-size files")
    p.add_argument("--sync_io", action="store_true",
                   help="disable the async writer pool (debugging)")


def make_writer(args):
    """AsyncImageWriter from the shared IO flags, or None with --sync_io."""
    if getattr(args, "sync_io", False):
        return None
    from eval_driving_safety_tpu.data.dataset import AsyncImageWriter
    return AsyncImageWriter(compress_level=getattr(args, "png_level", 0))


def make_srcnn_cfg(args, default_bf16: bool = False,
                   default_s2d: bool = False):
    """StereoRCNNConfig from the shared CLI flags
    (--tiny, --bf16, --fp32, --stem).

    Attack CLIs pass default_bf16=True AND default_s2d=True: the bf16 conv
    trunk is ~1.3x faster with equally effective PGD directions
    (tests/test_stereo_rcnn.py::test_bf16_attack_effectiveness_matches_fp32)
    and the space-to-depth stem is an EXACT reformulation of the 7x7/s2
    stem measured 28% faster (test_s2d_stem_exactly_matches_conv7; the
    model falls back to conv7 on odd H/W). The predict CLI passes
    default_bf16=True too (detection equivalence asserted by
    tests/test_srcnn_predict.py::test_bf16_predict_matches_fp32).
    `--fp32` opts out of bf16 for checkpoint-parity runs; `--stem conv7`
    opts out of the s2d stem."""
    import dataclasses

    from eval_driving_safety_tpu.config import StereoRCNNConfig
    cfg = (StereoRCNNConfig.tiny() if getattr(args, "tiny", False)
           else StereoRCNNConfig())
    # an explicit --fp32 always wins (checkpoint-parity path); --bf16
    # opts in where fp32 is the default (train CLIs)
    if getattr(args, "fp32", False):
        bf16 = False
    else:
        bf16 = default_bf16 or getattr(args, "bf16", False)
    stem = getattr(args, "stem", None) or \
        ("s2d" if default_s2d else cfg.stem_method)
    if bf16 or stem != cfg.stem_method:
        cfg = dataclasses.replace(
            cfg, dtype="bfloat16" if bf16 else cfg.dtype, stem_method=stem)
    return cfg


def add_scale_args(p: argparse.ArgumentParser, default: str = "paper"):
    """--scale / --tiny / --remat for the DSGN CLIs. `paper` =
    DSGNConfig.full(): 96 depth planes, 304x288x10 voxels at 384x1248 —
    the model every benchmark and the reference's published checkpoint
    describe (/root/reference/attack/DSGN/patch_attack.py:318-320);
    attack/predict CLIs default to it so a reference user's command
    reproduces the benchmarked model."""
    p.add_argument("--scale", choices=("paper", "default", "tiny"),
                   default=None,
                   help=f"DSGN model scale (default: {default}; 'default' "
                        "= the mid-size 64-plane config, 'tiny' = CI "
                        "smoke size)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the DSGN hourglass in the backward "
                        "pass (HBM-constrained chips, ~10%% slower)")
    p.add_argument("--stem", choices=("s2d", "conv7"), default=None,
                   help="srcnn ResNet stem: s2d = exact space-to-depth "
                        "reformulation (attack default, 28%% faster); "
                        "conv7 = plain 7x7/s2 conv")
    if not any(a.dest == "tiny" for a in p._actions):
        p.add_argument("--tiny", action="store_true",
                       help="tiny model configs (CI / smoke runs); "
                            "alias for --scale tiny")


def make_dsgn_cfg(args, default_scale: str = "paper"):
    """DSGNConfig from the shared scale flags."""
    from eval_driving_safety_tpu.config import DSGNConfig
    scale = getattr(args, "scale", None)
    if getattr(args, "tiny", False):
        scale = "tiny"
    scale = scale or default_scale
    if scale == "tiny":
        return DSGNConfig.tiny()
    if scale == "default":
        return DSGNConfig()
    return DSGNConfig.full(remat=getattr(args, "remat", False))


def make_dsgn_model(args, cfg):
    """DSGN assembly selection. A published torch checkpoint (`.tar`/`.pth`,
    the reference's weight source at
    /root/reference/attack/DSGN/pgd_attack.py:142-145) routes to the
    upstream-topology compat assembly with its weights imported eagerly
    (models/dsgn_compat.py); anything else uses the TPU-first fast model
    with params loaded lazily (orbax / fresh init via `load_params`).

    Returns (model, variables_or_None)."""
    ckpt = getattr(args, "ckpt", None)
    if ckpt and (ckpt.endswith(".pth") or ckpt.endswith(".tar")):
        from eval_driving_safety_tpu.models.dsgn_compat import \
            load_dsgn_checkpoint
        model, variables = load_dsgn_checkpoint(ckpt, cfg)
        log(f"imported published DSGN checkpoint {ckpt} "
            f"(upstream-compat assembly, arch discovered from state dict)")
        return model, variables
    from eval_driving_safety_tpu.models.dsgn import DSGN
    return DSGN(cfg), None


def unwrap_checkpoint(restored, template=None):
    """Normalize a restored orbax tree: trainer checkpoints
    ({params, [uncert,] opt_state, epoch}) -> (variables, aux); bare params
    collections are re-nested under the template's other collections."""
    aux = {}
    if isinstance(restored, dict) and "opt_state" in restored:
        if restored.get("uncert") is not None:
            aux["uncert"] = restored["uncert"]
        restored = restored["params"]
    if isinstance(restored, dict) and "params" in restored:
        return restored, aux
    out = dict(template) if template else {}
    out["params"] = restored
    return out, aux


def load_params(model, init_fn, ckpt: Optional[str], return_aux: bool = False):
    """Load detector weights.

    Three paths:
    * `.pth` / `.tar` — published PyTorch checkpoint, converted via
      utils.torch_import (the reference's weight source,
      /root/reference/attack/Stereo-RCNN/pgd_attack.py:93-97). Stereo R-CNN
      imports the FULL tree; aux carries the checkpoint's `uncert` vector.
    * any other path — orbax checkpoint from this framework's trainers.
    * None — fresh init (random weights; pipeline smoke runs only).

    With return_aux=True returns (params, aux_dict).
    """
    params = init_fn()
    aux = {}
    if ckpt and (ckpt.endswith(".pth") or ckpt.endswith(".tar")):
        from eval_driving_safety_tpu.utils import torch_import as TI
        sd, uncert = TI.load_torch_state_dict(ckpt)
        if uncert is not None:
            aux["uncert"] = uncert
        name = type(model).__name__
        if name == "StereoRCNN":
            imported = TI.import_stereo_rcnn(sd)
            if imported["unmapped"]:
                log(f"WARNING: {len(imported['unmapped'])} torch keys "
                    f"unmapped: {imported['unmapped'][:8]}...")
            params = TI.graft_stereo_rcnn(dict(params), imported)
            log(f"imported torch checkpoint {ckpt} "
                f"(kpts convs={imported['num_kpts_convs']}, "
                f"unmapped={len(imported['unmapped'])})")
        else:
            raise SystemExit(
                f"torch import for {name} is not supported; train with "
                "cli.train_detector or pass an orbax checkpoint "
                "(see PARITY.md 'checkpoint ingestion')")
    elif ckpt:
        from eval_driving_safety_tpu.utils.checkpoint import \
            restore_checkpoint
        # bare params collections are re-nested under init's other
        # collections (e.g. the SRCNN anchor-table constants)
        params, ck_aux = unwrap_checkpoint(restore_checkpoint(ckpt),
                                           template=params)
        aux.update(ck_aux)
        log(f"restored checkpoint from {ckpt}")
    else:
        log("WARNING: no --ckpt given; using randomly initialized weights")
    return (params, aux) if return_aux else params


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
