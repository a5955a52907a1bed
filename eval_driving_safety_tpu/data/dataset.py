"""KITTI stereo dataset + per-detector batch preparation.

Capability parity: the reference's two data paths —
* DSGN: `KITTILoader3D.dataloader` + `myImageFloder` over a split txt,
  ImageNet-normalized [0,1] RGB padded to 384x1248
  (/root/reference/attack/DSGN/pgd_attack.py:90-133);
* Stereo R-CNN: `combined_roidb` + `roibatchLoader`, BGR mean-subtracted
  pixels at scale 600/shorter-side (im_info scale ~1.6 for KITTI's 375px)
  (/root/reference/attack/Stereo-RCNN/roibatchLoader.py:23-103).

The attacked-image handoff keeps the reference's on-disk contract: instead
of symlink swapping (attack/DSGN/README.md:30), `image_2_dir`/`image_3_dir`
can point at any attacked directory (`*_pgd_iters_N/image_2`, ...).

Host-side IO; batches are padded to static shapes for jit.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from eval_driving_safety_tpu.config import (DSGNInputConfig,
                                            SRCNNInputConfig)
from eval_driving_safety_tpu.data import kitti as K


@dataclass
class KittiSample:
    frame_id: str
    im_left: np.ndarray           # (H, W, 3) float32 RGB [0,1]
    im_right: np.ndarray
    calib: K.Calibration
    objects: List[K.KittiObject]
    orig_hw: tuple


class KittiStereoDataset:
    """KITTI object-detection layout:
    root/{image_2,image_3,calib,label_2}/<id>.{png,txt}."""

    def __init__(self, root: str, split: Optional[Sequence[str]] = None,
                 split_file: Optional[str] = None,
                 image_2_dir: Optional[str] = None,
                 image_3_dir: Optional[str] = None,
                 label_dir: Optional[str] = None,
                 calib_dir: Optional[str] = None):
        self.root = root
        self.image_2_dir = image_2_dir or os.path.join(root, "image_2")
        self.image_3_dir = image_3_dir or os.path.join(root, "image_3")
        self.label_dir = label_dir or os.path.join(root, "label_2")
        self.calib_dir = calib_dir or os.path.join(root, "calib")
        if split is not None:
            self.ids = list(split)
        elif split_file:
            with open(split_file) as f:
                self.ids = [ln.strip() for ln in f if ln.strip()]
        else:
            self.ids = sorted(
                n.split(".")[0] for n in os.listdir(self.image_2_dir)
                if n.endswith((".png", ".jpg")))

    def __len__(self) -> int:
        return len(self.ids)

    def _img_path(self, d: str, fid: str) -> str:
        for ext in (".png", ".jpg"):
            p = os.path.join(d, fid + ext)
            if os.path.exists(p):
                return p
        raise FileNotFoundError(os.path.join(d, fid + ".png"))

    def get(self, i: int) -> KittiSample:
        fid = self.ids[i]
        im_l = K.load_image(self._img_path(self.image_2_dir, fid))
        im_r = K.load_image(self._img_path(self.image_3_dir, fid))
        calib_path = os.path.join(self.calib_dir, fid + ".txt")
        calib = K.read_calib(calib_path) if os.path.exists(calib_path) \
            else K.Calibration.default()
        label_path = os.path.join(self.label_dir, fid + ".txt")
        objects = K.read_label(label_path) if os.path.exists(label_path) \
            else []
        return KittiSample(fid, im_l, im_r, calib, objects, im_l.shape[:2])

    def batches(self, batch_size: int, drop_remainder: bool = False):
        """Yield lists of KittiSamples."""
        n = len(self)
        for s in range(0, n, batch_size):
            chunk = [self.get(i) for i in range(s, min(s + batch_size, n))]
            if drop_remainder and len(chunk) < batch_size:
                return
            yield chunk


# ---------------------------------------------------------------------------
# Per-detector batch preparation (static shapes)
# ---------------------------------------------------------------------------

def prepare_dsgn_batch(samples: Sequence[KittiSample],
                       cfg: DSGNInputConfig = DSGNInputConfig(),
                       depth_dir: Optional[str] = None) -> Dict:
    """[0,1] RGB -> ImageNet-normalized, padded to HxW; calib vectors.

    `depth_dir` (optional) holds per-frame (H, W) float depth .npy ground
    truth (the reference gets disp_true from its dataloader); absent depth
    yields zeros (masked out of the loss by the min-depth gate).
    """
    b = len(samples)
    h, w = cfg.height, cfg.width
    il = np.zeros((b, h, w, 3), np.float32)
    ir = np.zeros((b, h, w, 3), np.float32)
    depth = np.zeros((b, h, w), np.float32)
    fu = np.zeros((b,), np.float32)
    bl = np.zeros((b,), np.float32)
    cu = np.zeros((b,), np.float32)
    cv = np.zeros((b,), np.float32)
    for i, s in enumerate(samples):
        il[i] = K.pad_to(s.im_left, h, w)
        ir[i] = K.pad_to(s.im_right, h, w)
        fu[i] = s.calib.f_u
        bl[i] = s.calib.baseline
        cu[i] = s.calib.c_u
        cv[i] = s.calib.c_v
        if depth_dir:
            p = os.path.join(depth_dir, s.frame_id + ".npy")
            if os.path.exists(p):
                depth[i] = K.pad_to(np.load(p).astype(np.float32), h, w)
    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    return {
        "im_left": (il - mean) / std,
        "im_right": (ir - mean) / std,
        "im_left_01": il, "im_right_01": ir,
        "f_u": fu, "baseline": bl, "c_u": cu, "c_v": cv,
        "depth_gt": depth,
        "frame_ids": [s.frame_id for s in samples],
        "orig_hw": [s.orig_hw for s in samples],
        "calibs": [s.calib for s in samples],
        "objects": [s.objects for s in samples],
    }


def dsgn_boxes3d(samples: Sequence[KittiSample], max_boxes: int = 16) -> Dict:
    """Padded (B, G, 8) [x, y, z, h, w, l, ry, cls] gt for the RPN3D loss."""
    b = len(samples)
    boxes = np.zeros((b, max_boxes, 8), np.float32)
    num = np.zeros((b,), np.int32)
    for i, s in enumerate(samples):
        k = 0
        for o in s.objects:
            if o.type not in ("Car", "Van") or k >= max_boxes:
                continue
            boxes[i, k] = [*o.location, *o.dimensions, o.rotation_y, 1.0]
            k += 1
        num[i] = k
    return {"boxes3d": boxes, "num_boxes": num}


def prepare_srcnn_batch(samples: Sequence[KittiSample],
                        cfg: SRCNNInputConfig = SRCNNInputConfig()) -> Dict:
    """[0,1] RGB -> resized by scale (target-h / orig-h) -> BGR [0,255]
    mean-subtracted, padded to the static width."""
    import jax
    import jax.numpy as jnp
    b = len(samples)
    h, w = cfg.height, cfg.width
    il = np.zeros((b, h, w, 3), np.float32)
    ir = np.zeros((b, h, w, 3), np.float32)
    scales = np.zeros((b,), np.float32)
    net_hw = []
    for i, s in enumerate(samples):
        oh, ow = s.orig_hw
        scale = h / oh
        nw = min(int(round(ow * scale)), w)
        rl = np.asarray(jax.image.resize(
            jnp.asarray(s.im_left), (h, int(round(ow * scale)), 3),
            "linear"))[:, :nw]
        rr = np.asarray(jax.image.resize(
            jnp.asarray(s.im_right), (h, int(round(ow * scale)), 3),
            "linear"))[:, :nw]
        il[i, :, :nw] = K.rgb01_to_srcnn(rl, cfg.pixel_means_bgr)
        ir[i, :, :nw] = K.rgb01_to_srcnn(rr, cfg.pixel_means_bgr)
        # padding area must equal the BGR zero-pixel in mean-sub space
        il[i, :, nw:] = -np.asarray(cfg.pixel_means_bgr, np.float32)
        ir[i, :, nw:] = -np.asarray(cfg.pixel_means_bgr, np.float32)
        scales[i] = scale
        net_hw.append((h, nw))
    return {
        "im_left": il, "im_right": ir, "scales": scales,
        "frame_ids": [s.frame_id for s in samples],
        "orig_hw": [s.orig_hw for s in samples],
        "net_hw": net_hw,
        "calibs": [s.calib for s in samples],
        "objects": [s.objects for s in samples],
    }


def srcnn_clip_bounds(cfg: SRCNNInputConfig):
    """Per-channel clamp bounds in mean-subtracted BGR space
    (/root/reference/attack/Stereo-RCNN/pgd_attack.py:189-207)."""
    means = np.asarray(cfg.pixel_means_bgr, np.float32)
    return -means, 255.0 - means


def save_attacked_images(batch: Dict, adv_left, adv_right, out_dir: str,
                         denorm) -> None:
    """Write attacked pairs as `out_dir/image_{2,3}/<id>.png`, cropped to
    the pre-padding content size (the reference's save convention,
    /root/reference/attack/DSGN/pgd_attack.py:357-374). DSGN batches are
    padded (crop back to original hw); SRCNN batches are RESIZED to network
    scale, so the crop removes only the width padding (`net_hw`) — the
    reference likewise writes the full 600-px scaled frame
    (Stereo-RCNN/pgd_attack.py:233-243)."""
    adv_left = np.asarray(adv_left)
    adv_right = np.asarray(adv_right)
    for i, fid in enumerate(batch["frame_ids"]):
        hw = batch["net_hw"][i] if "net_hw" in batch else batch["orig_hw"][i]
        K.save_image(os.path.join(out_dir, "image_2", fid + ".png"),
                     denorm(adv_left[i]), crop_hw=hw)
        K.save_image(os.path.join(out_dir, "image_3", fid + ".png"),
                     denorm(adv_right[i]), crop_hw=hw)
