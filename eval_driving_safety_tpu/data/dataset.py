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

import itertools
import os
import queue
import threading
from collections import deque
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from eval_driving_safety_tpu.config import (DSGNInputConfig,
                                            SRCNNInputConfig)
from eval_driving_safety_tpu.data import kitti as K


@dataclass
class KittiSample:
    frame_id: str
    im_left: np.ndarray           # (H, W, 3) RGB: float32 [0,1], or uint8
    im_right: np.ndarray          # when the dataset was opened dtype=uint8
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
                 calib_dir: Optional[str] = None,
                 dtype: str = "float32"):
        """dtype="uint8" keeps samples as raw decoded bytes — the
        transfer-minimal attack pipeline uploads them as-is and converts
        on device (im01 == u8/255 bit-exactly, tests/test_pgd_signs.py);
        it also skips a host float pass per decode."""
        self.root = root
        self.dtype = dtype
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
        load = K.load_image_u8 if self.dtype == "uint8" else K.load_image
        im_l = load(self._img_path(self.image_2_dir, fid))
        im_r = load(self._img_path(self.image_3_dir, fid))
        calib_path = os.path.join(self.calib_dir, fid + ".txt")
        calib = K.read_calib(calib_path) if os.path.exists(calib_path) \
            else K.Calibration.default()
        label_path = os.path.join(self.label_dir, fid + ".txt")
        objects = K.read_label(label_path) if os.path.exists(label_path) \
            else []
        return KittiSample(fid, im_l, im_r, calib, objects, im_l.shape[:2])

    def batches(self, batch_size: int, drop_remainder: bool = False,
                prefetch: int = 2, io_workers: int = 4, prepare=None):
        """Yield lists of KittiSamples (or `prepare(samples)` results).

        `prefetch` > 0 keeps that many batches of PNG decodes in flight on
        a thread pool ahead of the consumer — the TPU-native equivalent of
        the reference's `num_workers=12` DataLoader
        (/root/reference/attack/DSGN/pgd_attack.py:79): while the device
        runs batch N's attack, the host decodes batch N+1..N+prefetch.
        The yielded order and contents are identical to the synchronous
        path (prefetch=0); asserted in tests/test_dataset_io.py.

        `prepare` (optional, samples -> any) runs IN the prefetch workers,
        so pure host batch preparation (padding, resize weights, gt
        assembly) overlaps the consumer's device dispatch instead of
        running serially between dispatches (VERDICT r4 #1). With
        `prepare`, each batch decodes+prepares on one worker (batch-level
        pipelining across workers replaces sample-level)."""
        n = len(self)
        starts = [s for s in range(0, n, batch_size)
                  if not (drop_remainder and s + batch_size > n)]

        def batch_sync(s):
            samples = [self.get(i) for i in range(s, min(s + batch_size, n))]
            return prepare(samples) if prepare is not None else samples

        if prefetch <= 0:
            for s in starts:
                yield batch_sync(s)
            return
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=io_workers) as ex:
            pending: deque = deque()
            it = iter(starts)

            def submit(s):
                if prepare is not None:
                    return ex.submit(batch_sync, s)
                return [ex.submit(self.get, i)
                        for i in range(s, min(s + batch_size, n))]

            for s in itertools.islice(it, prefetch + 1):
                pending.append(submit(s))
            while pending:
                futs = pending.popleft()
                for s in itertools.islice(it, 1):
                    pending.append(submit(s))
                yield (futs.result() if prepare is not None
                       else [f.result() for f in futs])


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


def prepare_dsgn_batch_u8(samples: Sequence[KittiSample],
                          cfg: DSGNInputConfig = DSGNInputConfig(),
                          depth_dir: Optional[str] = None) -> Dict:
    """Transfer-minimal DSGN batch: padded RAW uint8 pixels (4x less
    host->device traffic than the float path; the device converts with
    u8/255, bit-identical to `prepare_dsgn_batch`'s im_*_01 — asserted in
    tests/test_pgd_signs.py). Emits the same calib/depth/meta fields."""
    b = len(samples)
    h, w = cfg.height, cfg.width
    il = np.zeros((b, h, w, 3), np.uint8)
    ir = np.zeros((b, h, w, 3), np.uint8)
    depth = np.zeros((b, h, w), np.float32)
    fu = np.zeros((b,), np.float32)
    bl = np.zeros((b,), np.float32)
    cu = np.zeros((b,), np.float32)
    cv = np.zeros((b,), np.float32)
    for i, s in enumerate(samples):
        l, r = s.im_left, s.im_right
        if l.dtype != np.uint8:        # float dataset: recover exact bytes
            l = np.rint(l * 255.0).astype(np.uint8)
            r = np.rint(r * 255.0).astype(np.uint8)
        il[i] = K.pad_to(l, h, w)
        ir[i] = K.pad_to(r, h, w)
        fu[i] = s.calib.f_u
        bl[i] = s.calib.baseline
        cu[i] = s.calib.c_u
        cv[i] = s.calib.c_v
        if depth_dir:
            p = os.path.join(depth_dir, s.frame_id + ".npy")
            if os.path.exists(p):
                depth[i] = K.pad_to(np.load(p).astype(np.float32), h, w)
    return {
        "im_left_u8": il, "im_right_u8": ir,
        "f_u": fu, "baseline": bl, "c_u": cu, "c_v": cv,
        "depth_gt": depth,
        "frame_ids": [s.frame_id for s in samples],
        "orig_hw": [s.orig_hw for s in samples],
        "calibs": [s.calib for s in samples],
        "objects": [s.objects for s in samples],
    }


def u8_to_01(x):
    """uint8 pixels -> float32 [0,1], bit-identical to kitti.load_image's
    host floats on EVERY backend.

    On numpy inputs this is the load formula itself (u8/255). Under jax
    it is a 256-entry table gather: the table is computed on the HOST with
    numpy's correctly-rounded division, so the device result is exact by
    construction — TPU f32 division is NOT IEEE-identical to numpy for
    some byte values (caught by
    tests/test_pgd_signs.py::test_device_u8_ingest_matches_host_load_exhaustive),
    and the sign-replay contract needs the device clean pair to equal the
    host's bitwise."""
    if isinstance(x, np.ndarray):
        return x.astype(np.float32) / 255.0
    import jax.numpy as jnp
    table = jnp.asarray(np.arange(256, dtype=np.float32) / 255.0)
    return jnp.take(table, x.astype(jnp.int32))


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


def prepare_srcnn_batch_u8(samples: Sequence[KittiSample],
                           cfg: SRCNNInputConfig = SRCNNInputConfig()) -> Dict:
    """Transfer-minimal SRCNN batch: RAW u8 BGR frames (padded to a static
    per-batch bucket; ~20x less host->device traffic than the resized f32
    pair) + per-sample integer bilinear-resize weights
    (data.exact_resize). The attack runs in BGR [0,1] at network scale:
    clean = f32(integer-resize) * (1/(255*den_h*den_w)) — one f32
    multiply, identical on host and device, so the sign replay
    (attack.pgd.replay_pgd) reproduces device iterates bit-exactly
    (tests/test_exact_resize.py)."""
    from eval_driving_safety_tpu.data.exact_resize import \
        bilinear_axis_weights
    b = len(samples)
    out_h, out_w = cfg.height, cfg.width
    hp = max(s.orig_hw[0] for s in samples)
    wp = max(s.orig_hw[1] for s in samples)
    hp, wp = -(-hp // 8) * 8, -(-wp // 8) * 8        # static-ish bucket
    il = np.zeros((b, hp, wp, 3), np.uint8)
    ir = np.zeros((b, hp, wp, 3), np.uint8)
    ih = np.zeros((b, 3, out_h), np.int32)           # i0, i1, r per sample
    iw = np.zeros((b, 3, out_w), np.int32)
    den_h = np.zeros((b,), np.int32)
    den_w = np.zeros((b,), np.int32)
    wmask = np.zeros((b, out_w), np.int32)
    c = np.zeros((b,), np.float32)
    c255 = np.zeros((b,), np.float32)
    scales = np.zeros((b,), np.float32)
    net_hw = []
    for i, s in enumerate(samples):
        oh, ow = s.orig_hw
        l, r = s.im_left, s.im_right
        if l.dtype != np.uint8:
            l = np.rint(l * 255.0).astype(np.uint8)
            r = np.rint(r * 255.0).astype(np.uint8)
        il[i, :oh, :ow] = l[..., ::-1]               # BGR byte order
        ir[i, :oh, :ow] = r[..., ::-1]
        scale = out_h / oh
        full_w = int(round(ow * scale))
        nw = min(full_w, out_w)
        wh = bilinear_axis_weights(oh, out_h)
        ww = bilinear_axis_weights(ow, full_w, crop=nw)
        ih[i] = np.stack([wh.i0, wh.i1, wh.r])
        iw[i, :, :nw] = np.stack([ww.i0, ww.i1, ww.r])
        den_h[i], den_w[i] = wh.den, ww.den
        wmask[i, :nw] = 1
        c[i] = np.float64(1.0) / (255.0 * wh.den * ww.den)
        c255[i] = np.float64(1.0) / (wh.den * ww.den)
        scales[i] = scale
        net_hw.append((out_h, nw))
    return {
        "im_left_u8": il, "im_right_u8": ir,
        "ih": ih, "iw": iw, "den_h": den_h, "den_w": den_w,
        "wmask": wmask, "c": c, "c255": c255, "scales": scales,
        "frame_ids": [s.frame_id for s in samples],
        "orig_hw": [s.orig_hw for s in samples],
        "net_hw": net_hw,
        "calibs": [s.calib for s in samples],
        "objects": [s.objects for s in samples],
    }


def srcnn_clean01_device(batch_u8: Dict, img_u8):
    """Device half of the u8 ingest: (B,Hp,Wp,3) u8 BGR -> (B,H,W,3) f32
    BGR [0,1] at network scale (width-padded with 0 = black, matching the
    reference's -mean padding in mean-subtracted space). Call under jit
    with the batch's weight arrays as device args."""
    import jax.numpy as jnp
    from eval_driving_safety_tpu.data.exact_resize import resize_v2_device
    ih, iw = batch_u8["ih"], batch_u8["iw"]
    v2 = resize_v2_device(img_u8, ih[:, 0], ih[:, 1], ih[:, 2],
                          batch_u8["den_h"], iw[:, 0], iw[:, 1], iw[:, 2],
                          batch_u8["den_w"])
    v2 = v2 * batch_u8["wmask"][:, None, :, None]
    return v2.astype(jnp.float32) * batch_u8["c"][:, None, None, None]


def srcnn_clean01_host(batch_u8: Dict) -> tuple:
    """Host twin of srcnn_clean01_device: bit-identical clean pair in BGR
    [0,1] (integer resize + the same single f32 multiply) — the replay
    seed for sign-trajectory sweeps. Uses the native SIMD resize
    (attack.replay_native.resize_v2_i32, identical integer math) when the
    library is available — the numpy fancy-indexing resize was the
    dominant host stage (~0.5 s/frame) of the stage-3 e2e pipeline."""
    from eval_driving_safety_tpu.attack.replay_native import resize_v2_i32
    from eval_driving_safety_tpu.data.exact_resize import (
        bilinear_axis_weights, resize_v2_host)
    b, out_w = batch_u8["wmask"].shape
    out = []
    for side in ("im_left_u8", "im_right_u8"):
        arrs = []
        for i in range(b):
            oh, ow = batch_u8["orig_hw"][i]
            nw = batch_u8["net_hw"][i][1]
            out_h = batch_u8["net_hw"][i][0]
            wh = bilinear_axis_weights(oh, out_h)
            full_w = int(round(ow * (out_h / oh)))
            ww = bilinear_axis_weights(ow, full_w, crop=nw)
            img = batch_u8[side][i, :oh, :ow]
            v2 = resize_v2_i32(img, wh, ww, out_w)
            if v2 is not None:                # already zero-padded to out_w
                arrs.append(v2.astype(np.float32) * batch_u8["c"][i])
                continue
            v2 = resize_v2_host(img, wh, ww)
            x = np.zeros((out_h, out_w, 3), np.float32)
            x[:, :nw] = v2.astype(np.float32) * batch_u8["c"][i]
            arrs.append(x)
        out.append(np.stack(arrs))
    return out[0], out[1]


def srcnn_cleanv_device(batch_u8: Dict, img_u8):
    """Device ingest into the INTEGER attack space ("v-space"): the raw
    scaled resize output v2 = den_h*den_w*255 * bgr01 as f32. With the
    reduced weight denominators (exact_resize) these integers are < 2^23
    for KITTI scales, so unit-step PGD iterates stay exactly on the
    (half-)integer grid and the host sign replay is pure int32
    (attack.pgd.replay_pgd_ints). v / (den_h*den_w) = BGR pixel in
    [0,255] (batch key "c255")."""
    import jax.numpy as jnp
    from eval_driving_safety_tpu.data.exact_resize import resize_v2_device
    ih, iw = batch_u8["ih"], batch_u8["iw"]
    v2 = resize_v2_device(img_u8, ih[:, 0], ih[:, 1], ih[:, 2],
                          batch_u8["den_h"], iw[:, 0], iw[:, 1], iw[:, 2],
                          batch_u8["den_w"])
    return (v2 * batch_u8["wmask"][:, None, :, None]).astype(jnp.float32)


def srcnn_cleanv_host(batch_u8: Dict) -> tuple:
    """Host twin of srcnn_cleanv_device, as int32 (the replay seeds).
    Uses the native integer resize when built (same exact math, ~10x
    less host CPU — this runs per frame on the sweep's replay path)."""
    from eval_driving_safety_tpu.attack.replay_native import resize_v2_i32
    from eval_driving_safety_tpu.data.exact_resize import (
        bilinear_axis_weights, resize_v2_host)
    b, out_w = batch_u8["wmask"].shape
    out = []
    for side in ("im_left_u8", "im_right_u8"):
        arrs = []
        for i in range(b):
            oh, ow = batch_u8["orig_hw"][i]
            out_h, nw = batch_u8["net_hw"][i]
            wh = bilinear_axis_weights(oh, out_h)
            full_w = int(round(ow * (out_h / oh)))
            ww = bilinear_axis_weights(ow, full_w, crop=nw)
            img = batch_u8[side][i, :oh, :ow]
            x = resize_v2_i32(img, wh, ww, out_w)
            if x is None:
                x = np.zeros((out_h, out_w, 3), np.int32)
                x[:, :nw] = resize_v2_host(img, wh, ww)
            arrs.append(x)
        out.append(np.stack(arrs))
    return out[0], out[1]


def srcnn_cleanv_q0_host(batch_u8: Dict) -> tuple:
    """srcnn_cleanv_host + the iteration-0 quantized frames in ONE fused
    native pass per side (resize_v2_q0): returns (v2l, v2r, q0l, q0r)
    with q0 == quantize_v_batch_u8(v2, c255) bitwise — the sweep's
    replay-seed + clean-save without the extra full-frame quantize pass.
    Falls back to the two-pass path when the native library is absent."""
    from eval_driving_safety_tpu.attack.replay_native import resize_v2_q0
    from eval_driving_safety_tpu.data.exact_resize import \
        bilinear_axis_weights
    b, out_w = batch_u8["wmask"].shape
    vs, qs = [], []
    for side in ("im_left_u8", "im_right_u8"):
        va, qa = [], []
        for i in range(b):
            oh, ow = batch_u8["orig_hw"][i]
            out_h, nw = batch_u8["net_hw"][i]
            wh = bilinear_axis_weights(oh, out_h)
            full_w = int(round(ow * (out_h / oh)))
            ww = bilinear_axis_weights(ow, full_w, crop=nw)
            res = resize_v2_q0(batch_u8[side][i, :oh, :ow], wh, ww, out_w,
                               float(np.asarray(batch_u8["c255"])
                                     .reshape(-1)[i]))
            if res is None:                        # no native toolchain
                v2l, v2r = srcnn_cleanv_host(batch_u8)
                return (v2l, v2r,
                        quantize_v_batch_u8(v2l, batch_u8["c255"]),
                        quantize_v_batch_u8(v2r, batch_u8["c255"]))
            va.append(res[0])
            qa.append(res[1])
        vs.append(np.stack(va))
        qs.append(np.stack(qa))
    return vs[0], vs[1], qs[0], qs[1]


def quantize_v_rgb_u8(x_v, c255):
    """v-space frame -> quantized RGB u8 pixels: ONE f32 multiply by
    1/(den_h*den_w) (`c255` flat (B,), broadcast over the batch axis of a
    (B,H,W,3) frame or an (iters,B,H,W,3) stack) then the standard
    truncation — the same op sequence on host (numpy) and device (jit),
    so both transfer modes write identical PNGs."""
    shape = (1,) * (x_v.ndim - 4) + (-1, 1, 1, 1)
    if isinstance(x_v, np.ndarray):
        x = x_v.astype(np.float32) * \
            np.asarray(c255, np.float32).reshape(shape)
        return np.clip(x, 0, 255).astype(np.uint8)[..., ::-1]
    import jax.numpy as jnp
    x = x_v.astype(jnp.float32) * c255.reshape(shape)
    return jnp.clip(x, 0, 255).astype(jnp.uint8)[..., ::-1]


def quantize_v_batch_u8(v_i32: np.ndarray, c255) -> np.ndarray:
    """(B,H,W,3) int32 v-space frames + (B,) scales -> quantized RGB u8,
    via the native kernel when built (bit-identical; numpy fallback)."""
    from eval_driving_safety_tpu.attack.replay_native import quantize_v_u8
    outs = []
    for i in range(v_i32.shape[0]):
        q = quantize_v_u8(v_i32[i], float(np.asarray(c255).reshape(-1)[i]),
                          flip_channels=True)
        if q is None:
            return quantize_v_rgb_u8(v_i32.astype(np.float32), c255)
        outs.append(q)
    return np.stack(outs)


def save_sweep(batch: Dict, clean_pair, frames, prefix: str, denorm,
               writer) -> None:
    """Save iteration 0 (clean) + every frame pair from `frames` under
    `{prefix}_iters_{k}/image_{2,3}/` — the reference's sweep layout."""
    save_attacked_images(batch, clean_pair[0], clean_pair[1],
                         f"{prefix}_iters_0", denorm, writer=writer)
    for k, (xl, xr) in enumerate(frames):
        save_attacked_images(batch, xl, xr, f"{prefix}_iters_{k + 1}",
                             denorm, writer=writer)


def srcnn_clip_bounds(cfg: SRCNNInputConfig):
    """Per-channel clamp bounds in mean-subtracted BGR space
    (/root/reference/attack/Stereo-RCNN/pgd_attack.py:189-207)."""
    means = np.asarray(cfg.pixel_means_bgr, np.float32)
    return -means, 255.0 - means


def quantize_01_u8(x):
    """Device-side [0,1] RGB -> uint8 pixels (DSGN attack space). Same
    truncation semantics as the host path in data.kitti.save_image, but
    run under jit so a 4x-smaller tensor crosses the device->host link —
    on the tunneled single-chip setup the fetch, not the encode, is
    otherwise the sweep's second bottleneck."""
    import jax.numpy as jnp
    return jnp.clip(x * 255.0, 0.0, 255.0).astype(jnp.uint8)


def quantize_srcnn_u8(x, pixel_means_bgr):
    """Device-side mean-subtracted BGR -> uint8 RGB pixels (the Stereo
    R-CNN attack space; fused denormalize + quantize, equal to
    kitti.srcnn_to_rgb01 followed by save_image's uint8 cast)."""
    import jax.numpy as jnp
    bgr = x + jnp.asarray(pixel_means_bgr, x.dtype)
    return jnp.clip(bgr[..., ::-1], 0.0, 255.0).astype(jnp.uint8)


class AsyncImageWriter:
    """Bounded-queue PNG writer pool.

    The sweep writes (iters+1) x 2 PNGs per frame; synchronous encodes
    stall the device between attack steps (the reference's own dominant
    non-compute cost, /root/reference/attack/DSGN/pgd_attack.py:357-374,
    which it never overlapped). Worker threads run the GIL-releasing cv2
    encoder (data/kitti.save_image) while the main thread dispatches the
    next device step. Encode errors are re-raised at flush()/close(), so a
    failed write cannot be silently dropped.

    `compress_level=0` (PNG store) is the throughput default for attack
    sweeps: ~4x faster than zlib level 6 on high-entropy adversarial
    frames with bit-identical pixels; pass 6 for archival-size files.
    """

    _STOP = object()

    def __init__(self, workers: int = 2, queue_depth: int = 32,
                 compress_level: int = 0):
        self.compress_level = compress_level
        # cumulative encode+write stats (thread-safe): the per-stage
        # decomposition of the e2e sweep benchmarks reads these
        self.write_count = 0
        self.write_seconds = 0.0
        self._stats_lock = threading.Lock()
        self._q: queue.Queue = queue.Queue(maxsize=queue_depth)
        self._errors: List[BaseException] = []
        self._threads = [
            threading.Thread(target=self._run, daemon=True,
                             name=f"png-writer-{i}")
            for i in range(max(1, workers))]
        for t in self._threads:
            t.start()

    def _run(self):
        import time
        while True:
            item = self._q.get()
            try:
                if item is self._STOP:
                    return
                path, img, crop_hw, transform = item
                t0 = time.perf_counter()
                arr = np.asarray(img)
                if transform is not None:
                    arr = transform(arr)
                K.save_image(path, arr, crop_hw=crop_hw,
                             compress_level=self.compress_level)
                dt = time.perf_counter() - t0
                with self._stats_lock:
                    self.write_count += 1
                    self.write_seconds += dt
            except BaseException as e:               # noqa: BLE001
                self._errors.append(e)
            finally:
                self._q.task_done()

    def put(self, path: str, img, crop_hw=None, transform=None) -> None:
        """Enqueue one write. `img` may be a device array — the host fetch
        happens on the worker thread, off the dispatch path. `transform`
        (e.g. a denormalizer) also runs on the worker."""
        self._q.put((path, img, crop_hw, transform))

    def flush(self) -> None:
        """Block until every enqueued write has hit disk; re-raise the
        first writer error if any occurred."""
        self._q.join()
        if self._errors:
            raise self._errors[0]

    def close(self) -> None:
        self.flush()
        for _ in self._threads:
            self._q.put(self._STOP)
        for t in self._threads:
            t.join()

    def __enter__(self) -> "AsyncImageWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def fetch_np(arr, poll_s: float = 0.004) -> np.ndarray:
    """Device->host fetch that WAITS WITHOUT THE GIL: a worker thread
    calling a plain np.asarray on an unfinished jax array can hold the
    GIL for the whole device-compute wait (measured on the tunneled
    backend), starving the other pipeline threads. Polling readiness with
    sleeps keeps the wait free; the final copy is then just the transfer."""
    if hasattr(arr, "is_ready"):
        import time
        while not arr.is_ready():
            time.sleep(poll_s)
    return np.asarray(arr)


def fetch_signs1(side) -> tuple:
    """Fetch one side of a collect="signs1" trajectory ((pos, zero, nz)
    device arrays): pulls the tiny per-iteration zero counts and the 1-bit
    positive plane; the zero plane crosses the link ONLY when some
    gradient was exactly zero (degenerate, never observed on real
    attacks) — so the steady-state sign fetch is half the 2-bit format's
    bytes. Returns (pos_np, zero_np_or_None)."""
    pos, zero, nz = side
    nz_np = fetch_np(nz)
    pos_np = fetch_np(pos)
    if int(np.asarray(nz_np).sum()) == 0:
        return pos_np, None
    return pos_np, fetch_np(zero)


def fetch_packed_signs(packed_l, packed_r):
    """Normalize a fetched sign trajectory pair to (pl, pr, bits): 3-tuple
    sides are the "signs1" format (bits=1 when no zero plane was needed,
    else converted to the 2-bit codes); plain arrays are the 2-bit
    format."""
    from eval_driving_safety_tpu.attack.pgd import signs1_to_packed2
    if isinstance(packed_l, tuple):
        pl, zl = fetch_signs1(packed_l)
        pr, zr = fetch_signs1(packed_r)
        if zl is None and zr is None:
            return pl, pr, 1
        return (signs1_to_packed2(pl, zl), signs1_to_packed2(pr, zr), 2)
    return fetch_np(packed_l), fetch_np(packed_r), 2


def save_sweep_from_signs(batch: Dict, clean_l, clean_r, packed_l, packed_r,
                          prefix: str, denorm, writer, *, alpha, eps,
                          clip_min, clip_max, clean_save=None,
                          space_255: bool = False) -> None:
    """Replay a packed sign trajectory (attack.pgd.replay_pgd — bit-exact
    with the device iterates) and save every iteration's pair under
    `{prefix}_iters_{k}/image_{2,3}/` (iteration 0 = clean), the
    reference's sweep layout (/root/reference/attack/DSGN/
    pgd_attack.py:357-374). Only the 2-bit packed signs cross the
    device->host link (16x less than float iterates).

    clean_l/clean_r: HOST attack-space pair (the replay seeds).
    clean_save: optional (left, right) override for the iteration-0 save
    (e.g. the raw uint8 pixels, skipping a quantization pass).
    space_255: the attack ran in 255-space on uint8 clean pixels (the
    DSGN default): frames quantize by truncation, and with the default
    unit step / half-integer ball the replay runs entirely in int16
    (attack.pgd.replay_pgd_255 — the cheap path)."""
    from eval_driving_safety_tpu.attack.pgd import (replay_255_valid,
                                                    replay_pgd,
                                                    replay_pgd_255,
                                                    signs1_to_packed2)
    cs_l, cs_r = clean_save if clean_save is not None else (clean_l, clean_r)
    save_attacked_images(batch, cs_l, cs_r, f"{prefix}_iters_0", denorm,
                         writer=writer)
    pl, pr, bits = fetch_packed_signs(packed_l, packed_r)
    if space_255 and clean_l.dtype == np.uint8 and \
            replay_255_valid(alpha, eps, clip_min, clip_max):
        from eval_driving_safety_tpu.attack.replay_native import \
            replay_sweep_u8
        nat_l = replay_sweep_u8(clean_l.astype(np.int32), pl,
                                alpha2=2, eps2=int(round(2 * float(eps))),
                                max2=510, c255=1.0, flip_channels=False,
                                bits=bits)
        if nat_l is not None:
            nat_r = replay_sweep_u8(clean_r.astype(np.int32), pr,
                                    alpha2=2,
                                    eps2=int(round(2 * float(eps))),
                                    max2=510, c255=1.0,
                                    flip_channels=False, bits=bits)
            frames = zip(nat_l, nat_r)
        else:
            if bits == 1:      # numpy fallbacks consume the 2-bit codes
                pl, pr = signs1_to_packed2(pl), signs1_to_packed2(pr)
            frames = replay_pgd_255(clean_l, clean_r, pl, pr, eps=eps)
    elif space_255:
        if bits == 1:
            pl, pr = signs1_to_packed2(pl), signs1_to_packed2(pr)
        frames = ((np.clip(xl, 0, 255).astype(np.uint8),
                   np.clip(xr, 0, 255).astype(np.uint8))
                  for xl, xr in replay_pgd(
                      clean_l.astype(np.float32), clean_r.astype(np.float32),
                      pl, pr, alpha=alpha, eps=eps,
                      clip_min=clip_min, clip_max=clip_max))
    else:
        if bits == 1:
            pl, pr = signs1_to_packed2(pl), signs1_to_packed2(pr)
        frames = replay_pgd(clean_l, clean_r, pl, pr, alpha=alpha, eps=eps,
                            clip_min=clip_min, clip_max=clip_max)
    for k, (xl, xr) in enumerate(frames):
        save_attacked_images(batch, xl, xr, f"{prefix}_iters_{k + 1}",
                             denorm, writer=writer)


def save_attacked_images(batch: Dict, adv_left, adv_right, out_dir: str,
                         denorm, writer: Optional[AsyncImageWriter] = None,
                         ) -> None:
    """Write attacked pairs as `out_dir/image_{2,3}/<id>.png`, cropped to
    the pre-padding content size (the reference's save convention,
    /root/reference/attack/DSGN/pgd_attack.py:357-374). DSGN batches are
    padded (crop back to original hw); SRCNN batches are RESIZED to network
    scale, so the crop removes only the width padding (`net_hw`) — the
    reference likewise writes the full 600-px scaled frame
    (Stereo-RCNN/pgd_attack.py:233-243).

    With `writer`, encodes (and the device->host fetch) run on the writer
    pool overlapped with the caller's next device step; the caller owns
    flush()/close(). Without one, writes are synchronous."""
    if writer is None:
        adv_left = np.asarray(adv_left)
        adv_right = np.asarray(adv_right)
    for i, fid in enumerate(batch["frame_ids"]):
        hw = batch["net_hw"][i] if "net_hw" in batch else batch["orig_hw"][i]
        for sub, adv in (("image_2", adv_left), ("image_3", adv_right)):
            path = os.path.join(out_dir, sub, fid + ".png")
            if writer is not None:
                writer.put(path, adv[i], crop_hw=hw, transform=denorm)
            else:
                K.save_image(path, denorm(adv[i]), crop_hw=hw)
