"""KITTI data layer: calibration, label IO, image conventions.

File-format contracts match the reference so that attacked-image dirs,
detection label txts and downstream CommonRoad tooling interoperate:

* label txt line format (15 fields + optional score):
  `/root/reference/evaluation/convert_scenarios.py:52-95`
* detection writer format string:
  `/root/reference/attack/DSGN/predict_and_save_pgd.py:274-283`
* calibration access pattern (f_u, baseline from P2/P3):
  `/root/reference/attack/DSGN/pgd_attack.py:262-266`
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

KITTI_CLASSES = (
    "Car", "Van", "Truck", "Pedestrian", "Person_sitting", "Cyclist",
    "Tram", "Misc", "DontCare",
)


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------

@dataclass
class Calibration:
    """Stereo camera calibration (KITTI object devkit conventions).

    P2/P3 are the 3x4 projection matrices of the left/right color cameras
    after rectification. ``f_u`` is the horizontal focal length, ``baseline``
    the stereo baseline in meters computed exactly as the reference does:
    ``|(P2[0,3] - P3[0,3]) / P2[0,0]|``
    (/root/reference/attack/DSGN/pgd_attack.py:263-264).
    """
    P2: np.ndarray  # (3,4) left color cam
    P3: np.ndarray  # (3,4) right color cam
    R0: np.ndarray = field(default_factory=lambda: np.eye(3))
    Tr_velo_to_cam: Optional[np.ndarray] = None

    @property
    def f_u(self) -> float:
        return float(self.P2[0, 0])

    @property
    def f_v(self) -> float:
        return float(self.P2[1, 1])

    @property
    def c_u(self) -> float:
        return float(self.P2[0, 2])

    @property
    def c_v(self) -> float:
        return float(self.P2[1, 2])

    @property
    def baseline(self) -> float:
        return abs(float((self.P2[0, 3] - self.P3[0, 3]) / self.P2[0, 0]))

    def project_rect_to_image(self, pts3d: np.ndarray, right: bool = False) -> np.ndarray:
        """Project Nx3 rect-camera-frame points to Nx2 pixel coords."""
        P = self.P3 if right else self.P2
        n = pts3d.shape[0]
        hom = np.concatenate([pts3d, np.ones((n, 1), dtype=pts3d.dtype)], axis=1)
        uvw = hom @ P.T
        return uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-9)

    def disparity_from_depth(self, depth: np.ndarray) -> np.ndarray:
        return self.f_u * self.baseline / np.maximum(depth, 1e-6)

    def depth_from_disparity(self, disp: np.ndarray) -> np.ndarray:
        return self.f_u * self.baseline / np.maximum(disp, 1e-6)

    @staticmethod
    def default(f_u: float = 721.5377, c_u: float = 609.5593, c_v: float = 172.854,
                baseline: float = 0.54) -> "Calibration":
        """A canonical KITTI-like calibration for tests/synthetic data."""
        P2 = np.array([[f_u, 0.0, c_u, 44.85728],
                       [0.0, f_u, c_v, 0.2163791],
                       [0.0, 0.0, 1.0, 2.745884e-3]])
        P3 = P2.copy()
        P3[0, 3] = P2[0, 3] - baseline * f_u
        return Calibration(P2=P2, P3=P3)


def read_calib(path: str) -> Calibration:
    """Parse a KITTI object calib txt file."""
    mats: Dict[str, np.ndarray] = {}
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line or ":" not in line:
                continue
            key, vals = line.split(":", 1)
            arr = np.array([float(v) for v in vals.split()])
            mats[key.strip()] = arr
    P2 = mats["P2"].reshape(3, 4)
    P3 = mats["P3"].reshape(3, 4)
    R0 = mats.get("R0_rect", np.eye(3).ravel()).reshape(3, 3)
    Tr = mats.get("Tr_velo_to_cam")
    if Tr is not None:
        Tr = Tr.reshape(3, 4)
    return Calibration(P2=P2, P3=P3, R0=R0, Tr_velo_to_cam=Tr)


# ---------------------------------------------------------------------------
# Labels
# ---------------------------------------------------------------------------

@dataclass
class KittiObject:
    """One line of a KITTI label file (15 fields, optional 16th = score)."""
    type: str
    truncated: float
    occluded: float
    alpha: float
    bbox: np.ndarray        # (4,) x1 y1 x2 y2
    dimensions: np.ndarray  # (3,) h w l
    location: np.ndarray    # (3,) x y z (camera frame, y = bottom)
    rotation_y: float
    score: Optional[float] = None

    @staticmethod
    def from_line(line: str) -> "KittiObject":
        e = line.strip().split(" ")
        return KittiObject(
            type=e[0],
            truncated=float(e[1]),
            occluded=float(e[2]),
            alpha=float(e[3]),
            bbox=np.array([float(v) for v in e[4:8]]),
            dimensions=np.array([float(v) for v in e[8:11]]),
            location=np.array([float(v) for v in e[11:14]]),
            rotation_y=float(e[14]),
            score=float(e[15]) if len(e) > 15 else None,
        )

    def to_line(self) -> str:
        parts = [
            self.type,
            f"{self.truncated:.2f}", f"{int(self.occluded)}", f"{self.alpha:.2f}",
            *(f"{v:.2f}" for v in self.bbox),
            *(f"{v:.2f}" for v in self.dimensions),
            *(f"{v:.2f}" for v in self.location),
            f"{self.rotation_y:.2f}",
        ]
        if self.score is not None:
            parts.append(f"{self.score:.8f}")
        return " ".join(parts)


def read_label(path: str) -> List[KittiObject]:
    objs: List[KittiObject] = []
    with open(path, "r") as f:
        for line in f:
            if line.strip():
                objs.append(KittiObject.from_line(line))
    return objs


def write_label(path: str, objects: Sequence[KittiObject]) -> None:
    with open(path, "w") as f:
        for o in objects:
            f.write(o.to_line() + "\n")


def format_detection_line(cls_name: str, alpha: float, bbox, h: float, w: float,
                          l: float, x: float, y: float, z: float, ry: float,
                          score: float) -> str:
    """Exact detection-output contract of the reference
    (/root/reference/attack/DSGN/predict_and_save_pgd.py:274-283).

    Note the reference writes center-y + h/2 (i.e. KITTI bottom-y); callers
    pass the *bottom* y here directly.
    """
    return (
        "{} -1 -1 {:.4f} {:.4f} {:.4f} {:.4f} {:.4f} {:.6f} {:.6f} {:.6f} "
        "{:.6f} {:.6f} {:.6f} {:.6f} {:.8f}".format(
            cls_name, alpha, bbox[0], bbox[1], bbox[2], bbox[3],
            h, w, l, x, y, z, ry, score)
    )


def write_detections(path: str, detections: Sequence[dict]) -> None:
    """Write one image's detections. Each dict needs keys:
    type, bbox(4,), dimensions(h,w,l), location(x, y_bottom, z), rotation_y, score.
    alpha is derived as -atan2(x, z) + ry as in the reference writer.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for d in detections:
            x, y, z = d["location"]
            h, w, l = d["dimensions"]
            ry = d["rotation_y"]
            alpha = d.get("alpha")
            if alpha is None:
                alpha = -np.arctan2(x, z) + ry
            f.write(format_detection_line(
                d["type"], alpha, d["bbox"], h, w, l, x, y, z, ry,
                d["score"]) + "\n")


# ---------------------------------------------------------------------------
# Images
# ---------------------------------------------------------------------------

def _cv2():
    try:
        import cv2
        return cv2
    except ImportError:                               # pragma: no cover
        return None


def load_image(path: str) -> np.ndarray:
    """Load PNG/JPG as float32 RGB in [0,1], shape (H,W,3).

    cv2's libpng path when available (faster on the sweep's hot loop and
    releases the GIL, so prefetch threads overlap device compute);
    PIL fallback. Both decode the identical pixels."""
    cv2 = _cv2()
    if cv2 is not None:
        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is not None:
            return bgr[..., ::-1].astype(np.float32) / 255.0
    from PIL import Image
    im = Image.open(path).convert("RGB")
    return np.asarray(im, dtype=np.float32) / 255.0


def load_image_u8(path: str) -> np.ndarray:
    """Load PNG/JPG as uint8 RGB, shape (H,W,3) — the raw decode behind
    `load_image` (whose [0,1] floats are exactly this / 255). The
    transfer-minimal attack path uploads these bytes and divides on device
    (4x less host->device traffic, bit-identical floats — asserted
    exhaustively in tests/test_pgd_signs.py)."""
    cv2 = _cv2()
    if cv2 is not None:
        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is not None:
            return np.ascontiguousarray(bgr[..., ::-1])
    from PIL import Image
    im = Image.open(path).convert("RGB")
    return np.asarray(im, dtype=np.uint8)


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def write_png_store(path: str, arr: np.ndarray) -> None:
    """Minimal stored-mode PNG writer for (H,W,3) uint8 RGB: filter-0
    scanlines in zlib stored blocks. ~4x faster than libpng's level-0
    encode (no row-filter heuristics), bit-identical pixels, decodable by
    any PNG reader. Prefers the ONE-PASS native encoder
    (native/sweep_replay.cpp png_store_write: adler32 fused into the
    scanline copy, slice-by-8 crc32, one fwrite — another ~6x, and it
    takes width-cropped views without a copy); this Python/zlib path is
    the always-available fallback with identical pixels. Both release the
    GIL for the heavy steps, so AsyncImageWriter threads truly overlap
    the device."""
    from eval_driving_safety_tpu.attack.replay_native import \
        png_store_write as _native_png
    if _native_png(path, arr):
        return
    import struct
    import zlib
    h, w, c = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)    # 8-bit RGB
    lines = np.empty((h, 1 + w * c), np.uint8)
    lines[:, 0] = 0                                        # filter none
    lines[:, 1:] = arr.reshape(h, w * c)
    comp = zlib.compressobj(0)
    idat = comp.compress(lines.tobytes()) + comp.flush()
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def save_image(path: str, img01: np.ndarray, crop_hw: Optional[tuple] = None,
               compress_level: int = 6) -> None:
    """Save float [0,1] RGB array as PNG, optionally cropping to the original
    (h, w) as the reference does before writing attacked images
    (/root/reference/attack/DSGN/pgd_attack.py:181-194).

    `compress_level` (0-9) trades file size for encode speed; every level
    is a valid lossless PNG with bit-identical pixels. Level 0 (store)
    uses the in-repo stored-PNG writer (~16x faster than libpng level 6,
    ~4x faster than libpng level 0) — the encode cost the reference flags
    as its dominant non-compute cost
    (/root/reference/attack/DSGN/pgd_attack.py:357-374). Levels >0 use
    cv2's encoder when available; PIL fallback."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.asarray(img01)
    if arr.dtype != np.uint8:
        # uint8 input = already-quantized pixels (e.g. device-side
        # quantization before the tunnel fetch, data.dataset.quantize_*)
        arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    if crop_hw is not None:
        h, w = crop_hw
        arr = arr[:h, :w]
    if compress_level == 0 and arr.ndim == 3 and arr.shape[-1] == 3:
        write_png_store(path, arr)
        return
    cv2 = _cv2()
    if cv2 is not None:
        if cv2.imwrite(path, np.ascontiguousarray(arr[..., ::-1]),
                       [cv2.IMWRITE_PNG_COMPRESSION, int(compress_level)]):
            return
    from PIL import Image                             # pragma: no cover
    Image.fromarray(arr).save(path, compress_level=int(compress_level))


def pad_to(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Bottom/right zero-pad an (H,W,C) image to a static shape."""
    h, w = img.shape[:2]
    if h > height or w > width:
        img = img[:height, :width]
        h, w = img.shape[:2]
    out = np.zeros((height, width) + img.shape[2:], dtype=img.dtype)
    out[:h, :w] = img
    return out


def normalize_imagenet(img01: np.ndarray, mean, std) -> np.ndarray:
    return (img01 - np.asarray(mean, dtype=img01.dtype)) / np.asarray(std, dtype=img01.dtype)


def denormalize_imagenet(img: np.ndarray, mean, std) -> np.ndarray:
    return img * np.asarray(std, dtype=img.dtype) + np.asarray(mean, dtype=img.dtype)


def rgb01_to_srcnn(img01: np.ndarray, pixel_means_bgr) -> np.ndarray:
    """RGB [0,1] -> BGR [0,255] minus per-channel means
    (/root/reference/attack/Stereo-RCNN/pgd_attack.py:189-207)."""
    bgr = img01[..., ::-1] * 255.0
    return bgr - np.asarray(pixel_means_bgr, dtype=img01.dtype)


def srcnn_to_rgb01(img: np.ndarray, pixel_means_bgr) -> np.ndarray:
    bgr = img + np.asarray(pixel_means_bgr, dtype=img.dtype)
    return np.clip(bgr[..., ::-1] / 255.0, 0.0, 1.0)
