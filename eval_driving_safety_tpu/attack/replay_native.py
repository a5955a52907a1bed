"""ctypes loader for the fused native sweep replay (native/sweep_replay.cpp).

One C pass per iteration replaces ~6 numpy passes (unpack LUT, int
update, two clips, f32 quantize, channel flip) — on the single-core
hosts the driver uses, host CPU time is serial with the whole pipeline,
so the fused kernel directly raises end-to-end sweep throughput. The
quantize formula is bit-identical to the numpy/device path (one IEEE
f32 multiply + truncation; the 0.5 doubling factor is an exact
power-of-two scale). Falls back to the numpy replay when g++ or the
build is unavailable (attack.pgd.replay_pgd_ints)."""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsweepreplay.so")
_lib = None
_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "sweep_replay.cpp")
    # -march=native: the lib is built at first use ON the host that runs
    # it, so native SIMD (AVX2/AVX-512 on the driver hosts) is always
    # safe and lets gcc vectorize the replay's update/quantize loop;
    # fall back to plain -O3 for toolchains without the flag
    for flags in (["-O3", "-march=native", "-funroll-loops"], ["-O3"]):
        try:
            subprocess.run(
                ["g++", *flags, "-shared", "-fPIC", src, "-o", _LIB_PATH],
                check=True, capture_output=True)
            return True
        except Exception:
            continue
    return False


def get_native():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    src = os.path.join(_NATIVE_DIR, "sweep_replay.cpp")
    stale = (not os.path.exists(_LIB_PATH)
             or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src))
    if stale and not _build():
        _failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.replay_sweep_u8.restype = None
        lib.replay_sweep_u8_b1.restype = None
        lib.resize_v2_i32.restype = None
        lib.resize_v2_q0.restype = None
        lib.quantize_v_u8.restype = None
        lib.png_store_write.restype = ctypes.c_int
        lib.png_store_encode.restype = ctypes.c_long
        lib.png_store_bound.restype = ctypes.c_long
        _lib = lib
    except (OSError, AttributeError):
        _failed = True
    return _lib


def resize_v2_i32(img_u8: np.ndarray, wh, ww, out_w: int):
    """Native twin of exact_resize.resize_v2_host (identical integer
    math), zero-padded to `out_w` columns; None when unavailable.
    wh/ww are exact_resize.AxisWeights."""
    lib = get_native()
    if lib is None:
        return None
    img = np.ascontiguousarray(img_u8, np.uint8)
    h0, w0, c = img.shape
    out_h, nw = len(wh.i0), len(ww.i0)
    out = np.zeros((out_h, out_w, c), np.int32)
    crop = np.empty((out_h, nw, c), np.int32) if nw != out_w else out
    scratch = np.empty((out_h, w0, c), np.int32)
    p = ctypes.POINTER

    def ip(a):
        return np.ascontiguousarray(a, np.int32).ctypes.data_as(
            p(ctypes.c_int32))

    lib.resize_v2_i32(
        img.ctypes.data_as(p(ctypes.c_uint8)),
        ctypes.c_int(h0), ctypes.c_int(w0), ctypes.c_int(c),
        ip(wh.i0), ip(wh.i1), ip(wh.r), ctypes.c_int(wh.den),
        ip(ww.i0), ip(ww.i1), ip(ww.r), ctypes.c_int(ww.den),
        ctypes.c_int(out_h), ctypes.c_int(nw),
        crop.ctypes.data_as(p(ctypes.c_int32)),
        scratch.ctypes.data_as(p(ctypes.c_int32)))
    if crop is not out:
        out[:, :nw] = crop
    return out


def resize_v2_q0(img_u8: np.ndarray, wh, ww, out_w: int, c255: float,
                 flip_channels: bool = True):
    """Fused native resize + clean quantize: returns (v int32 (out_h,
    out_w, c) zero-padded past the crop, q0 u8 same shape — the
    iteration-0 frame, = quantize_v_rgb_u8(v, c255) bitwise) in ONE pass;
    None when the native library is unavailable."""
    lib = get_native()
    if lib is None or not hasattr(lib, "resize_v2_q0"):
        return None
    img = np.ascontiguousarray(img_u8, np.uint8)
    h0, w0, c = img.shape
    out_h, nw = len(wh.i0), len(ww.i0)
    v = np.zeros((out_h, out_w, c), np.int32) if nw != out_w \
        else np.empty((out_h, out_w, c), np.int32)
    q0 = np.zeros((out_h, out_w, c), np.uint8) if nw != out_w \
        else np.empty((out_h, out_w, c), np.uint8)
    scratch = np.empty((out_h, w0, c), np.int32)
    p = ctypes.POINTER

    def ip(a):
        return np.ascontiguousarray(a, np.int32).ctypes.data_as(
            p(ctypes.c_int32))

    lib.resize_v2_q0(
        img.ctypes.data_as(p(ctypes.c_uint8)),
        ctypes.c_int(h0), ctypes.c_int(w0), ctypes.c_int(c),
        ip(wh.i0), ip(wh.i1), ip(wh.r), ctypes.c_int(wh.den),
        ip(ww.i0), ip(ww.i1), ip(ww.r), ctypes.c_int(ww.den),
        ctypes.c_int(out_h), ctypes.c_int(nw), ctypes.c_int(out_w),
        ctypes.c_float(float(c255)),
        ctypes.c_int(1 if flip_channels else 0),
        v.ctypes.data_as(p(ctypes.c_int32)),
        q0.ctypes.data_as(p(ctypes.c_uint8)),
        scratch.ctypes.data_as(p(ctypes.c_int32)))
    return v, q0


def quantize_v_u8(v: np.ndarray, c255: float, flip_channels: bool):
    """Native quantize of one v-space frame (trunc(f32(v) * c255), same
    IEEE formula as dataset.quantize_v_rgb_u8); None when unavailable."""
    lib = get_native()
    if lib is None:
        return None
    v = np.ascontiguousarray(v, np.int32)
    out = np.empty(v.shape, np.uint8)
    lib.quantize_v_u8(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_long(v.size), ctypes.c_float(float(c255)),
        ctypes.c_int(v.shape[-1]),
        ctypes.c_int(1 if flip_channels else 0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def png_store_write(path: str, arr: np.ndarray) -> bool:
    """One-pass native stored-mode PNG write of (H,W,3) RGB or (H,W)/
    (H,W,1) grayscale uint8 pixels (adler32 fused into the scanline copy,
    slice-by-8 crc32, single fwrite). Accepts row-strided views (e.g.
    width crops) without a copy. Returns False when the native library is
    unavailable or the write failed — callers fall back to the Python
    zlib writer (data.kitti.write_png_store, bit-identical pixels)."""
    lib = get_native()
    if lib is None:
        return False
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[..., None]
    if a.dtype != np.uint8 or a.ndim != 3 or a.shape[-1] not in (1, 3):
        return False
    # rows must be internally contiguous; the leading (row) stride is free
    if a.strides[2] != 1 or a.strides[1] != a.shape[2]:
        a = np.ascontiguousarray(a)
    h, w, c = a.shape
    rc = lib.png_store_write(
        path.encode(), a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_long(a.strides[0]), ctypes.c_int(h), ctypes.c_int(w),
        ctypes.c_int(c))
    return rc == 0


def replay_sweep_u8(clean_v: np.ndarray, packed: np.ndarray,
                    alpha2, eps2, max2, c255,
                    flip_channels: bool, bits: int = 2):
    """(B,H,W,C) UNDOUBLED int32 clean v-values + (iters,B,HWC/4) packed
    signs -> (iters,B,H,W,C) quantized u8 frames, or None when the native
    library is unavailable. alpha2/eps2/max2 stay DOUBLED (the kernel
    works on the doubled grid internally; it doubles the clean values on
    the fly, saving the caller a full-array multiply pass). Parameters
    are per-sample (B,) arrays (scalars are broadcast).

    bits=1: `packed` is the (iters,B,HWC/8) 1-bit POSITIVE sign plane
    (attack.pgd collect="signs1", valid only when the fetched zero counts
    are all 0 — the caller's responsibility); halves the fetch bytes."""
    lib = get_native()
    if lib is None:
        return None
    clean_v = np.ascontiguousarray(clean_v, np.int32)
    packed = np.ascontiguousarray(packed, np.uint8)
    iters, b = packed.shape[0], clean_v.shape[0]
    h, w, c = clean_v.shape[1:]
    a2 = np.ascontiguousarray(np.broadcast_to(
        np.asarray(alpha2, np.int32).reshape(-1), (b,)), np.int32)
    e2 = np.ascontiguousarray(np.broadcast_to(
        np.asarray(eps2, np.int32).reshape(-1), (b,)), np.int32)
    m2 = np.ascontiguousarray(np.broadcast_to(
        np.asarray(max2, np.int32).reshape(-1), (b,)), np.int32)
    cq = np.ascontiguousarray(np.broadcast_to(
        np.asarray(c255, np.float32).reshape(-1), (b,)), np.float32)
    out = np.empty((iters, b, h, w, c), np.uint8)
    p = ctypes.POINTER
    fn = lib.replay_sweep_u8 if bits == 2 else lib.replay_sweep_u8_b1
    fn(
        clean_v.ctypes.data_as(p(ctypes.c_int32)),
        packed.ctypes.data_as(p(ctypes.c_uint8)),
        a2.ctypes.data_as(p(ctypes.c_int32)),
        e2.ctypes.data_as(p(ctypes.c_int32)),
        m2.ctypes.data_as(p(ctypes.c_int32)),
        cq.ctypes.data_as(p(ctypes.c_float)),
        ctypes.c_int(iters), ctypes.c_int(b), ctypes.c_int(h),
        ctypes.c_int(w), ctypes.c_int(c),
        ctypes.c_int(1 if flip_channels else 0),
        out.ctypes.data_as(p(ctypes.c_uint8)))
    return out
