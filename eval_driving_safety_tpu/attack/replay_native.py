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
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", _LIB_PATH],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_native():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        _failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.replay_sweep_u8.restype = None
        _lib = lib
    except OSError:
        _failed = True
    return _lib


def replay_sweep_u8(clean2: np.ndarray, packed: np.ndarray,
                    alpha2, eps2, max2, c255,
                    flip_channels: bool):
    """(B,H,W,C) doubled-int32 clean + (iters,B,HWC/4) packed signs ->
    (iters,B,H,W,C) quantized u8 frames, or None when the native library
    is unavailable. Parameters are per-sample (B,) arrays (scalars are
    broadcast)."""
    lib = get_native()
    if lib is None:
        return None
    clean2 = np.ascontiguousarray(clean2, np.int32)
    packed = np.ascontiguousarray(packed, np.uint8)
    iters, b = packed.shape[0], clean2.shape[0]
    h, w, c = clean2.shape[1:]
    a2 = np.ascontiguousarray(np.broadcast_to(
        np.asarray(alpha2, np.int32).reshape(-1), (b,)), np.int32)
    e2 = np.ascontiguousarray(np.broadcast_to(
        np.asarray(eps2, np.int32).reshape(-1), (b,)), np.int32)
    m2 = np.ascontiguousarray(np.broadcast_to(
        np.asarray(max2, np.int32).reshape(-1), (b,)), np.int32)
    cq = np.ascontiguousarray(np.broadcast_to(
        np.asarray(c255, np.float32).reshape(-1), (b,)), np.float32)
    out = np.empty((iters, b, h, w, c), np.uint8)
    scratch = np.empty((b, h, w, c), np.int32)
    p = ctypes.POINTER
    lib.replay_sweep_u8(
        clean2.ctypes.data_as(p(ctypes.c_int32)),
        packed.ctypes.data_as(p(ctypes.c_uint8)),
        a2.ctypes.data_as(p(ctypes.c_int32)),
        e2.ctypes.data_as(p(ctypes.c_int32)),
        m2.ctypes.data_as(p(ctypes.c_int32)),
        cq.ctypes.data_as(p(ctypes.c_float)),
        ctypes.c_int(iters), ctypes.c_int(b), ctypes.c_int(h),
        ctypes.c_int(w), ctypes.c_int(c),
        ctypes.c_int(1 if flip_channels else 0),
        out.ctypes.data_as(p(ctypes.c_uint8)),
        scratch.ctypes.data_as(p(ctypes.c_int32)))
    return out
