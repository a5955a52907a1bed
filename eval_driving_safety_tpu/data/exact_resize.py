"""Exact integer bilinear resize — the SRCNN transfer-minimal ingest.

The reference's Stereo R-CNN loader resizes frames to scale
600/shorter-side with cv2 INTER_LINEAR before the attack
(/root/reference/attack/Stereo-RCNN/roibatchLoader.py:23-103). Shipping
the resized float pair over a thin host<->device link costs ~29 MB/frame
each way; shipping the RAW u8 frame costs 1.4 MB — but then the device
and the host (which replays sign trajectories, attack.pgd.replay_pgd)
must derive the SAME clean pair bit-for-bit, and float resizes are not
reproducible across backends.

Solution: bilinear weights at half-pixel centers are RATIONALS with
denominator 2*out_size, so the resize is computed in INTEGER arithmetic —
v2 = sum(c_ij * u8_ij) with c_ij integer, exact and identical on any
backend — and the only float op is one multiply by the f32 constant
1/(255 * den_h * den_w), which IEEE rounds identically on numpy and XLA
(asserted on the real device in tests/test_exact_resize.py). The result
is the frame in BGR [0,1] at network scale: EXACTLY the true rational
bilinear value correctly rounded once, i.e. at least as faithful to
cv2/jax semantics as either (both accumulate f32 error instead).

Weights follow cv2 INTER_LINEAR / jax.image.resize "linear" half-pixel
convention (src = (d+0.5)*in/out - 0.5, clamp-to-edge); upscaling never
antialiases, so all three agree on the sample positions.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class AxisWeights(NamedTuple):
    i0: np.ndarray      # (out,) int32 lower source index (edge-clamped)
    i1: np.ndarray      # (out,) int32 upper source index
    r: np.ndarray       # (out,) int32 numerator of the fractional weight
    den: int            # weight denominator (2 * full output size)


def bilinear_axis_weights(in_size: int, out_size: int,
                          crop: int | None = None) -> AxisWeights:
    """Integer bilinear weights for in_size -> out_size at half-pixel
    centers; `crop` keeps only the first N output positions (the network
    width crop) without changing the sample grid."""
    n = out_size if crop is None else min(crop, out_size)
    d = np.arange(n, dtype=np.int64)
    den = 2 * out_size
    num = (2 * d + 1) * in_size - out_size      # src = num / den
    lo = num // den                             # floor for negatives too
    r = num - lo * den                          # in [0, den)
    # reduce the fraction r/den by the gcd common to EVERY weight: keeps
    # the scaled values v2 = sum(c*u8) small enough (< 2^24 for KITTI
    # scales) that they are exactly representable in f32 — the basis of
    # the integer-grid attack space (dataset.prepare_srcnn_batch_u8)
    g = int(np.gcd.reduce(np.concatenate([r, [den]])))
    r = (r // g).astype(np.int32)
    den //= g
    i0 = np.clip(lo, 0, in_size - 1).astype(np.int32)
    i1 = np.clip(lo + 1, 0, in_size - 1).astype(np.int32)
    return AxisWeights(i0, i1, r, int(den))


def resize_v2_host(img_u8: np.ndarray, wh: AxisWeights,
                   ww: AxisWeights) -> np.ndarray:
    """(H,W,C) uint8 -> (out_h, out_w, C) int32 scaled by den_h*den_w.
    Pure integer math — the host twin of the device ingest."""
    if 255 * wh.den * ww.den >= 2 ** 31:
        raise ValueError("scaled values would overflow int32")
    x = img_u8.astype(np.int32)
    v1 = (wh.den - wh.r)[:, None, None] * x[wh.i0] \
        + wh.r[:, None, None] * x[wh.i1]
    v2 = (ww.den - ww.r)[None, :, None] * v1[:, ww.i0] \
        + ww.r[None, :, None] * v1[:, ww.i1]
    return v2


def resize_v2_device(img_u8, ih0, ih1, rh, den_h, iw0, iw1, rw, den_w):
    """Batched device ingest: (B,Hp,Wp,C) uint8 (bottom/right padding
    allowed — indices never reach it) with PER-SAMPLE weight arrays
    (B,out_h)/(B,out_w) and denominators (B,) -> (B,out_h,out_w,C) int32
    scaled by den_h*den_w. Integer gathers + muls: bit-identical to
    resize_v2_host by construction."""
    import jax.numpy as jnp
    x = img_u8.astype(jnp.int32)
    b, _, wp, c = x.shape

    def take_h(src, idx):
        return jnp.take_along_axis(src, idx[:, :, None, None], axis=1)

    def take_w(src, idx):
        return jnp.take_along_axis(src, idx[:, None, :, None], axis=2)

    dh = den_h[:, None, None, None]
    v1 = (dh - rh[:, :, None, None]) * take_h(x, ih0) \
        + rh[:, :, None, None] * take_h(x, ih1)
    dw = den_w[:, None, None, None]
    v2 = (dw - rw[:, None, :, None]) * take_w(v1, iw0) \
        + rw[:, None, :, None] * take_w(v1, iw1)
    return v2
