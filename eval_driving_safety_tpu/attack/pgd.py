"""Model-agnostic PGD (iterated FGSM, L-inf) attack engine.

Capability parity: the per-image PGD loops of the reference
(/root/reference/attack/DSGN/pgd_attack.py:300-354 — ascent on the total
loss, grad-sign step, eps-ball projection vs the clean image, pixel-range
clamp; /root/reference/attack/Stereo-RCNN/pgd_attack.py:165-217 — same in
BGR-mean-subtracted space with per-channel clamps).

TPU-first design: the whole iteration loop is ONE jitted `lax.scan` over a
*batch* of stereo pairs; sharding the batch axis over a mesh makes the sweep
embarrassingly parallel (SURVEY.md §2.3). The loss function is a closure
`loss_fn(im_left, im_right) -> scalar` that must already include any
normalization — the engine operates purely in "attack space" (the space in
which eps-balls and pixel bounds are defined: [0,1] RGB for DSGN,
mean-subtracted BGR pixels for Stereo R-CNN).

Sign trajectories (`collect="signs"`): the PGD update is a deterministic
function of (clean pair, per-iter gradient signs) — `alpha * sign` is an
EXACT f32 product, and every other update op (add, sub, clip) is a single
correctly-rounded f32 op, so replaying the update rule on the host from
the packed signs reproduces every device iterate BIT-EXACTLY
(`replay_pgd`, asserted in tests/test_pgd_signs.py). Collecting 2-bit
packed signs instead of f32 iterates shrinks both the on-device trajectory
(16x less HBM for the scan stack) and the device->host fetch of a full
save-every-iteration sweep (the reference writes (iters+1) x 2 PNGs per
frame) by 16x — on hosts linked to the accelerator by a thin pipe this is
the difference between a transfer-bound and a compute-bound sweep.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# 2-bit sign codes: sign s in {-1, 0, +1} -> code s+1 in {0, 1, 2};
# 4 codes per byte along the flattened (W, C) trailing axes — row-major
# contiguous, so the host unpack is ONE 256-entry table gather with no
# transpose (the unpack is on the sweep's host critical path)
_PACK_WEIGHTS = (1, 4, 16, 64)
_UNPACK_LUT = (np.stack([(np.arange(256) >> (2 * i)) & 3 for i in range(4)],
                        axis=-1).astype(np.float32) - 1.0)     # (256, 4)


def pack_signs(s):
    """(..., W, C) f32/i8 signs in {-1,0,+1} -> (..., W*C//4) uint8."""
    w, c = s.shape[-2], s.shape[-1]
    if (w * c) % 4 != 0:
        raise ValueError(f"W*C={w * c} not divisible by 4; pad the width")
    code = (s + 1).astype(jnp.uint8).reshape(*s.shape[:-2], (w * c) // 4, 4)
    weights = jnp.asarray(_PACK_WEIGHTS, jnp.uint8)
    return (code * weights).sum(axis=-1).astype(jnp.uint8)


def unpack_signs(packed: np.ndarray, channels: int = 3) -> np.ndarray:
    """Host inverse of pack_signs: (..., W*C//4) uint8 -> (..., W, C)
    float32 signs in {-1, 0, +1}."""
    p = np.asarray(packed)
    out = _UNPACK_LUT[p]                          # (..., W*C//4, 4)
    w = p.shape[-1] * 4 // channels
    return out.reshape(*p.shape[:-1], w, channels)


class PGDResult(NamedTuple):
    adv_left: jnp.ndarray    # (B, H, W, 3) final attacked pair
    adv_right: jnp.ndarray
    losses: jnp.ndarray      # (num_iters,) loss value per iteration
    trajectory: Optional[tuple]
    # collect=True:    ((iters, B, H, W, 3) f32, same) — full iterates
    # collect="signs": ((iters, B, H, W*3//4) u8, same) — packed signs


def pgd_attack(loss_fn: Callable, clean_left, clean_right, *,
               num_iters: int, alpha, eps, clip_min, clip_max,
               collect=False, sign_only: bool = True) -> PGDResult:
    """L-inf PGD ascent on `loss_fn` w.r.t. both stereo views jointly.

    clip_min/clip_max broadcast against (B,H,W,3) — pass shape-(3,) arrays
    for per-channel bounds (the Stereo R-CNN convention).

    collect=True stacks full iterates; collect="signs" stacks 2-bit packed
    gradient signs (requires sign_only), from which `replay_pgd`
    reconstructs every iterate on the host bit-exactly.
    """
    if collect == "signs" and not sign_only:
        raise ValueError("collect='signs' requires sign_only=True")
    clip_min = jnp.asarray(clip_min, clean_left.dtype)
    clip_max = jnp.asarray(clip_max, clean_left.dtype)
    grad_fn = jax.value_and_grad(
        lambda l, r: loss_fn(l, r), argnums=(0, 1))

    def project(x, clean):
        x = clean + jnp.clip(x - clean, -eps, eps)
        return jnp.clip(x, clip_min, clip_max)

    def step(carry, _):
        xl, xr = carry
        loss, (gl, gr) = grad_fn(xl, xr)
        if sign_only:
            gl, gr = jnp.sign(gl), jnp.sign(gr)
        xl = project(xl + alpha * gl, clean_left)
        xr = project(xr + alpha * gr, clean_right)
        if collect == "signs":
            out = (pack_signs(gl), pack_signs(gr))
        elif collect:
            out = (xl, xr)
        else:
            out = None
        return (xl, xr), (loss, out)

    (adv_l, adv_r), (losses, traj) = jax.lax.scan(
        step, (clean_left, clean_right), None, length=num_iters)
    return PGDResult(adv_l, adv_r, losses, traj)


def replay_pgd(clean_left: np.ndarray, clean_right: np.ndarray,
               packed_left: np.ndarray, packed_right: np.ndarray, *,
               alpha, eps, clip_min, clip_max):
    """Host replay of the PGD update rule from packed gradient signs.

    Yields (iter_left, iter_right) float32 pairs for iterations 1..N,
    each BIT-IDENTICAL to the device iterate: the update uses only exact
    products (alpha * {-1,0,+1}) and single correctly-rounded f32
    add/sub/clip ops, which numpy and XLA round identically (fused
    multiply-adds cannot diverge because the product term is exact).
    """
    alpha = np.float32(alpha)
    eps = np.asarray(eps, np.float32)
    clip_min = np.asarray(clip_min, np.float32)
    clip_max = np.asarray(clip_max, np.float32)
    xl = np.asarray(clean_left, np.float32)
    xr = np.asarray(clean_right, np.float32)
    cl, cr = xl, xr
    ch = xl.shape[-1]
    for k in range(np.asarray(packed_left).shape[0]):
        sl = unpack_signs(packed_left[k], channels=ch)
        sr = unpack_signs(packed_right[k], channels=ch)
        xl = np.clip(cl + np.clip((xl + alpha * sl) - cl, -eps, eps),
                     clip_min, clip_max).astype(np.float32)
        xr = np.clip(cr + np.clip((xr + alpha * sr) - cr, -eps, eps),
                     clip_min, clip_max).astype(np.float32)
        yield xl, xr
