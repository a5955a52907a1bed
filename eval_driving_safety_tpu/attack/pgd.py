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
_UNPACK_LUT_2X = (2 * (np.stack([(np.arange(256) >> (2 * i)) & 3
                                 for i in range(4)], axis=-1)
                       .astype(np.int16) - 1))    # doubled signs, int16
_UNPACK_LUT_I8 = (np.stack([(np.arange(256) >> (2 * i)) & 3
                            for i in range(4)], axis=-1)
                  .astype(np.int8) - 1)           # plain signs, int8

# 1-bit planes ("signs1"): bit i of a byte = LSB-first flag for element
# 8*k+i. The positive plane alone is enough when no gradient is exactly
# zero (the overwhelmingly common case — see pgd_attack collect="signs1");
# the zero plane is a SEPARATE 1-bit plane fetched only when the per-iter
# zero count says it is needed, so the steady-state device->host sign
# traffic HALVES vs the 2-bit codes.
_B1_WEIGHTS = tuple(1 << i for i in range(8))
_B1_BITS = np.stack([(np.arange(256) >> i) & 1 for i in range(8)],
                    axis=-1).astype(np.uint16)                 # (256, 8)


def _b1_to_code2_lut(ones_code: int, zeros_code: int) -> np.ndarray:
    """(256,) uint16 LUT: 8 bits -> eight 2-bit fields (little-endian),
    set-bit fields = ones_code, clear-bit fields = zeros_code."""
    fields = np.where(_B1_BITS == 1, ones_code, zeros_code).astype(np.uint16)
    return (fields << (2 * np.arange(8, dtype=np.uint16))).sum(
        axis=-1, dtype=np.uint16)


# positive plane alone: bit -> sign code (+1 -> 2, -1 -> 0)
_LUT_B1_CODE2 = _b1_to_code2_lut(2, 0)
# zero plane: where the zero bit is set, FORCE code 1 (sign 0):
# code2 = (base & ~mask3) | mask1
_LUT_Z_MASK3 = _b1_to_code2_lut(3, 0)
_LUT_Z_CODE1 = _b1_to_code2_lut(1, 0)


def signs1_to_packed2(pos_packed: np.ndarray,
                      zero_packed: Optional[np.ndarray] = None) -> np.ndarray:
    """Host convert of 1-bit sign planes to the 2-bit `pack_signs` codes
    (exact): (..., W*C//8) uint8 -> (..., W*C//4) uint8. Lets every
    existing replay path (native kernel, replay_pgd_ints/_255, replay_pgd)
    consume 1-bit fetches unchanged."""
    p = np.asarray(pos_packed)
    code = _LUT_B1_CODE2[p]
    if zero_packed is not None:
        z = np.asarray(zero_packed)
        code = (code & ~_LUT_Z_MASK3[z]) | _LUT_Z_CODE1[z]
    # little-endian uint16 -> two LSB-first 2-bit-code bytes
    return code.astype("<u2").view(np.uint8).reshape(*p.shape[:-1], -1)


def pack_signs(s):
    """(..., W, C) f32/i8 signs in {-1,0,+1} -> (..., W*C//4) uint8."""
    w, c = s.shape[-2], s.shape[-1]
    if (w * c) % 4 != 0:
        raise ValueError(f"W*C={w * c} not divisible by 4; pad the width")
    code = (s + 1).astype(jnp.uint8).reshape(*s.shape[:-2], (w * c) // 4, 4)
    weights = jnp.asarray(_PACK_WEIGHTS, jnp.uint8)
    return (code * weights).sum(axis=-1).astype(jnp.uint8)


def pack_bits(b):
    """(..., W, C) bool -> (..., W*C//8) uint8, LSB-first 1-bit plane."""
    w, c = b.shape[-2], b.shape[-1]
    if (w * c) % 8 != 0:
        raise ValueError(f"W*C={w * c} not divisible by 8; pad the width")
    code = b.astype(jnp.uint8).reshape(*b.shape[:-2], (w * c) // 8, 8)
    weights = jnp.asarray(_B1_WEIGHTS, jnp.uint8)
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
    # collect=True:     ((iters, B, H, W, 3) f32, same) — full iterates
    # collect="signs":  ((iters, B, H, W*3//4) u8, same) — packed signs
    # collect="signs1": per side a (pos_plane (iters,B,H,W*3//8) u8,
    #                   zero_plane same, nzeros (iters,) i32) triple —
    #                   fetch pos+nzeros; fetch zero_plane only if nzeros
    #                   says any gradient was exactly 0 (see module doc)


def pgd_attack(loss_fn: Callable, clean_left, clean_right, *,
               num_iters: int, alpha, eps, clip_min, clip_max,
               collect=False, sign_only: bool = True) -> PGDResult:
    """L-inf PGD ascent on `loss_fn` w.r.t. both stereo views jointly.

    clip_min/clip_max broadcast against (B,H,W,3) — pass shape-(3,) arrays
    for per-channel bounds (the Stereo R-CNN convention).

    collect=True stacks full iterates; collect="signs" stacks 2-bit packed
    gradient signs (requires sign_only), from which `replay_pgd`
    reconstructs every iterate on the host bit-exactly. collect="signs1"
    splits each iteration's signs into TWO 1-bit planes (positive, zero)
    plus a per-iteration zero count: gradients are exactly zero at a pixel
    only in degenerate cases, so the host fetches the positive plane +
    counts and pulls the zero plane only when a count is nonzero — halving
    the steady-state sign traffic through the device->host link.
    """
    if collect in ("signs", "signs1") and not sign_only:
        raise ValueError(f"collect={collect!r} requires sign_only=True")
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
        elif collect == "signs1":
            out = tuple((pack_bits(g > 0), pack_bits(g == 0),
                         jnp.sum(g == 0, dtype=jnp.int32))
                        for g in (gl, gr))
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
    alpha = np.asarray(alpha, np.float32)   # scalar or broadcastable array
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


def replay_255_valid(alpha, eps, clip_min, clip_max) -> bool:
    """True when the integer replay (`replay_pgd_255`) is exact for a
    255-space attack: unit step, half-integer ball, full pixel range."""
    try:
        return (float(alpha) == 1.0 and float(2 * eps).is_integer()
                and float(clip_min) == 0.0 and float(clip_max) == 255.0)
    except (TypeError, ValueError):
        return False


def srcnn_replay_intable(a_pix, e_pix, K) -> bool:
    """True when the doubled-integer replay (`replay_pgd_ints` / the native
    sweep kernel) is bit-exact for a v-space attack with per-sample scale
    K = den_h*den_w (clean values = K*255*bgr01, exact integers).

    Exactness requires every f32 value the DEVICE produces to be exactly
    representable. With alpha_v = a_pix*K and eps_v = e_pix*K both integers
    (2*a_pix*K and 2*e_pix*K even), all iterates, deltas and clip bounds
    live on the INTEGER grid, exact below 2^24; with half-integer alpha/eps
    (the doubled values merely integral) the grid halves and the bound is
    2^23. The largest intermediate that must be exact is
    max((255 + a_pix)*K, e_pix*K) — the pre-clip step x + alpha*sign and
    the eps-ball radius. The upper ball bound clean + eps MAY exceed the
    limit, but only when it also exceeds clip_max = 255*K, where the final
    range clamp absorbs its rounding (min(x', round(ub)) == x' whenever
    round(ub) > clip_max + alpha >= x'). At reference paper scale
    (K = 16*3974 = 63584, alpha=1, eps=76.5) this passes the 2^24 even-grid
    gate — the earlier 2^23 gate silently forced the slow f32 replay for
    every paper-scale sweep (ADVICE r4 #3)."""
    K = np.asarray(K, np.float64)
    a2 = np.asarray(2.0 * a_pix * K)
    e2 = np.asarray(2.0 * e_pix * K)
    a2r, e2r = np.rint(a2), np.rint(e2)
    if not (np.all(a2 == a2r) and np.all(e2 == e2r)):
        return False
    even = bool(np.all(a2r % 2 == 0) and np.all(e2r % 2 == 0))
    lim = 2.0 ** 24 if even else 2.0 ** 23
    big = float(np.maximum((255.0 + a_pix) * K, e_pix * K).max())
    return big < lim


def replay_pgd_ints(clean2_left: np.ndarray, clean2_right: np.ndarray,
                    packed_left: np.ndarray, packed_right: np.ndarray, *,
                    alpha2, eps2, clip_max2):
    """Doubled-integer replay for grid attack spaces.

    When `srcnn_replay_intable` holds (integer/half-integer alpha_v, eps_v
    with all device intermediates under the f32-exact grid bound — 2^24 on
    the integer grid, 2^23 on the half grid), every f32 iterate of the
    device attack lives exactly on the half-integer grid, so the
    trajectory is tracked as DOUBLED int32 values. Inputs/outputs are
    2x-scaled: clean2 = 2*clean (int32), alpha2/eps2/clip_max2 = doubled
    scalars or (B,) arrays. Yields (v2_left, v2_right) int32 pairs per
    iteration — v2/2 equals the device's f32 iterate exactly."""
    def bshape(v):
        a = np.asarray(v, np.int32)
        return a.reshape(-1, 1, 1, 1) if a.ndim == 1 else a

    a2, e2, m2 = bshape(alpha2), bshape(eps2), bshape(clip_max2)
    c2l = np.asarray(clean2_left, np.int32)
    c2r = np.asarray(clean2_right, np.int32)
    v2l, v2r = c2l, c2r
    ch = c2l.shape[-1]
    pl = np.asarray(packed_left)
    pr = np.asarray(packed_right)

    def unpack_sign(p):
        out = _UNPACK_LUT_I8[p]
        w = p.shape[-1] * 4 // ch
        return out.reshape(*p.shape[:-1], w, ch)

    for k in range(pl.shape[0]):
        v2l = np.clip(np.clip(v2l + unpack_sign(pl[k]) * a2 - c2l,
                              -e2, e2) + c2l, 0, m2)
        v2r = np.clip(np.clip(v2r + unpack_sign(pr[k]) * a2 - c2r,
                              -e2, e2) + c2r, 0, m2)
        yield v2l, v2r


def replay_pgd_255(clean_u8_left: np.ndarray, clean_u8_right: np.ndarray,
                   packed_left: np.ndarray, packed_right: np.ndarray, *,
                   eps: float):
    """Integer replay for attacks in 255-space (alpha=1, clip [0,255],
    clean = exact uint8 pixels — the DSGN sweep's space since r4).

    Device iterates are HALF-INTEGERS: every update op is an exact f32
    add/sub/clip on half-integer values < 2^24, so the trajectory lives
    exactly on the half grid and is tracked here as doubled values in
    int16 (update +-2, ball +-2*eps, range [0, 510]). Yields QUANTIZED
    (u8_left, u8_right) frames per iteration — bit-equal to running
    replay_pgd in f32 and truncating (tests/test_pgd_signs.py), at a
    fraction of the host cost (int16 adds, no float passes, no separate
    quantization)."""
    e2 = int(round(2 * float(eps)))
    c2l = (clean_u8_left.astype(np.int16) << 1)
    c2r = (clean_u8_right.astype(np.int16) << 1)
    v2l, v2r = c2l, c2r
    ch = clean_u8_left.shape[-1]
    pl = np.asarray(packed_left)
    pr = np.asarray(packed_right)

    def unpack2x(p):
        out = _UNPACK_LUT_2X[p]
        w = p.shape[-1] * 4 // ch
        return out.reshape(*p.shape[:-1], w, ch)

    for k in range(pl.shape[0]):
        v2l = np.clip(np.clip(v2l + unpack2x(pl[k]) - c2l, -e2, e2) + c2l,
                      0, 510)
        v2r = np.clip(np.clip(v2r + unpack2x(pr[k]) - c2r, -e2, e2) + c2r,
                      0, 510)
        # u8 = trunc(v) = (2v) >> 1 (100.5 -> 100, matching save_image)
        yield ((v2l >> 1).astype(np.uint8), (v2r >> 1).astype(np.uint8))
