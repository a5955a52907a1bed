"""Pallas TPU kernel for the plane-sweep-volume disparity warp.

The PSV warp reads each right-view feature row at `x - disparity_d` for
every depth plane d (sub-pixel, zero outside). ops.cost_volume expresses it
as (W, W) interpolation matmuls — O(D*W^2*H*C) MXU FLOPs for what is
semantically an O(D*H*W*C) streaming shift. This kernel does the shift
directly: per (plane, row-tile) grid step it reads one sublane-aligned
window of a zero-padded copy of the features and lerps two statically
shifted views of it in VMEM — pure bandwidth, no FLOP blow-up.

TPU constraint handled here: dynamic sublane slices must start at multiples
of 8, so the kernel slices at `(base // 8) * 8` and resolves the residual
0..7-sublane offset with an 8-way `lax.switch` over static slices.

Backward pass (custom VJP): the adjoint of "sample at x - d" is the warp by
the same disparity in the opposite direction, summed over planes — a second
kernel that iterates planes innermost and accumulates into a revisited
output block.

Out-of-range semantics (sample coordinate outside [0, W-1] -> exact zero,
matching `shift_along_width` / the einsum tent weights) are applied as an
elementwise mask outside the kernels, so the kernels stay branch-free.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 8
_WIN_EXTRA = 32          # window width beyond w: 16 alignment + 16 slack


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on CPU (tests / dry runs)
    return jax.default_backend() != "tpu"


def _lerp_window(window, wa, wb, w: int, off, b_delta: int):
    """window (TH, w+_WIN_EXTRA, C); returns wa*A + wb*B where A/B are the
    views starting at sublane `off + 8` and `off + 8 + b_delta`
    (off in [0, 8))."""
    def case(k):
        def fn():
            a = window[:, 8 + k: 8 + k + w, :]
            b = window[:, 8 + k + b_delta: 8 + k + b_delta + w, :]
            return a * wa + b * wb
        return fn

    return jax.lax.switch(off, [case(k) for k in range(8)])


def _fwd_kernel(shift_ref, frac_ref, fr_ref, out_ref, *,
                w: int, pad_left: int):
    d = pl.program_id(1)
    base = pad_left - shift_ref[d]                 # start of fr[x - k]
    aligned = pl.multiple_of((base // 8) * 8 - 8, 8)
    window = fr_ref[:, pl.ds(aligned, w + _WIN_EXTRA), :]
    # weights computed in fp32 (Mosaic cannot legalize bf16 scalar subf)
    wb = frac_ref[d]
    wa = (1.0 - wb).astype(fr_ref.dtype)
    wb = wb.astype(fr_ref.dtype)
    # a = fr[x - k] at offset (base - aligned) in [8, 15]; b = fr[x - k - 1]
    out_ref[0, :, :, :] = _lerp_window(window, wa, wb, w,
                                       base - aligned - 8, b_delta=-1)


def _bwd_kernel(shift_ref, frac_ref, g_ref, out_ref, *,
                w: int, pad_left: int):
    d = pl.program_id(1)
    base = pad_left + shift_ref[d]                 # start of g[y + k]
    aligned = pl.multiple_of((base // 8) * 8 - 8, 8)
    window = g_ref[0, :, pl.ds(aligned, w + _WIN_EXTRA), :]
    wb = frac_ref[d]
    wa = (1.0 - wb).astype(g_ref.dtype)
    wb = wb.astype(g_ref.dtype)
    contrib = _lerp_window(window, wa, wb, w, base - aligned - 8, b_delta=1)

    @pl.when(d == 0)
    def _():
        out_ref[:, :, :] = contrib

    @pl.when(d > 0)
    def _():
        out_ref[:, :, :] = out_ref[:, :, :] + contrib


def _split(disps, w):
    shift = jnp.clip(jnp.floor(disps), 0.0, w - 1.0)
    return shift.astype(jnp.int32), (disps - shift)


def _valid_mask(disps, w, dtype):
    """(D, 1, W, 1): sample coordinate x - d inside [0, w-1]."""
    xs = jnp.arange(w, dtype=jnp.float32)
    ok = (xs[None, :] - disps[:, None] >= 0.0) \
        & (xs[None, :] - disps[:, None] <= w - 1.0)
    return ok.astype(dtype)[:, None, :, None]


def _pad_widths(w: int, pad_left: int):
    """Left pad + right pad so every aligned window stays in bounds."""
    # max window end: (max base - 8 rounded down) + w + _WIN_EXTRA
    total = pad_left + w - 1 + w + _WIN_EXTRA
    right = total - (pad_left + w)
    return pad_left, right


@jax.custom_vjp
def psv_warp(fr, disps):
    """fr (H, W, C), disps (D,) -> warped (D, H, W, C); zeros where
    x - disp is outside the image. Equivalent to
    `vmap(shift_along_width)(disps)` and the einsum tent-matmul path."""
    return _warp_impl(fr, disps)


def _warp_impl(fr, disps):
    h, w, c = fr.shape
    d = disps.shape[0]
    pad_left = w + 16
    pl_, pr_ = _pad_widths(w, pad_left)
    fr_pad = jnp.pad(fr, ((0, 0), (pl_, pr_), (0, 0)))
    shift, frac = _split(disps, w)
    wp = fr_pad.shape[1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, w=w, pad_left=pad_left),
        out_shape=jax.ShapeDtypeStruct((d, h, w, c), fr.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(pl.cdiv(h, ROW_TILE), d),
            in_specs=[pl.BlockSpec((ROW_TILE, wp, c),
                                   lambda h_, d_, *_: (h_, 0, 0))],
            out_specs=pl.BlockSpec((1, ROW_TILE, w, c),
                                   lambda h_, d_, *_: (d_, h_, 0, 0)),
        ),
        interpret=_interpret(),
    )(shift, frac, fr_pad)
    return out * _valid_mask(disps, w, out.dtype)


def _warp_fwd(fr, disps):
    return _warp_impl(fr, disps), disps


def _warp_bwd(disps, g):
    d, h, w, c = g.shape
    dtype = g.dtype
    pad_left = 16
    pl_, pr_ = _pad_widths(w, pad_left)
    g = g * _valid_mask(disps, w, dtype)
    g_pad = jnp.pad(g, ((0, 0), (0, 0), (pl_, pr_), (0, 0)))
    shift, frac = _split(disps, w)
    wp = g_pad.shape[2]
    grad_fr = pl.pallas_call(
        functools.partial(_bwd_kernel, w=w, pad_left=pad_left),
        out_shape=jax.ShapeDtypeStruct((h, w, c), dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(pl.cdiv(h, ROW_TILE), d),       # planes innermost
            in_specs=[pl.BlockSpec((1, ROW_TILE, wp, c),
                                   lambda h_, d_, *_: (d_, h_, 0, 0))],
            out_specs=pl.BlockSpec((ROW_TILE, w, c),  # revisited over d
                                   lambda h_, d_, *_: (h_, 0, 0)),
        ),
        interpret=_interpret(),
    )(shift, frac, g_pad)
    return grad_fr, None


psv_warp.defvjp(_warp_fwd, _warp_bwd)


def build_psv_pallas(feat_left, feat_right, f_u, baseline, planes,
                     stride: int):
    """Drop-in replacement for ops.cost_volume.build_psv using the kernel."""
    dsz = planes.shape[0]

    def per_image(fl, fr, fu, bl):
        disps = (fu * bl / planes / stride).astype(jnp.float32)
        warped = psv_warp(fr, disps)
        tiled = jnp.broadcast_to(fl[None], (dsz,) + fl.shape)
        return jnp.concatenate([tiled, warped.astype(fl.dtype)], axis=-1)

    return jax.vmap(per_image)(feat_left, feat_right, f_u, baseline)
