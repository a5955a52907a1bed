"""Fused Pallas kernel for the depth stage of (2+1)D volume convolutions.

The (2+1)D blocks (models/dsgn.py ConvBnRelu2p1D — capability parity with
the reference's dense Conv3d hourglass, /root/reference/attack/DSGN
`hourglass` modules) run a 3x3 spatial conv with D folded into batch, then
a 3-tap conv over D, then frozen BN + ReLU. XLA's best lowering of the
D-stage (measured against banded matmuls, degenerate (3,1,1) Conv3Ds,
tap-shifted dots, and a (3,1)-conv-on-(B,D,H*W,C) reshape — PARITY.md) is
a 1D conv on (B*H*W, D, C), which forces TWO full-volume layout copies per
conv per pass: the compiled paper-scale attack step materializes ~7 GB/iter
of pure `copy` ops around these transposes (HLO audit, r3), on a step that
is HBM-bandwidth-bound at ~80% of peak.

This kernel removes the transposes by exploiting that the depth conv has
NO spatial extent. With the volume viewed as (B, D, N=H*W, C) — a free
reshape — the grid walks (batch, column-block, depth-row) and each step
reads three CONTIGUOUS (nb, C) row-blocks of x (rows d-1, d, d+1 via three
shifted-index refs; boundary taps masked by scalar multiplies), so

    y[d] = relu((x[d-1] @ W0 + x[d] @ W1 + x[d+1] @ W2) * inv + off)

is three MXU matmuls per step with every HBM transfer a single dense
chunk. (A first design that carried the whole D axis per block — (D, nb,
C) columns — measured 2.2x SLOWER than the transpose form: each block
decomposed into D tiny strided DMAs, ~90k 2 KB descriptors per pass.)

The backward reads x once (not three times) by reindexing the weight
gradient — dW_t = sum_e x[e]^T dz[e-t+1] — so only the *masked output
gradient* dm = dy * 1[y>0] needs shifted refs; dz = dm * inv is formed
in-kernel (never divided back out, which would be ill-defined at inv == 0)
and the BN coefficient grads reuse a recomputed z from the already-loaded
x rows. dx, dW, and d(inv, off) come out of one fused pass.

Parameter layout matches `nn.Conv(F, (3,), use_bias=False)` (kernel
(3, C, F)) + `models.common.FrozenBatchNorm` folded coefficients, so the
transpose formulation and this kernel are checkpoint-interchangeable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# test hook: run the Pallas kernels in interpreter mode (CPU correctness)
_FORCE_INTERPRET = False

# per-buffer VMEM budget for row-block sizing: the bwd holds 7 blocked
# buffers (x_m/x_0/x_p, dm_m/dm_0/dm_p, dx), double-buffered, plus f32
# stack intermediates; C and F pad to 128 lanes in VMEM regardless of
# their true width. 0.62 MB/buffer keeps the worst case well under the
# 16 MB scoped-vmem limit (a 1.4 MB budget OOM'd an earlier variant).
_VMEM_BUFFER_BYTES = 0.62e6


def _pad128(c: int) -> int:
    return ((c + 127) // 128) * 128


def pick_nb(n: int, c: int, f: int, itemsize: int = 2):
    """Largest divisor of n (multiple of 8) whose (nb, C) row-block fits
    the per-buffer VMEM budget. None if no usable divisor exists."""
    limit = int(_VMEM_BUFFER_BYTES / (_pad128(max(c, f)) * itemsize))
    best = None
    for nb in range(8, min(n, limit) + 1, 8):
        if n % nb == 0:
            best = nb
    return best


def _dot(a, b):                                     # (nb, C) @ (C, F)
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(xm_ref, x0_ref, xp_ref, w_ref, co_ref, y_ref,
                *, relu: bool, nd: int):
    d = pl.program_id(2)
    m0 = jnp.where(d == 0, 0.0, 1.0)        # row d-1 clamped at d == 0
    m2 = jnp.where(d == nd - 1, 0.0, 1.0)   # row d+1 clamped at d == nd-1
    w = w_ref[...]
    z = _dot(x0_ref[0, 0], w[1])
    z = z + m0 * _dot(xm_ref[0, 0], w[0])
    z = z + m2 * _dot(xp_ref[0, 0], w[2])   # (nb, F) f32
    out = z * co_ref[0][None, :].astype(jnp.float32) \
        + co_ref[1][None, :].astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    y_ref[0, 0] = out.astype(y_ref.dtype)


def _bwd_kernel(xm_ref, x0_ref, xp_ref, dmm_ref, dm0_ref, dmp_ref,
                w_ref, co_ref, dx_ref, dw_ref, dco_ref, *, nd: int):
    first = jnp.logical_and(
        pl.program_id(0) == 0,
        jnp.logical_and(pl.program_id(1) == 0, pl.program_id(2) == 0))

    @pl.when(first)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dco_ref[...] = jnp.zeros_like(dco_ref)

    d = pl.program_id(2)
    mm = jnp.where(d == 0, 0.0, 1.0).astype(jnp.float32)
    mp = jnp.where(d == nd - 1, 0.0, 1.0).astype(jnp.float32)
    w = w_ref[...]
    inv = co_ref[0][None, :]
    x0 = x0_ref[0, 0]

    # dz rows d-1 / d / d+1, boundary-masked (dm = dy * 1[y>0] from the
    # XLA prepass; dz = dm * inv formed here, in the matmul input dtype)
    dz0 = (dm0_ref[0, 0] * inv).astype(x0.dtype)
    dzm = (dmm_ref[0, 0] * inv * mm.astype(inv.dtype)).astype(x0.dtype)
    dzp = (dmp_ref[0, 0] * inv * mp.astype(inv.dtype)).astype(x0.dtype)

    # dx[d] = dz[d+1] @ W0^T + dz[d] @ W1^T + dz[d-1] @ W2^T
    wt = jnp.swapaxes(w, 1, 2)                       # (3, F, C)
    dx = _dot(dz0, wt[1]) + _dot(dzp, wt[0]) + _dot(dzm, wt[2])
    dx_ref[0, 0] = dx.astype(dx_ref.dtype)

    # dW_t = sum_d x[d+t-1]^T dz[d] = sum_e x[e]^T dz[e-t+1]: one x row
    def cross(a, b):                                 # (nb,C)^T (nb,F)
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    dw_ref[0] += cross(x0, dzp)
    dw_ref[1] += cross(x0, dz0)
    dw_ref[2] += cross(x0, dzm)

    # BN coefficient grads need the conv output z: recompute from the
    # already-loaded x rows (3 cheap matmuls; avoids saving z or dividing
    # by inv, which would be ill-defined at inv == 0)
    z = _dot(x0, w[1])
    z = z + mm * _dot(xm_ref[0, 0], w[0])
    z = z + mp * _dot(xp_ref[0, 0], w[2])
    dm0 = dm0_ref[0, 0].astype(jnp.float32)
    dco_ref[0] += jnp.sum(dm0 * z, axis=0)
    dco_ref[1] += jnp.sum(dm0, axis=0)


def _row_specs(nb, ch, nd):
    """x row-blocks d-1 / d / d+1 (clamped) for grid (B, N/nb, D)."""
    return [
        pl.BlockSpec((1, 1, nb, ch),
                     lambda i, j, d: (i, jnp.maximum(d - 1, 0), j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nb, ch), lambda i, j, d: (i, d, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nb, ch),
                     lambda i, j, d: (i, jnp.minimum(d + 1, nd - 1), j, 0),
                     memory_space=pltpu.VMEM),
    ]


def _small_specs(c, f):
    return [
        pl.BlockSpec((3, c, f), lambda i, j, d: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, f), lambda i, j, d: (0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _pallas_fwd(x4, w, coeffs, relu, nb):
    b, d, n, c = x4.shape
    f = w.shape[-1]
    out_spec = pl.BlockSpec((1, 1, nb, f), lambda i, j, dd: (i, dd, j, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, relu=relu, nd=d),
        grid=(b, n // nb, d),
        in_specs=_row_specs(nb, c, d) + _small_specs(c, f),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, d, n, f), x4.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * b * d * n * c * f,
            bytes_accessed=(3 * x4.size + b * d * n * f) * x4.dtype.itemsize,
            transcendentals=0),
        interpret=_FORCE_INTERPRET,
    )(x4, x4, x4, w, coeffs)


def _pallas_bwd(x4, w, coeffs, dm, nb):
    b, d, n, c = x4.shape
    f = w.shape[-1]
    dx_spec = pl.BlockSpec((1, 1, nb, c), lambda i, j, dd: (i, dd, j, 0),
                           memory_space=pltpu.VMEM)
    small = _small_specs(c, f)
    dx, dw, dco = pl.pallas_call(
        functools.partial(_bwd_kernel, nd=d),
        grid=(b, n // nb, d),
        in_specs=_row_specs(nb, c, d) + _row_specs(nb, f, d) + small,
        out_specs=[dx_spec] + small,
        out_shape=[
            jax.ShapeDtypeStruct((b, d, n, c), x4.dtype),
            jax.ShapeDtypeStruct((3, c, f), jnp.float32),
            jax.ShapeDtypeStruct((2, f), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * d * n * c * f,
            bytes_accessed=(4 * x4.size + 4 * b * d * n * f)
            * x4.dtype.itemsize,
            transcendentals=0),
        interpret=_FORCE_INTERPRET,
    )(x4, x4, x4, dm, dm, dm, w, coeffs)
    return dx, dw, dco


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _depth_tap_conv4(x4, w, coeffs, relu, nb):
    return _pallas_fwd(x4, w, coeffs, relu, nb)


def _fwd_rule(x4, w, coeffs, relu, nb):
    y = _pallas_fwd(x4, w, coeffs, relu, nb)
    return y, (x4, w, coeffs, y)


def _bwd_rule(relu, nb, res, dy):
    x4, w, coeffs, y = res
    # mask the output gradient through the ReLU in one fused XLA pass so
    # the kernel's shifted refs see a single tensor
    dm = jnp.where(y > 0, dy, 0).astype(x4.dtype) if relu \
        else dy.astype(x4.dtype)
    dx, dw, dco = _pallas_bwd(x4, w, coeffs, dm, nb)
    return dx, dw.astype(w.dtype), dco.astype(coeffs.dtype)


_depth_tap_conv4.defvjp(_fwd_rule, _bwd_rule)


def reference_depth_tap_conv(x5, w, inv, b, relu=True):
    """Pure-XLA reference of the fused op (same math, any backend): 3-tap
    conv over D of (B, D, H, W, C) + affine + optional ReLU."""
    d = x5.shape[1]
    wd = w.astype(x5.dtype)
    z = jnp.einsum("bdhwc,cf->bdhwf", x5, wd[1],
                   preferred_element_type=jnp.float32)
    z = z.at[:, 1:].add(jnp.einsum("bdhwc,cf->bdhwf", x5[:, : d - 1], wd[0],
                                   preferred_element_type=jnp.float32))
    z = z.at[:, : d - 1].add(jnp.einsum("bdhwc,cf->bdhwf", x5[:, 1:], wd[2],
                                        preferred_element_type=jnp.float32))
    out = z * inv.astype(jnp.float32) + b.astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(x5.dtype)


def depth_tap_conv(x5, w, inv, b, relu: bool = True):
    """Fused depth-tap conv + affine + ReLU on (B, D, H, W, C).

    w: (3, C, F) — `nn.Conv(F, (3,))` kernel layout. inv/b: (F,) folded
    FrozenBatchNorm coefficients. Falls back to the XLA reference when no
    VMEM-fitting row block exists or off-TPU (unless interpreting).
    """
    bsz, d, h, wdim, c = x5.shape
    f = w.shape[-1]
    n = h * wdim
    nb = pick_nb(n, c, f, itemsize=x5.dtype.itemsize)
    on_tpu = jax.default_backend() == "tpu" or _FORCE_INTERPRET
    if nb is None or not on_tpu or d < 2:
        return reference_depth_tap_conv(x5, w, inv, b, relu)
    x4 = x5.reshape(bsz, d, n, c)
    wc = w.astype(x5.dtype)
    coeffs = jnp.stack([inv, b]).astype(x5.dtype)    # (2, F)
    y = _depth_tap_conv4(x4, wc, coeffs, relu, nb)
    return y.reshape(bsz, d, h, wdim, f)
