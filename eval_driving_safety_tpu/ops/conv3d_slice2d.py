"""Dense 3x3x3 convolution as three depth-sliced 2D convolutions.

The checkpoint-compat DSGN assembly (models/dsgn_compat.py) must keep the
upstream full-3D-conv topology so the published `.tar` weights map 1:1
(/root/reference/attack/DSGN/pgd_attack.py:142-145). But XLA's TPU lowering
of small-channel Conv3D is the measured bottleneck of that assembly (the
factorized fast model runs the same volumes ~2.6x faster per conv,
PARITY.md): the MXU tiles 2D convolutions well and 3D ones poorly.

This op computes the IDENTICAL function with the IDENTICAL parameter
tensor — `nn.Conv(F, (3, 3, 3))`'s kernel (3, 3, 3, C, F) — by decomposing
over the depth taps:

    y[:, d] = sum_t conv2d(x[:, s*d + t - 1], kernel[t])      t in {0,1,2}

i.e. three dense 3x3 2D convolutions (depth folded into batch — the same
well-tiled shape as the fast model's (2+1)D spatial stage), each on a
depth-shifted view of the zero-padded volume, summed. Stride s in {1, 2}
applies to all three dims like the upstream convbn_3d; the depth shifts
become static strided slices of the padded volume, so both directions of
the op are slice/pad + conv2d — no gather, no scatter, no layout copies.

Weight compatibility is by construction: the kernel is consumed in
`nn.Conv`'s own layout, so `conv3d_method="slice2d"` and `"xla"` are
checkpoint-interchangeable (asserted in tests/test_dsgn_compat.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def conv3d_slice2d(x, kernel, stride: int = 1):
    """3x3x3 'SAME'-padded (pad=1) conv via three 2D convs over depth taps.

    x: (B, D, H, W, C); kernel: (3, 3, 3, C, F) in `nn.Conv` layout.
    stride: 1 or 2, applied to (D, H, W) alike. D must be even for
    stride 2 (the upstream volumes are). Returns (B, D', H', W', F) with
    the exact numerics of `nn.Conv(F, (3,3,3), strides=(s,s,s),
    padding=[(1,1)]*3, use_bias=False)` in `x.dtype` compute.
    """
    b, d, h, w, c = x.shape
    f = kernel.shape[-1]
    kernel = kernel.astype(x.dtype)
    d_out = (d + 2 * 1 - 3) // stride + 1
    # zero-pad depth once; each tap is then a static (strided) slice
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))

    dn = jax.lax.conv_dimension_numbers(
        (b * d_out, h, w, c), (3, 3, c, f), ("NHWC", "HWIO", "NHWC"))
    y = None
    for t in range(3):
        end = t + 1 + stride * (d_out - 1)
        xs = xp[:, t:end:stride] if stride > 1 else xp[:, t:end]
        xs = xs.reshape(b * d_out, h, w, c)
        ct = jax.lax.conv_general_dilated(
            xs, kernel[t], window_strides=(stride, stride),
            padding=((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=x.dtype)
        y = ct if y is None else y + ct
    h_out, w_out = y.shape[1], y.shape[2]
    return y.reshape(b, d_out, h_out, w_out, f)


def conv3d_tapconcat(x, kernel, stride: int = 1):
    """Same function/parameters as `conv3d_slice2d`, computed as ONE 2D
    conv over the depth-tap concatenation:

        y[:, d] = conv2d(concat_c(x[:, s*d-1], x[:, s*d], x[:, s*d+1]),
                         kernel reshaped to (3, 3, 3C, F))

    Trades one extra materialization (the (B, D', H, W, 3C) tap concat)
    for a conv whose input-channel (MXU K) dimension is 3C instead of C —
    at the compat assembly's C=32..64 widths that triples the systolic
    array's contraction-depth utilization. Numerics identical to the
    slice2d and XLA forms (asserted in tests/test_dsgn_compat.py)."""
    b, d, h, w, c = x.shape
    f = kernel.shape[-1]
    kernel = kernel.astype(x.dtype)
    d_out = (d + 2 * 1 - 3) // stride + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    taps = []
    for t in range(3):
        end = t + 1 + stride * (d_out - 1)
        taps.append(xp[:, t:end:stride] if stride > 1 else xp[:, t:end])
    xcat = jnp.concatenate(taps, axis=-1).reshape(b * d_out, h, w, 3 * c)
    # tap becomes the OUTER input-channel index, matching the concat order
    k2 = kernel.transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * c, f)
    dn = jax.lax.conv_dimension_numbers(
        (b * d_out, h, w, 3 * c), (3, 3, 3 * c, f), ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xcat, k2, window_strides=(stride, stride), padding=((1, 1), (1, 1)),
        dimension_numbers=dn, preferred_element_type=x.dtype)
    return y.reshape(b, d_out, y.shape[1], y.shape[2], f)


def conv3d_nstack(x, kernel, stride: int = 1):
    """Same function/parameters as `conv3d_slice2d`, computed as ONE 2D
    conv whose OUTPUT channels stack the three depth taps:

        p[e] = conv2d(x[e], kernel reshaped to (3, 3, C, 3F))   # (.., 3F)
        y[d] = p[s*d - 1][..., 0] + p[s*d][..., 1] + p[s*d + 1][..., 2]

    Why: at the compat assembly's widths (F = 32..64) the MXU pads the
    conv's N dimension to 128 lanes, so slice2d's three N=F convolutions
    each waste 50-75% of the systolic array's width; stacking the taps
    into N = 3F triples the utilization at identical FLOPs, turning the
    per-conv matmul core from N-padding-bound into near-full-width. The
    depth combination becomes three shifted slices + adds of the p
    tensor, which XLA fuses with the following BN/ReLU into one
    elementwise pass.

    Numerics are BIT-IDENTICAL to conv3d_slice2d: each p[..., t] is the
    same conv2d contraction (the N stacking never changes the K
    accumulation order) and the taps are added in the same t-ascending
    order (asserted in tests/test_dsgn_compat.py)."""
    b, d, h, w, c = x.shape
    f = kernel.shape[-1]
    kernel = kernel.astype(x.dtype)
    d_out = (d + 2 * 1 - 3) // stride + 1
    # one conv over ALL depth slices of the padded volume
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    dp = d + 2
    # depth tap t becomes the OUTER output-channel index: (3, 3, C, 3F)
    k2 = kernel.transpose(1, 2, 3, 0, 4).reshape(3, 3, c, 3 * f)
    dn = jax.lax.conv_dimension_numbers(
        (b * dp, h, w, c), (3, 3, c, 3 * f), ("NHWC", "HWIO", "NHWC"))
    p = jax.lax.conv_general_dilated(
        xp.reshape(b * dp, h, w, c), k2, window_strides=(stride, stride),
        padding=((1, 1), (1, 1)), dimension_numbers=dn,
        preferred_element_type=x.dtype)
    h_out, w_out = p.shape[1], p.shape[2]
    p = p.reshape(b, dp, h_out, w_out, 3, f)
    # y[d] = sum_t p[s*d + t] tap t   (xp is depth-padded, so the shifts
    # are in-bounds strided slices; same t-ascending add order as slice2d)
    end = stride * (d_out - 1) + 1
    y = p[:, 0:end:stride, :, :, 0]
    y = y + p[:, 1:end + 1:stride, :, :, 1]
    y = y + p[:, 2:end + 2:stride, :, :, 2]
    return y


def conv_transpose3d_depthpoly(x, kernel):
    """`nn.ConvTranspose(F, (3,3,3), strides=(2,2,2), padding=[(1,2)]*3)`
    (the compat hourglass's 2x-upsampling deconv, models/dsgn_compat.py
    CompatDeconvBn) via depth-polyphase decomposition.

    A stride-2 fractionally-strided correlation zero-dilates the input, so
    along depth each output parity only ever meets fixed kernel taps:

        y[:, 2m]     = ct2d(x[:, m],     kernel[1])
        y[:, 2m + 1] = ct2d(x[:, m],     kernel[0])
                     + ct2d(x[:, m + 1], kernel[2])     (zero past the end)

    i.e. three 2D transposed convolutions with depth folded into batch —
    no depth-wise zero-dilation ever materializes, and the interleave is a
    reshape. Spatial dims keep XLA's 2D transposed-conv lowering (the
    conv-backprop-input path it tiles well).

    x: (B, D, H, W, C); kernel: (3, 3, 3, C, F) in `nn.ConvTranspose`'s
    layout (consumed as-is — checkpoint-interchangeable with the flax op).
    Returns (B, 2D, 2H, 2W, F).
    """
    b, d, h, w, c = x.shape
    f = kernel.shape[-1]
    kernel = kernel.astype(x.dtype)
    xb = x.reshape(b * d, h, w, c)
    # x shifted one step forward in depth, zero after the last slice
    xs = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    xs = xs.reshape(b * d, h, w, c)

    dn = jax.lax.conv_dimension_numbers(
        (b * d, h, w, c), (3, 3, c, f), ("NHWC", "HWIO", "NHWC"))

    def ct2d(inp, k2):
        return jax.lax.conv_general_dilated(
            inp, k2, window_strides=(1, 1), padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2), dimension_numbers=dn,
            preferred_element_type=x.dtype)

    even = ct2d(xb, kernel[1])                       # (B*D, 2H, 2W, F)
    odd = ct2d(xb, kernel[0]) + ct2d(xs, kernel[2])
    y = jnp.stack([even, odd], axis=1)               # (B*D, 2, 2H, 2W, F)
    return y.reshape(b, 2 * d, 2 * h, 2 * w, f)
