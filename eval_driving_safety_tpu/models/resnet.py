"""ResNet backbones (Flax, NHWC) for Stereo R-CNN (101) and the road-type
classifier (50).

Capability parity targets:
* Stereo R-CNN siamese ResNet-101 bottom-up stages
  (/root/reference/attack/Stereo-RCNN/stereo_rcnn.py:155-178)
* torchvision resnet50 backbone of the road-type classifier
  (/root/reference/driving_constraint/Model.py:19-27)

BN is frozen (inference affine) — see models.common.FrozenBatchNorm.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eval_driving_safety_tpu.models.common import FrozenBatchNorm, conv


class _StemKernel(nn.Module):
    """Parameter holder matching ``nn.Conv(width, (7, 7), use_bias=False,
    name="stem_conv")`` — keeps the space-to-depth stem checkpoint-
    compatible with the plain conv stem (same "stem_conv/kernel" path and
    (7, 7, C, width) shape, so torch imports and orbax checkpoints are
    interchangeable between the two formulations)."""
    width: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.linear.default_kernel_init,
                          (7, 7, self.in_features, self.width))


def stem_space_to_depth(x, kernel, dtype):
    """The ResNet 7x7/stride-2 stem conv, reformulated exactly as a 4x4
    stride-1 conv on the space-to-depth input.

    A stride-2 conv with C_in=3 tiles terribly on the MXU (3 input channels
    against 128 lanes, and half the loaded pixels are discarded by the
    stride). Folding each 2x2 pixel block into channels gives a dense
    stride-1 conv with 4*C_in input channels over a half-resolution image —
    the standard TPU ResNet stem transform. Numerically EXACT for even
    H, W (asserted in tests/test_stereo_rcnn.py):

        out[i, j] = sum_{a,b} x[2i + a - 3, 2j + b - 3] * k[a, b]

    Pad k 7->8 with a leading zero row/col so taps index x[2i + a' - 4],
    a' = 2*a_s2d + parity — then (a_s2d, parity) separate into the 4-tap
    spatial axis and the folded channel axis. Zero-padding semantics match:
    the extra padded row (-4) is only touched by the zeroed kernel row.
    """
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))      # (8, 8, C, F)
    k = k.reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
    k = k.reshape(4, 4, 4 * c, f).astype(dtype)
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    return jax.lax.conv_general_dilated(
        xs.astype(dtype), k, window_strides=(1, 1),
        padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Bottleneck(nn.Module):
    features: int   # bottleneck width; output = 4x
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * 4
        residual = x
        y = conv(self.features, 1, 1, dtype=self.dtype)(x)
        y = FrozenBatchNorm(self.features, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = conv(self.features, 3, self.stride, dtype=self.dtype)(y)
        y = FrozenBatchNorm(self.features, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = conv(out_ch, 1, 1, dtype=self.dtype)(y)
        y = FrozenBatchNorm(out_ch, dtype=self.dtype)(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = conv(out_ch, 1, self.stride, dtype=self.dtype,
                            name="downsample_conv")(x)
            residual = FrozenBatchNorm(out_ch, dtype=self.dtype,
                                       name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Returns (c2, c3, c4, c5) pyramid features at strides 4/8/16/32."""
    block_counts: Tuple[int, ...] = (3, 4, 23, 3)  # resnet101
    width: int = 64
    dtype: Any = jnp.float32
    stem_method: str = "conv7"   # "s2d": exact space-to-depth reformulation

    @nn.compact
    def __call__(self, x):
        # stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool
        if self.stem_method == "s2d" and x.shape[1] % 2 == 0 \
                and x.shape[2] % 2 == 0:
            kernel = _StemKernel(self.width, x.shape[-1],
                                 name="stem_conv")()
            y = stem_space_to_depth(x, kernel, self.dtype)
        else:
            y = nn.Conv(self.width, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        dtype=self.dtype, name="stem_conv")(x)
        y = FrozenBatchNorm(self.width, dtype=self.dtype, name="stem_bn")(y)
        y = nn.relu(y)
        # explicit (1,1) padding matches torch MaxPool2d(3, 2, 1) alignment
        # (SAME pads asymmetrically and shifts the grid)
        y = nn.max_pool(y, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        feats = []
        for stage, n_blocks in enumerate(self.block_counts):
            features = self.width * (2 ** stage)
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                y = Bottleneck(features, stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_block{b}")(y)
            feats.append(y)
        return tuple(feats)  # c2..c5 with 256/512/1024/2048 channels


def resnet50(**kw) -> ResNet:
    return ResNet(block_counts=(3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(block_counts=(3, 4, 23, 3), **kw)
