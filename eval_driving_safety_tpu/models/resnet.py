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

import jax.numpy as jnp
from flax import linen as nn

from eval_driving_safety_tpu.models.common import FrozenBatchNorm, conv


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

    @nn.compact
    def __call__(self, x):
        # stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool
        y = nn.Conv(self.width, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
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
