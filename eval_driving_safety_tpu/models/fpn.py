"""Feature Pyramid Network head (Flax, NHWC).

Capability parity: the FPN top-down pathway inside Stereo R-CNN
(/root/reference/attack/Stereo-RCNN/stereo_rcnn.py:163-187): 1x1 lateral
convs, bilinear upsample-add (align_corners=False), 3x3 smoothing convs, and
p6 = stride-2 max-pool of p5.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from eval_driving_safety_tpu.models.common import upsample_bilinear


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c2, c3, c4, c5):
        lat = lambda name: nn.Conv(self.out_channels, (1, 1),
                                   dtype=self.dtype, name=name)
        smooth = lambda name: nn.Conv(self.out_channels, (3, 3), padding="SAME",
                                      dtype=self.dtype, name=name)
        p5 = lat("toplayer")(c5)
        p4 = upsample_bilinear(p5, c4.shape[1], c4.shape[2]) + \
            lat("latlayer1")(c4)
        p4 = smooth("smooth1")(p4)
        p3 = upsample_bilinear(p4, c3.shape[1], c3.shape[2]) + \
            lat("latlayer2")(c3)
        p3 = smooth("smooth2")(p3)
        p2 = upsample_bilinear(p3, c2.shape[1], c2.shape[2]) + \
            lat("latlayer3")(c2)
        p2 = smooth("smooth3")(p2)
        # p6: 1x1 max-pool stride 2 of p5 (reference uses MaxPool2d(1, stride=2))
        p6 = p5[:, ::2, ::2, :]
        return p2, p3, p4, p5, p6
