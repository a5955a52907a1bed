"""VGG-16 feature extractor (Flax, NHWC) for the dynamic-vehicle classifier.

Capability parity: torchvision vgg16 `.features` used frozen in
/root/reference/dynamic_vehicles/Model.py:19-31 (custom classifier
25088 -> 4096 -> 1 with dropout + sigmoid).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from eval_driving_safety_tpu.models.common import max_pool

VGG16_LAYOUT = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class VGG16Features(nn.Module):
    """Conv features; 224x224 input -> (7, 7, 512)."""
    dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for stage, (ch, n) in enumerate(VGG16_LAYOUT):
            for i in range(n):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv{stage + 1}_{i + 1}")(x)
                x = nn.relu(x)
            x = max_pool(x, 2, 2, padding="VALID")
        return x
