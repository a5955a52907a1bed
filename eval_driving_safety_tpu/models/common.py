"""Shared NN building blocks (Flax linen, NHWC, TPU-friendly dtypes)."""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """Inference-style BatchNorm: y = (x - mean) / sqrt(var + eps) * scale + bias.

    The reference runs all detector BN layers in eval mode (models are
    attacked, never trained — `model.eval()` at
    /root/reference/attack/DSGN/pgd_attack.py:140), so running statistics are
    plain parameters here. Classifier training freezes backbones too
    (/root/reference/driving_constraint/Model.py:19-27).
    """
    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = (scale * jnp.reciprocal(jnp.sqrt(var + self.eps))).astype(self.dtype)
        b = (bias - mean * scale * jnp.reciprocal(jnp.sqrt(var + self.eps))).astype(self.dtype)
        return x * inv + b


def conv(features: int, kernel: int = 3, stride: int = 1, dilation: int = 1,
         use_bias: bool = False, dtype=jnp.float32, name: Optional[str] = None):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   kernel_dilation=(dilation, dilation),
                   padding=[(dilation * (kernel // 2),) * 2] * 2,
                   use_bias=use_bias, dtype=dtype, name=name)


def conv3d(features: int, kernel: int = 3, stride: int = 1,
           use_bias: bool = False, dtype=jnp.float32, name: Optional[str] = None):
    return nn.Conv(features, (kernel, kernel, kernel),
                   strides=(stride, stride, stride),
                   padding=[(kernel // 2,) * 2] * 3,
                   use_bias=use_bias, dtype=dtype, name=name)


class ConvBnRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = conv(self.features, self.kernel, self.stride, self.dilation,
                 dtype=self.dtype)(x)
        x = FrozenBatchNorm(self.features, dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


class ConvBnRelu3D(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = conv3d(self.features, self.kernel, self.stride, dtype=self.dtype)(x)
        x = FrozenBatchNorm(self.features, dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


def cast_matmul_params(variables, dtype=jnp.bfloat16):
    """Pre-cast every >=2-D float32 kernel in `variables['params']` to
    `dtype` for bf16-trunk attack/bench loops.

    Flax modules with `dtype=bf16` cast their kernels at every use, and XLA
    emits a SEPARATE f32->bf16 convert for the forward and backward matmul
    of each layer — each one re-reading the full f32 kernel from HBM
    (measured: the 103 MB Stereo R-CNN fc1 kernel alone was converted twice
    per attack step). Casting once outside jit produces bit-identical math
    (same rounding, then the same bf16 matmuls) and halves the weight-read
    traffic. 1-D params (BN stats/scales, biases) stay f32, so folded-BN
    arithmetic keeps full precision; non-`params` collections (e.g. anchor
    tables used by fp32 decode) are untouched."""
    import jax

    def cast(p):
        if getattr(p, "ndim", 0) >= 2 and p.dtype == jnp.float32:
            return p.astype(dtype)
        return p

    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(cast, variables["params"])
    return out


def upsample_bilinear(x, out_h: int, out_w: int):
    """Bilinear resize (align_corners=False), matching the reference's
    `F.interpolate(..., mode='bilinear', align_corners=False)`
    (/root/reference/attack/Stereo-RCNN/stereo_rcnn.py:108)."""
    import jax
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, out_h, out_w, c), method="linear")


def upsample_trilinear(x, out_d: int, out_h: int, out_w: int):
    import jax
    n, d, h, w, c = x.shape
    return jax.image.resize(x, (n, out_d, out_h, out_w, c), method="linear")


def max_pool(x, window: int, stride: int, padding="SAME"):
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=padding)
