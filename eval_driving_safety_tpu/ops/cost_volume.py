"""Stereo cost-volume ops: plane-sweep volume (PSV) and 3D geometric volume
(3DGV) resampling, plus soft-argmin depth regression.

Capability parity: DSGN's PSV + 3DGV construction — the gather-heavy core of
`StereoNet.forward` invoked at /root/reference/attack/DSGN/pgd_attack.py:308
(upstream dsgn.models, not vendored; see SURVEY.md §2.2).

TPU-first design:
* PSV warp = per-depth-plane sub-pixel shift of right features along W,
  expressed as two static gathers + lerp (XLA fuses this into one
  vectorized gather; the D axis is a plain batch axis for the MXU convs
  that follow).
* 3DGV = trilinear gather from the frustum volume (D, H, W) into a regular
  camera-frame voxel grid (Z, Y, X) using per-image calibration, all inside
  jit with static shapes.
* Everything is differentiable — attack gradients flow from 3D losses back
  through both volumes to the input pixels.

All volumes are channel-last: PSV (B, D, H, W, C), voxels (B, Z, Y, X, C),
BEV (B, Z, X, C').
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def depth_planes(min_depth: float, max_depth: float, num: int) -> jnp.ndarray:
    """Plane depths, uniform in depth (DSGN's depth-wise cost volume)."""
    return jnp.linspace(min_depth, max_depth, num)


def shift_along_width(feat, disp):
    """Sample `feat` (H, W, C) at x - disp (disp scalar, sub-pixel, zeros
    outside). The 1D-lerp building block of the PSV warp."""
    h, w, c = feat.shape
    xs = jnp.arange(w, dtype=disp.dtype) - disp
    x0 = jnp.floor(xs)
    frac = xs - x0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    v0 = feat[:, x0i, :]
    v1 = feat[:, x1i, :]
    out = v0 * (1.0 - frac)[None, :, None] + v1 * frac[None, :, None]
    valid = (xs >= 0.0) & (xs <= w - 1.0)
    return out * valid[None, :, None]


def _tent_weights(dst_coords, src_len: int, dtype=jnp.float32):
    """Linear-interpolation weight matrix W[i, j] = tent(src_j - coord_i),
    zero outside [0, src_len-1] — the matmul form of a 1D lerp gather.

    dst_coords: (..., N) float source coordinates for each output index.
    Returns (..., N, src_len).
    """
    src = jnp.arange(src_len, dtype=dst_coords.dtype)
    diff = src - dst_coords[..., None]                   # (..., N, src_len)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(diff))
    valid = ((dst_coords >= 0.0)
             & (dst_coords <= src_len - 1.0))[..., None]
    return (w * valid).astype(dtype)


def build_psv(feat_left, feat_right, f_u, baseline, planes, stride: int):
    """Plane-sweep volume by concatenation.

    feat_left/right: (B, H, W, C) stride-`stride` features.
    f_u, baseline: (B,) per-image calibration.
    planes: (D,) plane depths in meters.
    Returns (B, D, H, W, 2C): left features tiled over D, right features
    warped by each plane's disparity (in feature pixels: f*b/z/stride).

    TPU note: the warp is expressed as a per-plane (W, W) interpolation
    matrix contracted on the MXU (gathers don't tile onto TPU hardware;
    their backward would be a scatter). Numerically identical to the lerp
    gather (`shift_along_width`) with zero out-of-range semantics.
    """
    d = planes.shape[0]
    w = feat_right.shape[2]

    def per_image(fl, fr, fu, bl):
        # coordinates/weights in fp32: bf16 has a 2-px ulp beyond column
        # 256, which would quantize sub-pixel shifts over the right part of
        # the row; only the final weight matrix is cast for the MXU
        disps = (fu * bl / planes / stride).astype(jnp.float32)   # (D,)
        coords = jnp.arange(w, dtype=jnp.float32) - disps[:, None]  # (D, W)
        wm = _tent_weights(coords, w, dtype=fl.dtype)            # (D, W, W)
        warped = jnp.einsum("dxw,hwc->dhxc", wm, fr,
                            preferred_element_type=fl.dtype)
        tiled = jnp.broadcast_to(fl[None], (d,) + fl.shape)
        return jnp.concatenate([tiled, warped], axis=-1)

    return jax.vmap(per_image)(feat_left, feat_right, f_u, baseline)


def soft_argmin_depth(cost, planes):
    """Soft-argmin depth regression.

    cost: (B, D, H, W) matching score per plane (higher = better).
    Returns (B, H, W) expected depth = sum_d softmax(cost)_d * z_d.
    """
    prob = jax.nn.softmax(cost, axis=1)
    return jnp.einsum("bdhw,d->bhw", prob, planes)


def voxel_centers(cfg) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Regular camera-frame voxel grid centers (z, y, x) for the 3DGV.

    Camera frame: x right, y down, z forward (KITTI rect convention).
    """
    xs = jnp.linspace(cfg.voxel_x_min, cfg.voxel_x_max, cfg.num_voxels_x)
    ys = jnp.linspace(cfg.voxel_y_min, cfg.voxel_y_max, cfg.num_voxels_y)
    zs = jnp.linspace(cfg.voxel_z_min, cfg.voxel_z_max, cfg.num_voxels_z)
    return zs, ys, xs


def _trilinear_gather(vol, zi, yi, xi):
    """vol (D, H, W, C); zi/yi/xi float coords of shape S -> (S..., C).

    Out-of-range coordinates return zeros.
    """
    d, h, w, c = vol.shape
    valid = ((zi >= 0) & (zi <= d - 1) & (yi >= 0) & (yi <= h - 1)
             & (xi >= 0) & (xi <= w - 1))
    zi = jnp.clip(zi, 0.0, d - 1.0)
    yi = jnp.clip(yi, 0.0, h - 1.0)
    xi = jnp.clip(xi, 0.0, w - 1.0)
    z0 = jnp.floor(zi); y0 = jnp.floor(yi); x0 = jnp.floor(xi)
    fz = zi - z0; fy = yi - y0; fx = xi - x0
    z0 = z0.astype(jnp.int32); y0 = y0.astype(jnp.int32); x0 = x0.astype(jnp.int32)
    z1 = jnp.minimum(z0 + 1, d - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    def g(zz, yy, xx):
        return vol[zz, yy, xx]

    out = (
        g(z0, y0, x0) * ((1 - fz) * (1 - fy) * (1 - fx))[..., None]
        + g(z0, y0, x1) * ((1 - fz) * (1 - fy) * fx)[..., None]
        + g(z0, y1, x0) * ((1 - fz) * fy * (1 - fx))[..., None]
        + g(z0, y1, x1) * ((1 - fz) * fy * fx)[..., None]
        + g(z1, y0, x0) * (fz * (1 - fy) * (1 - fx))[..., None]
        + g(z1, y0, x1) * (fz * (1 - fy) * fx)[..., None]
        + g(z1, y1, x0) * (fz * fy * (1 - fx))[..., None]
        + g(z1, y1, x1) * (fz * fy * fx)[..., None]
    )
    return out * valid[..., None]


def psv_to_3dgv(psv_feat, planes, calib_fu, calib_cu, calib_cv, cfg,
                stride: int, method: str = "einsum"):
    """Resample frustum features (B, D, Hf, Wf, C) into a regular voxel grid
    (B, Z, Y, X, C) using pinhole projection per image.

    For voxel center (x, y, z): u = f*x/z + cu, v = f*y/z + cv (full-res
    pixels -> /stride for feature coords); depth coordinate = fractional
    plane index of z (planes uniform in depth).

    TPU note (`method="einsum"`, default): because the voxel grid is
    axis-aligned, the trilinear resample is *separable* — for a fixed
    voxel-z slice, the plane index is a constant and u(x)/v(y) are 1D maps.
    The whole gather therefore factors into a per-slice depth lerp plus two
    small interpolation matmuls contracted on the MXU:
        mid[z]  = lerp(vol[d0(z)], vol[d0(z)+1])          (static indices)
        out[z]  = Wv(z) @ mid[z] @ Wu(z)^T                 (MXU)
    This (and its transpose in the backward pass) replaces a gather/scatter
    pair that does not tile onto TPU hardware. `method="gather"` keeps the
    reference-style trilinear gather for verification.
    """
    import numpy as np
    d = planes.shape[0]
    # static grids/indices in host numpy — under jit, jnp constants are
    # tracers and can't feed static take indices
    zs_np = np.linspace(cfg.voxel_z_min, cfg.voxel_z_max, cfg.num_voxels_z)
    ys_np = np.linspace(cfg.voxel_y_min, cfg.voxel_y_max, cfg.num_voxels_y)
    xs_np = np.linspace(cfg.voxel_x_min, cfg.voxel_x_max, cfg.num_voxels_x)
    z0 = float(cfg.min_depth)
    dz = (float(cfg.max_depth) - float(cfg.min_depth)) / (d - 1)

    if method == "gather":
        zz, yy, xx = jnp.meshgrid(jnp.asarray(zs_np), jnp.asarray(ys_np),
                                  jnp.asarray(xs_np), indexing="ij")

        def per_image_g(vol, fu, cu, cv):
            u = (fu * xx / zz + cu) / stride
            v = (fu * yy / zz + cv) / stride
            di = (zz - z0) / dz
            return _trilinear_gather(vol, di, v, u)

        return jax.vmap(per_image_g)(psv_feat, calib_fu, calib_cu, calib_cv)

    # --- separable einsum path -------------------------------------------
    di = (zs_np - z0) / dz                               # static (Z,)
    zs = jnp.asarray(zs_np, jnp.float32)
    ys = jnp.asarray(ys_np, jnp.float32)
    xs = jnp.asarray(xs_np, jnp.float32)

    def per_image(vol, fu, cu, cv):
        dtype = vol.dtype
        # depth lerp as a (Z, D) tent-weight contraction: a static-index
        # take would be cheap forward but its BACKWARD is a scatter-add
        # over repeated plane indices — measured ~70 ms of the paper-scale
        # attack step; the matmul form runs both directions on the MXU
        wd = _tent_weights(jnp.asarray(di, jnp.float32), d, dtype=dtype)
        mid = jnp.einsum("zd,dhwc->zhwc", wd, vol,
                         preferred_element_type=dtype)  # (Z, H, W, C)
        # per-slice separable row/col interpolation matrices
        v = (fu * ys[None, :] / zs[:, None] + cv) / stride   # (Z, Y)
        u = (fu * xs[None, :] / zs[:, None] + cu) / stride   # (Z, X)
        wv = _tent_weights(v, vol.shape[1], dtype=dtype)     # (Z, Y, H)
        wu = _tent_weights(u, vol.shape[2], dtype=dtype)     # (Z, X, W)
        rows = jnp.einsum("zyh,zhwc->zywc", wv, mid,
                          preferred_element_type=dtype)
        return jnp.einsum("zxw,zywc->zyxc", wu, rows,
                          preferred_element_type=dtype)

    return jax.vmap(per_image)(psv_feat, calib_fu, calib_cu, calib_cv)
