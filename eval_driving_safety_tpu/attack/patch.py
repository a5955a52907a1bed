"""Universal circular adversarial-patch engine.

Capability parity: the reference's patch attacks
(/root/reference/attack/DSGN/patch_attack.py:211-254,367-430 and
/root/reference/attack/Stereo-RCNN/patch_attack.py:58-112,268-281):
* circular patch, diameter = short-side * ratio (made odd);
* random center: row in [0.4*H, H-r-1], col in [0.2*W, 0.8*W];
* right-image center shifted by the stereo disparity offset -40*1.6 = -64 px;
* composite img = (1-mask)*img + mask*patch;
* update patch <- patch - clamp(0.5*alpha*(gradL+gradR), -eps, eps);
* patch persisted as npy with the reference's (1, 3, d, d) layout so patches
  are interchangeable between frameworks.

TPU-first design: compositing is a static-size `dynamic_update_slice`
(differentiable, jit-safe) rather than full-image masks; the patch gradient
over a *sharded batch* is produced by autodiff of the batched composite —
on a mesh this is the psum-reduced all-reduce the reference approximates by
sequential per-image accumulation (SURVEY.md §2.3).
"""
from __future__ import annotations

import os
from functools import lru_cache
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def patch_dim_for(short_side: int, ratio: float) -> int:
    """Diameter = short_side * ratio, forced odd
    (/root/reference/attack/DSGN/patch_attack.py:212-216)."""
    d = int(short_side * ratio)
    return d + 1 if d % 2 == 0 else d


@lru_cache(maxsize=8)
def _mask_np(dim: int) -> np.ndarray:
    r = dim // 2
    yy, xx = np.mgrid[:dim, :dim]
    return ((yy - r) ** 2 + (xx - r) ** 2 <= r * r).astype(np.float32)[..., None]


def circular_mask(dim: int) -> jnp.ndarray:
    """(dim, dim, 1) float mask of the inscribed circle."""
    return jnp.asarray(_mask_np(dim))


def sample_patch_centers(rng, batch: int, height: int, width: int, radius: int,
                         *, row_band=(0.4, 1.0), col_band=(0.2, 0.8),
                         disparity_shift: float = -64.0):
    """Per-image (row, col) centers for left view + shifted right view.

    Exact reference distribution
    (/root/reference/attack/DSGN/patch_attack.py:237-243):
    row ~ randint[int(H*0.4), H-radius-1] and col ~ randint[int(W*lo),
    int(W*hi)], both INCLUSIVE of the upper bound (Python random.randint
    semantics), with NO in-bounds clamping — for large ratios the circle
    may clip the top edge, and the right-view center (col + shift) may
    push the patch past the left edge; `composite_patch` clips the mask at
    the border exactly as the reference's full-image distance masks do.
    """
    kr, kc = jax.random.split(rng)
    row_lo = int(height * row_band[0])
    row_hi = height - radius - 1                      # inclusive
    rows = jax.random.randint(kr, (batch,), row_lo,
                              max(row_hi, row_lo) + 1)
    col_lo = int(width * col_band[0])
    col_hi = int(width * col_band[1])                 # inclusive
    cols = jax.random.randint(kc, (batch,), col_lo,
                              max(col_hi, col_lo) + 1)
    cols_r = cols + int(disparity_shift)
    return jnp.stack([rows, cols], -1), jnp.stack([rows, cols_r], -1)


def composite_patch(img, patch, center):
    """Composite one (d,d,3) patch into one (H,W,3) image at (row,col).

    Differentiable w.r.t. both image and patch. Placements whose window
    crosses an image border are CLIPPED at the border (the part of the
    circle outside the image is dropped), matching the reference's
    full-image distance-transform masks
    (/root/reference/attack/DSGN/patch_attack.py:245-254). Implemented as
    pad-by-radius -> static-size dynamic_update_slice -> crop, so the
    composite stays jit-friendly with static shapes.
    """
    d = patch.shape[0]
    r = d // 2
    c = img.shape[-1]
    h, w = img.shape[0], img.shape[1]
    mask = circular_mask(d).astype(img.dtype)
    # Pad by 2r so every PARTIALLY-visible center (in [-r, size-1+r]) maps to
    # a non-negative window start `center + r` — lax.dynamic_slice treats
    # negative starts as counting from the end (numpy semantics), which would
    # wrap a left-clipped right-view patch onto the RIGHT edge. Centers fully
    # off-image are handled by zeroing the mask instead of relying on start
    # clamping (clamping would smear the circle's rim onto the border).
    padded = jnp.pad(img, ((2 * r, 2 * r), (2 * r, 2 * r), (0, 0)))
    y0 = jnp.clip(center[0] + r, 0, h + 2 * r - 1)
    x0 = jnp.clip(center[1] + r, 0, w + 2 * r - 1)
    visible = ((center[0] >= -r) & (center[0] <= h - 1 + r)
               & (center[1] >= -r) & (center[1] <= w - 1 + r))
    mask = mask * visible.astype(img.dtype)
    window = jax.lax.dynamic_slice(padded, (y0, x0, 0), (d, d, c))
    merged = (1.0 - mask) * window + mask * patch.astype(img.dtype)
    padded = jax.lax.dynamic_update_slice(padded, merged, (y0, x0, 0))
    return padded[2 * r:2 * r + h, 2 * r:2 * r + w]


def composite_patch_batch(imgs, patch, centers):
    """(B,H,W,3) x (d,d,3) x (B,2) -> (B,H,W,3)."""
    return jax.vmap(composite_patch, in_axes=(0, None, 0))(imgs, patch, centers)


def patch_update_step(loss_fn: Callable, patch, imgs_left, imgs_right,
                      centers_left, centers_right, *, alpha: float,
                      eps: float, pixel_min=None, pixel_max=None):
    """One universal-patch descent step over a batch.

    loss_fn(imL, imR) -> scalar (the detector's total training loss; the
    patch *descends* it toward the targeted ghost-car labels). Returns
    (new_patch, loss). Gradient restriction to patch pixels falls out of
    autodiff through the composite; summation over the batch is the
    all-reduce of the per-image gradients.
    """
    def f(p):
        il = composite_patch_batch(imgs_left, p, centers_left)
        ir = composite_patch_batch(imgs_right, p, centers_right)
        return loss_fn(il, ir)

    loss, g = jax.value_and_grad(f)(patch)
    step = jnp.clip(0.5 * alpha * g, -eps, eps)
    new_patch = patch - step
    if pixel_min is not None:
        new_patch = jnp.clip(new_patch,
                             jnp.asarray(pixel_min, new_patch.dtype),
                             jnp.asarray(pixel_max, new_patch.dtype))
    return new_patch, loss


# ---------------------------------------------------------------------------
# npy persistence — reference-compatible (1, 3, d, d) layout
# (/root/reference/attack/DSGN/patch_attack.py:220-232,437-443)
# ---------------------------------------------------------------------------

def init_patch(short_side: int, ratio: float, save_dir: str = None):
    """Fresh zero patch (or resume from `save_dir/epoch0/patch.npy`).

    Returns (dim, radius, patch (d,d,3) float32).
    """
    dim = patch_dim_for(short_side, ratio)
    if save_dir is not None:
        p0 = os.path.join(save_dir, "epoch0", "patch.npy")
        if os.path.exists(p0):
            return dim, dim // 2, load_patch(p0, resize_to=dim)
        os.makedirs(os.path.dirname(p0), exist_ok=True)
        np.save(p0, np.zeros((1, 3, dim, dim), np.float32))
    return dim, dim // 2, jnp.zeros((dim, dim, 3), jnp.float32)


def save_patch(path: str, patch) -> None:
    """(d,d,3) -> npy in the reference's (1,3,d,d) layout."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.asarray(patch).transpose(2, 0, 1)[None]
    np.save(path, arr.astype(np.float32))


def load_patch(path: str, resize_to: int = None) -> jnp.ndarray:
    """npy (1,3,d,d) -> (d,d,3); optional bilinear resize matching the
    reference's cross-detector ingest `cv2.resize(..., INTER_LINEAR)`
    (/root/reference/attack/DSGN/patch_attack.py:220-227): half-pixel
    centers, NO antialiasing — cv2's INTER_LINEAR never antialiases, so
    `antialias=False` is required for downscales to agree (upscales agree
    either way). Asserted vs an independent numpy oracle in
    tests/test_attack.py::test_load_patch_resize_matches_cv2_semantics."""
    arr = np.load(path)[0].transpose(1, 2, 0)
    if resize_to is not None and arr.shape[0] != resize_to:
        x = jax.image.resize(jnp.asarray(arr),
                             (resize_to, resize_to, arr.shape[-1]),
                             "linear", antialias=False)
        return x
    return jnp.asarray(arr)
