"""Model-agnostic PGD (iterated FGSM, L-inf) attack engine.

Capability parity: the per-image PGD loops of the reference
(/root/reference/attack/DSGN/pgd_attack.py:300-354 — ascent on the total
loss, grad-sign step, eps-ball projection vs the clean image, pixel-range
clamp; /root/reference/attack/Stereo-RCNN/pgd_attack.py:165-217 — same in
BGR-mean-subtracted space with per-channel clamps).

TPU-first design: the whole iteration loop is ONE jitted `lax.scan` over a
*batch* of stereo pairs; sharding the batch axis over a mesh makes the sweep
embarrassingly parallel (SURVEY.md §2.3). The loss function is a closure
`loss_fn(im_left, im_right) -> scalar` that must already include any
normalization — the engine operates purely in "attack space" (the space in
which eps-balls and pixel bounds are defined: [0,1] RGB for DSGN,
mean-subtracted BGR pixels for Stereo R-CNN).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class PGDResult(NamedTuple):
    adv_left: jnp.ndarray    # (B, H, W, 3) final attacked pair
    adv_right: jnp.ndarray
    losses: jnp.ndarray      # (num_iters,) loss value per iteration
    trajectory: Optional[tuple]  # (iters, B, H, W, 3) x2 if collect=True


def pgd_attack(loss_fn: Callable, clean_left, clean_right, *,
               num_iters: int, alpha, eps, clip_min, clip_max,
               collect: bool = False, sign_only: bool = True) -> PGDResult:
    """L-inf PGD ascent on `loss_fn` w.r.t. both stereo views jointly.

    clip_min/clip_max broadcast against (B,H,W,3) — pass shape-(3,) arrays
    for per-channel bounds (the Stereo R-CNN convention).
    """
    clip_min = jnp.asarray(clip_min, clean_left.dtype)
    clip_max = jnp.asarray(clip_max, clean_left.dtype)
    grad_fn = jax.value_and_grad(
        lambda l, r: loss_fn(l, r), argnums=(0, 1))

    def project(x, clean):
        x = clean + jnp.clip(x - clean, -eps, eps)
        return jnp.clip(x, clip_min, clip_max)

    def step(carry, _):
        xl, xr = carry
        loss, (gl, gr) = grad_fn(xl, xr)
        if sign_only:
            gl, gr = jnp.sign(gl), jnp.sign(gr)
        xl = project(xl + alpha * gl, clean_left)
        xr = project(xr + alpha * gr, clean_right)
        out = (xl, xr) if collect else None
        return (xl, xr), (loss, out)

    (adv_l, adv_r), (losses, traj) = jax.lax.scan(
        step, (clean_left, clean_right), None, length=num_iters)
    return PGDResult(adv_l, adv_r, losses, traj)
