"""Rotated (oriented) box IoU via convex polygon clipping — pure JAX.

Replaces the numba-CUDA rotated IoU in `kitti-object-eval-python` (shelled
from /root/reference/attack/DSGN/predict_and_save_pgd.py:287-301) and the
rotated-NMS CUDA op in DSGN's postprocessor. One static-shape
Sutherland-Hodgman implementation serves in-graph NMS (TPU) and the
host-side AP evaluator (CPU jit).

Box layout (BEV): (cx, cy, w, l, angle). `l` extends along the heading
direction, `w` perpendicular; angle in radians, CCW.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_V = 9  # intersection of two convex quads has <= 8 vertices (+1 pad slot)
EPS = 1e-8


def box5_to_corners(boxes5):
    """(...,5) -> (...,4,2) corners in CCW order."""
    cx, cy, w, l, ang = (boxes5[..., 0], boxes5[..., 1], boxes5[..., 2],
                         boxes5[..., 3], boxes5[..., 4])
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    # local corners CCW: (+l/2,+w/2), (-l/2,+w/2), (-l/2,-w/2), (+l/2,-w/2)
    lx = jnp.stack([l, -l, -l, l], axis=-1) * 0.5
    ly = jnp.stack([w, w, -w, -w], axis=-1) * 0.5
    x = cx[..., None] + lx * cos[..., None] - ly * sin[..., None]
    y = cy[..., None] + lx * sin[..., None] + ly * cos[..., None]
    return jnp.stack([x, y], axis=-1)


def _polygon_area(verts, count):
    """Shoelace area of the first `count` CCW-ordered vertices in (MAX_V,2)."""
    idx = jnp.arange(MAX_V)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    x, y = verts[:, 0], verts[:, 1]
    term = x * y[nxt] - x[nxt] * y
    term = jnp.where(idx < count, term, 0.0)
    return 0.5 * jnp.abs(term.sum())


def _clip_by_edge(verts, count, a, b):
    """Clip polygon (verts[:count]) by half-plane left of directed edge a->b.

    Static-shape Sutherland-Hodgman step: each input edge emits up to 2
    output vertices; emitted vertices are compacted with a cumsum scatter.
    """
    idx = jnp.arange(MAX_V)
    active = idx < count
    prev_idx = jnp.where(idx == 0, jnp.maximum(count - 1, 0), idx - 1)
    cur = verts
    prev = verts[prev_idx]

    edge = b - a

    def side(p):
        return edge[0] * (p[..., 1] - a[1]) - edge[1] * (p[..., 0] - a[0])

    s_cur = side(cur)
    s_prev = side(prev)
    cur_in = s_cur >= -EPS
    prev_in = s_prev >= -EPS

    # intersection of segment prev->cur with the edge line
    denom = s_prev - s_cur
    t = s_prev / jnp.where(jnp.abs(denom) < EPS, jnp.inf, denom)
    inter = prev + t[:, None] * (cur - prev)

    # emission rules per edge: cross-in -> [inter, cur]; in->in -> [cur];
    # cross-out -> [inter]; out->out -> [].
    emit_inter = active & (cur_in != prev_in)
    emit_cur = active & cur_in

    # order: inter first (if any), then cur
    n_emit = emit_inter.astype(jnp.int32) + emit_cur.astype(jnp.int32)
    start = jnp.cumsum(n_emit) - n_emit  # exclusive cumsum

    out = jnp.zeros((MAX_V, 2), dtype=verts.dtype)
    pos_inter = jnp.where(emit_inter, start, MAX_V)
    pos_cur = jnp.where(emit_cur, start + emit_inter.astype(jnp.int32), MAX_V)
    out = out.at[pos_inter].set(inter, mode="drop")
    out = out.at[pos_cur].set(cur, mode="drop")
    new_count = n_emit.sum()
    return out, new_count


def _intersection_area(c1, c2):
    """Area of intersection of two convex quads given (4,2) corners each."""
    verts = jnp.zeros((MAX_V, 2), dtype=c1.dtype)
    verts = verts.at[:4].set(c1)
    count = jnp.asarray(4, dtype=jnp.int32)

    def clip_step(i, state):
        v, c = state
        a = c2[i]
        b = c2[(i + 1) % 4]
        return _clip_by_edge(v, c, a, b)

    for i in range(4):
        verts, count = clip_step(i, (verts, count))
    area = _polygon_area(verts, count)
    return jnp.where(count >= 3, area, 0.0)


def rotated_pairwise_iou(boxes_a, boxes_b):
    """(N,5),(M,5) -> (N,M) rotated IoU."""
    ca = box5_to_corners(boxes_a)  # (N,4,2)
    cb = box5_to_corners(boxes_b)  # (M,4,2)
    area_a = boxes_a[:, 2] * boxes_a[:, 3]
    area_b = boxes_b[:, 2] * boxes_b[:, 3]

    inter = jax.vmap(
        lambda c1: jax.vmap(lambda c2: _intersection_area(c1, c2))(cb)
    )(ca)  # (N,M)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, EPS)


def rotated_iou_single(box_a, box_b):
    return rotated_pairwise_iou(box_a[None], box_b[None])[0, 0]


def kitti_bev_box5(x, z, w, l, ry):
    """KITTI camera-frame BEV box -> this module's (cx, cy, w, l, angle).

    KITTI footprint corners are (x + lu*cos(ry) + wv*sin(ry),
    z - lu*sin(ry) + wv*cos(ry)) — that equals `box5_to_corners` with
    angle = -ry (the y-down camera frame flips the rotation sense).
    Stack with jnp.stack([...], -1) or np.stack as needed.
    """
    return x, z, w, l, -ry
