import numpy as np
import pytest

# compile-heavy: full tier only
pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from eval_driving_safety_tpu.ops import nms as N
from eval_driving_safety_tpu.ops import rotated as R


def test_nms_basic():
    boxes = jnp.array([
        [0.0, 0.0, 10.0, 10.0],
        [1.0, 1.0, 11.0, 11.0],   # overlaps box 0 heavily
        [50.0, 50.0, 60.0, 60.0],
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    keep, mask = N.nms(boxes, scores, max_out=3, iou_thresh=0.5)
    keep = np.asarray(keep)[np.asarray(mask)]
    assert list(keep) == [0, 2]


def test_nms_respects_valid_mask():
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [50.0, 50.0, 60.0, 60.0]])
    scores = jnp.array([0.9, 0.8])
    keep, mask = N.nms(boxes, scores, max_out=2, iou_thresh=0.5,
                       valid=jnp.array([False, True]))
    kept = np.asarray(keep)[np.asarray(mask)]
    assert list(kept) == [1]


def test_rotated_iou_axis_aligned():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0], [1.0, 0.0, 2.0, 2.0, 0.0],
                   [10.0, 10.0, 2.0, 2.0, 0.0]])
    iou = np.asarray(R.rotated_pairwise_iou(a, b))
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(iou[0, 1], 2.0 / 6.0, atol=1e-5)
    np.testing.assert_allclose(iou[0, 2], 0.0, atol=1e-6)


def test_rotated_iou_45deg():
    # square vs itself rotated 45deg: octagon intersection, area 8(sqrt2 - 1)
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[0.0, 0.0, 2.0, 2.0, np.pi / 4]])
    iou = float(R.rotated_pairwise_iou(a, b)[0, 0])
    inter = 8 * (np.sqrt(2) - 1)
    expected = inter / (8 - inter)
    np.testing.assert_allclose(iou, expected, atol=1e-4)


def test_rotated_iou_angle_invariance():
    # rotating both boxes by the same angle preserves IoU
    rng = np.random.RandomState(3)
    for _ in range(5):
        b1 = np.array([0.0, 0.0, 2.0, 4.0, rng.uniform(-np.pi, np.pi)])
        b2 = np.array([1.0, 0.5, 3.0, 2.0, rng.uniform(-np.pi, np.pi)])
        base = float(R.rotated_iou_single(jnp.asarray(b1), jnp.asarray(b2)))
        phi = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(phi), np.sin(phi)

        def rot(b):
            x, y = b[0], b[1]
            return np.array([c * x - s * y, s * x + c * y, b[2], b[3], b[4] + phi])
        rotated = float(R.rotated_iou_single(jnp.asarray(rot(b1)),
                                             jnp.asarray(rot(b2))))
        np.testing.assert_allclose(rotated, base, atol=1e-4)


def test_rotated_nms_under_jit():
    boxes = jnp.array([
        [0.0, 0.0, 2.0, 4.0, 0.1],
        [0.1, 0.0, 2.0, 4.0, 0.1],
        [20.0, 0.0, 2.0, 4.0, 1.2],
    ])
    scores = jnp.array([0.9, 0.95, 0.5])
    keep, mask = jax.jit(
        lambda b, s: N.rotated_nms(b, s, max_out=3, iou_thresh=0.3)
    )(boxes, scores)
    kept = np.asarray(keep)[np.asarray(mask)]
    assert list(kept) == [1, 2]


def test_nms_parallel_matches_greedy():
    import jax
    from eval_driving_safety_tpu.ops.nms import nms, nms_parallel
    k = jax.random.PRNGKey(3)
    n = 300
    ctr = jax.random.uniform(k, (n, 2)) * 300
    wh = jax.random.uniform(jax.random.fold_in(k, 1), (n, 2)) * 60 + 5
    boxes = jnp.concatenate([ctr, ctr + wh], axis=1)
    scores = jax.random.uniform(jax.random.fold_in(k, 2), (n,))
    for thresh in (0.3, 0.5, 0.7):
        ki, km = nms(boxes, scores, 100, thresh)
        pi, pm = nms_parallel(boxes, scores, 100, thresh)
        kept_greedy = set(np.asarray(ki)[np.asarray(km)].tolist())
        kept_par = set(np.asarray(pi)[np.asarray(pm)].tolist())
        assert kept_greedy == kept_par, f"mismatch at thresh {thresh}"


def test_nms_parallel_respects_valid_mask():
    from eval_driving_safety_tpu.ops.nms import nms_parallel
    boxes = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    idx, mask = nms_parallel(boxes, scores, 2, 0.5,
                             valid=jnp.asarray([True, False]))
    assert bool(mask[0]) and not bool(mask[1])
    assert int(idx[0]) == 0


def test_kitti_bev_convention_matches_corner_geometry():
    """box5_to_corners with angle=-ry must reproduce the KITTI footprint
    corners used by box3d_corners/assign_bev_targets (x,z columns)."""
    from eval_driving_safety_tpu.inference.fcos3d_post import box3d_corners
    from eval_driving_safety_tpu.ops.rotated import box5_to_corners
    x, y, z, h, w, l, ry = 1.0, 1.6, 10.0, 1.5, 1.7, 4.0, 0.7
    kitti = box3d_corners(np.array([x, y, z, h, w, l, ry]))[:4][:, [0, 2]]
    ours = np.asarray(box5_to_corners(
        jnp.asarray([x, z, w, l, -ry])))
    # same 4 corners (order may differ)
    kset = sorted(map(tuple, np.round(kitti, 5)))
    oset = sorted(map(tuple, np.round(ours, 5)))
    np.testing.assert_allclose(kset, oset, atol=1e-4)
    # and the +ry sign would NOT match (the bug this pins down)
    wrong = np.asarray(box5_to_corners(jnp.asarray([x, z, w, l, ry])))
    wset = sorted(map(tuple, np.round(wrong, 5)))
    assert not np.allclose(kset, wset, atol=1e-3)
