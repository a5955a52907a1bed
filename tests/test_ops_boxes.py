import numpy as np
import jax.numpy as jnp

from eval_driving_safety_tpu.ops import boxes as B


def test_pairwise_iou_golden():
    a = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    b = jnp.array([[0.0, 0.0, 9.0, 9.0], [5.0, 0.0, 14.0, 9.0],
                   [20.0, 20.0, 29.0, 29.0]])
    iou = B.pairwise_iou(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 50.0 / 150.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 2], 0.0, atol=1e-6)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    anchors = np.stack([
        rng.uniform(0, 50, 16), rng.uniform(0, 50, 16),
        rng.uniform(60, 120, 16), rng.uniform(60, 120, 16)], axis=1)
    gt = np.stack([
        rng.uniform(0, 50, 16), rng.uniform(0, 50, 16),
        rng.uniform(60, 120, 16), rng.uniform(60, 120, 16)], axis=1)
    deltas = B.encode_boxes(jnp.asarray(anchors), jnp.asarray(gt))
    rec = B.decode_boxes(jnp.asarray(anchors), deltas)
    np.testing.assert_allclose(np.asarray(rec), gt, atol=1e-2)


def test_stereo_encode_decode_roundtrip():
    rng = np.random.RandomState(1)
    anchors = np.array([[10.0, 10.0, 60.0, 40.0]] * 8)
    left = np.stack([
        rng.uniform(0, 20, 8), rng.uniform(0, 20, 8),
        rng.uniform(40, 80, 8), rng.uniform(40, 80, 8)], axis=1)
    right = left.copy()
    right[:, 0] -= rng.uniform(2, 10, 8)  # disparity shift
    right[:, 2] -= rng.uniform(2, 10, 8)
    deltas6 = B.encode_stereo_boxes(jnp.asarray(anchors), jnp.asarray(left),
                                    jnp.asarray(right))
    assert deltas6.shape == (8, 6)
    rl, rr = B.decode_stereo_boxes(jnp.asarray(anchors), deltas6)
    np.testing.assert_allclose(np.asarray(rl), left, atol=1e-2)
    np.testing.assert_allclose(np.asarray(rr)[:, [0, 2]], right[:, [0, 2]], atol=1e-2)
    # right shares y extent with left
    np.testing.assert_allclose(np.asarray(rr)[:, [1, 3]], left[:, [1, 3]], atol=1e-2)


def test_clip_and_union():
    b = jnp.array([[-5.0, -5.0, 200.0, 90.0]])
    c = B.clip_boxes(b, 100, 150)
    np.testing.assert_allclose(np.asarray(c[0]), [0, 0, 149, 90])
    left = jnp.array([[10.0, 10.0, 20.0, 20.0]])
    right = jnp.array([[5.0, 12.0, 15.0, 22.0]])
    u = B.union_boxes(left, right)
    np.testing.assert_allclose(np.asarray(u[0]), [5, 10, 20, 22])


def test_smooth_l1():
    d = jnp.array([0.1, 2.0])
    out = np.asarray(B.smooth_l1(d, sigma=1.0))
    np.testing.assert_allclose(out, [0.005, 1.5], atol=1e-6)
    # sigma=3 convention (RPN): threshold at 1/9
    out3 = np.asarray(B.smooth_l1(jnp.array([0.05, 0.5]), sigma=3.0))
    np.testing.assert_allclose(out3, [0.5 * 9 * 0.0025, 0.5 - 0.5 / 9], atol=1e-6)
