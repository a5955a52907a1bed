import numpy as np
import jax.numpy as jnp

from eval_driving_safety_tpu.ops.roi_align import (
    roi_align, roi_levels, pyramid_roi_align)


def test_roi_align_constant_feature():
    feat = jnp.ones((1, 8, 8, 3)) * 5.0
    rois = jnp.array([[0.0, 0.0, 0.0, 8.0, 8.0]])
    out = roi_align(feat, rois, output_size=2, spatial_scale=1.0)
    assert out.shape == (1, 2, 2, 3)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-6)


def test_roi_align_linear_ramp_exact():
    # bilinear interp of a linear function is exact, so each output bin is
    # the mean x-coordinate of its sample points
    h, w = 16, 16
    xgrid = np.tile(np.arange(w, dtype=np.float32), (h, 1))
    feat = jnp.asarray(xgrid[None, :, :, None])
    rois = jnp.array([[0.0, 2.0, 2.0, 10.0, 10.0]])  # x1=y1=2, x2=y2=10
    p, s = 4, 2
    out = np.asarray(roi_align(feat, rois, output_size=p, spatial_scale=1.0,
                               sampling_ratio=s))[0, :, :, 0]
    bin_w = 8.0 / p
    for px in range(p):
        sample_xs = 2.0 + (np.array([0.5, 1.5]) / s + px) * bin_w
        expected = sample_xs.mean()
        np.testing.assert_allclose(out[:, px], expected, atol=1e-4)


def test_roi_align_batch_routing():
    feat = jnp.stack([jnp.zeros((4, 4, 1)), jnp.ones((4, 4, 1))], axis=0)
    rois = jnp.array([[1.0, 0.0, 0.0, 4.0, 4.0], [0.0, 0.0, 0.0, 4.0, 4.0]])
    out = np.asarray(roi_align(feat, rois, 2, 1.0))
    np.testing.assert_allclose(out[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)


def test_roi_levels_reference_rule():
    # 224x224 roi -> ln(1)=0 -> level 4; tiny roi -> clamp 2; huge -> clamp 5
    rois = jnp.array([
        [0.0, 0.0, 0.0, 223.0, 223.0],
        [0.0, 0.0, 0.0, 7.0, 7.0],
        [0.0, 0.0, 0.0, 3000.0, 3000.0],
    ])
    lv = np.asarray(roi_levels(rois))
    assert list(lv) == [4, 2, 5]


def test_pyramid_roi_align_selects_level():
    feats = [jnp.full((1, 256 // s, 256 // s, 1), float(i))
             for i, s in enumerate((4, 8, 16, 32))]
    # 224-sized roi -> level 4 -> feats index 2 (value 2.0)
    rois = jnp.array([[0.0, 0.0, 0.0, 223.0, 223.0]])
    out = np.asarray(pyramid_roi_align(feats, rois, output_size=2))
    np.testing.assert_allclose(out, 2.0, atol=1e-6)
