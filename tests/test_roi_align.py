import jax
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


def test_custom_vjp_matches_plain_autodiff():
    """roi_align's scatter-free backward (transposed tent matmuls) equals
    autodiff of the plain gather formulation exactly; roi-coordinate
    gradients are intentionally zero (torchvision ROIAlign semantics —
    the reference's CUDA op also only backprops to features)."""
    from eval_driving_safety_tpu.ops import roi_align as RA

    def plain_sample(feat, ys, xs, onehot_b):
        h, w = feat.shape[1], feat.shape[2]
        yy = ys[:, :, None]
        xx = xs[:, None, :]
        oob = ((yy < -1.0) | (yy > h * 1.0)
               | (xx < -1.0) | (xx > w * 1.0))
        yc = jnp.clip(yy, 0.0, h - 1.0)
        xc = jnp.clip(xx, 0.0, w - 1.0)
        y0 = jnp.floor(yc)
        x0 = jnp.floor(xc)
        ly, lx = yc - y0, xc - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        y1i = jnp.minimum(y0i + 1, h - 1)
        x1i = jnp.minimum(x0i + 1, w - 1)
        bi = jnp.argmax(onehot_b, axis=-1).astype(jnp.int32)[:, None, None]

        def g(yi, xi):
            yi, xi = jnp.broadcast_arrays(yi, xi)
            return feat[jnp.broadcast_to(bi, yi.shape), yi, xi]

        hy, hx = 1.0 - ly, 1.0 - lx
        vals = (g(y0i, x0i) * (hy * hx)[..., None]
                + g(y0i, x1i) * (hy * lx)[..., None]
                + g(y1i, x0i) * (ly * hx)[..., None]
                + g(y1i, x1i) * (ly * lx)[..., None])
        return jnp.where(jnp.broadcast_to(oob, vals.shape[:3])[..., None],
                         0.0, vals)

    k = jax.random.PRNGKey(0)
    feat = jax.random.normal(jax.random.fold_in(k, 0), (2, 9, 11, 3))
    rois = jnp.array([[0, 2.0, 1.0, 30.0, 20.0],    # interior
                      [1, -4.0, -2.0, 12.0, 9.0],   # clamped corner
                      [0, 8.0, 6.0, 40.0, 33.0],    # spills off right/bottom
                      [1, 0.0, 0.0, 43.0, 35.0]])   # whole image
    ys, xs = RA._sample_coords(rois, 7, 0.25, 2)
    onehot = jax.nn.one_hot(rois[:, 0].astype(jnp.int32), 2,
                            dtype=feat.dtype)
    r = jax.random.normal(jax.random.fold_in(k, 1), (4, 14, 14, 3))

    g_plain = jax.grad(lambda f: jnp.sum(
        plain_sample(f, ys, xs, onehot) * r))(feat)
    g_custom = jax.grad(lambda f: jnp.sum(
        RA._bilerp_sample((9, 11), f, ys, xs, onehot) * r))(feat)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               atol=1e-5, rtol=1e-5)

    g_rois = jax.grad(lambda rr: jnp.sum(
        RA.roi_align(feat, rr, 7, 0.25)))(rois)
    assert float(jnp.abs(g_rois).max()) == 0.0
