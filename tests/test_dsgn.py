"""DSGN model + RPN3D loss + postprocessor: shapes, grads, decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# network-scale compiles dominate the suite: full tier only
pytestmark = pytest.mark.slow

from eval_driving_safety_tpu.config import DSGNConfig
from eval_driving_safety_tpu.inference.fcos3d_post import (
    box3d_corners, decode_bev_outputs)
from eval_driving_safety_tpu.models.dsgn import DSGN
from eval_driving_safety_tpu.models.rpn3d_loss import (
    assign_bev_targets, bev_cell_centers, dsgn_total_loss, rpn3d_loss)


@pytest.fixture(scope="module")
def setup():
    cfg = DSGNConfig.tiny()
    model = DSGN(cfg)
    h, w = cfg.height, cfg.width
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    im_l = jax.random.normal(k1, (1, h, w, 3))
    im_r = jax.random.normal(k2, (1, h, w, 3))
    calib = (jnp.array([720.0]), jnp.array([0.54]),
             jnp.array([w / 2.0]), jnp.array([h / 2.0]))
    params = model.init(k3, im_l, im_r, *calib)
    return cfg, model, params, im_l, im_r, calib


def _gt(cfg, n=1):
    g = 8
    boxes = np.zeros((1, g, 8), np.float32)
    boxes[0, 0] = [2.0, 1.6, 20.0, 1.5, 1.7, 4.0, 0.3, 1.0]
    return jnp.asarray(boxes), jnp.array([n], jnp.int32)


def test_forward_shapes(setup):
    cfg, model, params, im_l, im_r, calib = setup
    out = model.apply(params, im_l, im_r, *calib)
    assert len(out["depth_preds"]) == cfg.num_depth_preds
    for dp in out["depth_preds"]:
        assert dp.shape == (1, cfg.height, cfg.width)
        assert dp.dtype == jnp.float32
    assert out["bbox_cls"].shape == (1, cfg.num_voxels_z, cfg.num_voxels_x,
                                     cfg.num_classes)
    assert out["bbox_reg"].shape == (1, cfg.num_voxels_z, cfg.num_voxels_x, 8)
    assert out["bbox_centerness"].shape == (1, cfg.num_voxels_z,
                                            cfg.num_voxels_x)


def test_bev_target_assignment(setup):
    cfg = setup[0]
    boxes, nb = _gt(cfg)
    t = assign_bev_targets(boxes, nb, cfg)
    assert t.pos_mask.sum() > 0                      # box covers some cells
    zz, xx = bev_cell_centers(cfg)
    pos = np.asarray(t.pos_mask[0])
    # positive cells must be near the box center (2, 20)
    zs = np.asarray(zz)[pos]
    xs = np.asarray(xx)[pos]
    assert np.all(np.abs(xs - 2.0) < 4.0)
    assert np.all(np.abs(zs - 20.0) < 5.0)
    # reg target at a positive cell recovers box params
    idx = np.argwhere(pos)[0]
    r = np.asarray(t.reg[0])[idx[0], idx[1]]
    np.testing.assert_allclose(r[2], 1.6, atol=1e-5)         # y_bottom
    np.testing.assert_allclose(np.exp(r[3]), 1.5, rtol=1e-5)  # h
    np.testing.assert_allclose(np.arctan2(r[6], r[7]), 0.3, atol=1e-5)


def test_loss_and_gradient_to_pixels(setup):
    cfg, model, params, im_l, im_r, calib = setup
    boxes, nb = _gt(cfg)
    depth_gt = jnp.full((1, cfg.height, cfg.width), 20.0)

    def loss_fn(il, ir):
        out = model.apply(params, il, ir, *calib)
        total, _ = dsgn_total_loss(out, depth_gt, boxes, nb, cfg)
        return total

    loss, (gl, gr) = jax.value_and_grad(loss_fn, argnums=(0, 1))(im_l, im_r)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert float(jnp.abs(gl).max()) > 0
    assert float(jnp.abs(gr).max()) > 0


def test_postprocessor_decodes_planted_box(setup):
    cfg = setup[0]
    z, x = cfg.num_voxels_z, cfg.num_voxels_x
    zz, xx = bev_cell_centers(cfg)
    iz, ix = z // 2, x // 3
    cls = jnp.full((1, z, x, cfg.num_classes), -20.0).at[0, iz, ix, 0].set(20.0)
    ctr = jnp.full((1, z, x), -20.0).at[0, iz, ix].set(20.0)
    reg = jnp.zeros((1, z, x, 8))
    reg = reg.at[0, iz, ix].set(jnp.array([
        0.5, -0.25, 1.6, jnp.log(1.5), jnp.log(1.7), jnp.log(4.0),
        jnp.sin(0.3), jnp.cos(0.3)]))
    dets = decode_bev_outputs(
        {"bbox_cls": cls, "bbox_reg": reg, "bbox_centerness": ctr}, cfg)
    v = np.asarray(dets.valid[0])
    assert v[0] and v.sum() == 1                     # exactly one detection
    b = np.asarray(dets.boxes3d[0, 0])
    np.testing.assert_allclose(b[0], float(xx[iz, ix]) + 0.5, atol=1e-4)
    np.testing.assert_allclose(b[2], float(zz[iz, ix]) - 0.25, atol=1e-4)
    np.testing.assert_allclose(b[3:6], [1.5, 1.7, 4.0], rtol=1e-5)
    np.testing.assert_allclose(b[6], 0.3, atol=1e-5)
    assert float(dets.scores[0, 0]) > 0.99


def test_box3d_corners_axis_aligned():
    c = box3d_corners(np.array([1.0, 2.0, 10.0, 1.5, 1.8, 4.0, 0.0]))
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c[:4, 1], 2.0)        # bottom at y
    np.testing.assert_allclose(c[4:, 1], 0.5)        # top at y - h
    # KITTI: ry=0 -> length axis along camera x, width along z
    np.testing.assert_allclose(sorted(set(np.round(c[:, 0], 4))), [-1.0, 3.0])
    np.testing.assert_allclose(sorted(set(np.round(c[:, 2], 4))), [9.1, 10.9])



def test_score3d_matches_conv3d_with_shared_params():
    """Score3D (the tap-projection reformulation of the 1-channel 3^3
    score conv, config score_method="tap27") computes the SAME function as
    nn.Conv(1, (3,3,3)) from the SAME parameter tree — outputs and input
    gradients — so checkpoints are interchangeable between formulations."""
    from flax import linen as nn

    from eval_driving_safety_tpu.models.dsgn import Score3D

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 8, 10, 5))
    ref = nn.Conv(1, (3, 3, 3), padding="SAME")
    new = Score3D()
    params = ref.init(jax.random.PRNGKey(1), x)
    out_ref = ref.apply(params, x)[..., 0]
    out_new = new.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_new),
                               atol=1e-5)
    g_ref = jax.grad(lambda a: (ref.apply(params, a) ** 2).sum())(x)
    g_new = jax.grad(lambda a: (new.apply(params, a) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_new),
                               atol=1e-4)
    # bias-free variant matches the compat assembly's classif1_1 layout
    ref_nb = nn.Conv(1, (3, 3, 3), padding="SAME", use_bias=False)
    new_nb = Score3D(use_bias=False)
    p_nb = ref_nb.init(jax.random.PRNGKey(2), x)
    np.testing.assert_allclose(
        np.asarray(ref_nb.apply(p_nb, x)[..., 0]),
        np.asarray(new_nb.apply(p_nb, x)), atol=1e-5)
