"""PSV warp / 3DGV gather / soft-argmin unit tests (golden values)."""
import jax.numpy as jnp
import numpy as np

from eval_driving_safety_tpu.config import DSGNConfig
from eval_driving_safety_tpu.ops.cost_volume import (
    _trilinear_gather, build_psv, depth_planes, psv_to_3dgv,
    shift_along_width, soft_argmin_depth)


def test_shift_along_width_integer():
    feat = jnp.arange(8.0).reshape(1, 8, 1)      # (H=1, W=8, C=1)
    out = np.asarray(shift_along_width(feat, jnp.float32(2.0)))[0, :, 0]
    # x - 2: first two samples out-of-range -> 0, rest shifted
    np.testing.assert_allclose(out, [0, 0, 0, 1, 2, 3, 4, 5])


def test_shift_along_width_subpixel():
    feat = jnp.arange(6.0).reshape(1, 6, 1)
    out = np.asarray(shift_along_width(feat, jnp.float32(0.5)))[0, :, 0]
    np.testing.assert_allclose(out[1:], [0.5, 1.5, 2.5, 3.5, 4.5])


def test_build_psv_zero_disparity_is_concat():
    rng = np.random.RandomState(0)
    fl = jnp.asarray(rng.rand(1, 4, 8, 3).astype(np.float32))
    fr = jnp.asarray(rng.rand(1, 4, 8, 3).astype(np.float32))
    # huge depth -> disparity ~ 0
    planes = jnp.array([1e6])
    psv = build_psv(fl, fr, jnp.array([700.0]), jnp.array([0.54]), planes, 4)
    assert psv.shape == (1, 1, 4, 8, 6)
    np.testing.assert_allclose(np.asarray(psv[0, 0, ..., :3]),
                               np.asarray(fl[0]), atol=1e-4)
    # column 0 is masked (warp reads x < 0 for any disparity > 0)
    np.testing.assert_allclose(np.asarray(psv[0, 0, :, 1:, 3:]),
                               np.asarray(fr[0, :, 1:]), atol=1e-3)


def test_psv_warp_matches_true_disparity():
    """A right image that is the left shifted by d px warps back onto it."""
    rng = np.random.RandomState(1)
    base = rng.rand(4, 16, 2).astype(np.float32)
    d_true = 3
    left = base
    right = np.zeros_like(base)
    right[:, :-d_true] = base[:, d_true:]      # right = left shifted left by d
    f_u, baseline, stride = 720.0, 0.54, 1
    z = f_u * baseline / d_true
    psv = build_psv(jnp.asarray(left[None]), jnp.asarray(right[None]),
                    jnp.array([f_u]), jnp.array([baseline]),
                    jnp.array([z]), stride)
    warped = np.asarray(psv[0, 0, ..., 2:])
    # interior columns (valid warp region) must match the left image
    np.testing.assert_allclose(warped[:, d_true:-d_true],
                               left[:, d_true:-d_true], atol=1e-4)


def test_soft_argmin_depth_peaked():
    planes = depth_planes(2.0, 50.0, 16)
    cost = jnp.full((1, 16, 2, 2), -100.0).at[:, 5].set(100.0)
    depth = np.asarray(soft_argmin_depth(cost, planes))
    np.testing.assert_allclose(depth, float(planes[5]), rtol=1e-5)


def test_trilinear_gather_exact_and_interp():
    vol = jnp.arange(2 * 2 * 2, dtype=jnp.float32).reshape(2, 2, 2, 1)
    # exact corner
    v = _trilinear_gather(vol, jnp.array([1.0]), jnp.array([1.0]),
                          jnp.array([1.0]))
    assert float(v[0, 0]) == 7.0
    # center of the cube = mean of all 8 corners
    v = _trilinear_gather(vol, jnp.array([0.5]), jnp.array([0.5]),
                          jnp.array([0.5]))
    np.testing.assert_allclose(float(v[0, 0]), 3.5)
    # out of range -> 0
    v = _trilinear_gather(vol, jnp.array([-1.0]), jnp.array([0.0]),
                          jnp.array([0.0]))
    assert float(v[0, 0]) == 0.0


def test_psv_to_3dgv_shapes_and_center_hit():
    cfg = DSGNConfig.tiny()
    planes = depth_planes(cfg.min_depth, cfg.max_depth, cfg.num_depth_planes)
    hf, wf = cfg.height // 4, cfg.width // 4
    vol = jnp.ones((1, cfg.num_depth_planes, hf, wf, 2))
    out = psv_to_3dgv(vol, planes, jnp.array([720.0]),
                      jnp.array([wf * 4 / 2.0]), jnp.array([hf * 4 / 2.0]),
                      cfg, 4)
    assert out.shape == (1, cfg.num_voxels_z, cfg.num_voxels_y,
                         cfg.num_voxels_x, 2)
    # the voxel straight ahead (x=0, mid z, y in view) must sample inside
    mid_z = cfg.num_voxels_z // 2
    mid_x = cfg.num_voxels_x // 2
    assert float(out[0, mid_z, cfg.num_voxels_y // 2, mid_x, 0]) > 0.5


def test_psv_to_3dgv_einsum_matches_gather():
    import jax
    cfg = DSGNConfig.tiny()
    planes = depth_planes(cfg.min_depth, cfg.max_depth, cfg.num_depth_planes)
    hf, wf = cfg.height // 4, cfg.width // 4
    rng = np.random.RandomState(3)
    vol = jnp.asarray(rng.rand(2, cfg.num_depth_planes, hf, wf, 3)
                      .astype(np.float32))
    fu = jnp.array([650.0, 720.0])
    cu = jnp.array([wf * 2.0, wf * 1.9])
    cv = jnp.array([hf * 2.0, hf * 2.1])
    a = psv_to_3dgv(vol, planes, fu, cu, cv, cfg, 4, method="gather")
    b = psv_to_3dgv(vol, planes, fu, cu, cv, cfg, 4, method="einsum")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_build_psv_matmul_matches_lerp_gather():
    rng = np.random.RandomState(4)
    fl = jnp.asarray(rng.rand(1, 4, 16, 2).astype(np.float32))
    fr = jnp.asarray(rng.rand(1, 4, 16, 2).astype(np.float32))
    planes = depth_planes(3.0, 40.0, 8)
    psv = build_psv(fl, fr, jnp.array([100.0]), jnp.array([0.5]), planes, 1)
    # reference: explicit per-plane lerp gather
    disps = 100.0 * 0.5 / planes
    for d in range(8):
        want = np.asarray(shift_along_width(fr[0], disps[d]))
        np.testing.assert_allclose(np.asarray(psv[0, d, ..., 2:]), want,
                                   atol=1e-5)
