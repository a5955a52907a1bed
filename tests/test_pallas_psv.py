"""Pallas PSV-warp kernel: forward/backward equivalence with the reference
lerp-gather semantics (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# compile-heavy: full tier only
pytestmark = pytest.mark.slow

from eval_driving_safety_tpu.ops.cost_volume import (build_psv, depth_planes,
                                                     shift_along_width)
from eval_driving_safety_tpu.ops.pallas_psv import build_psv_pallas, psv_warp


def _ref_warp(fr, disps):
    return jax.vmap(lambda d: shift_along_width(fr, d))(disps)


def test_forward_matches_reference():
    rng = np.random.RandomState(0)
    fr = jnp.asarray(rng.rand(16, 64, 8).astype(np.float32))
    disps = jnp.asarray([0.0, 1.0, 2.5, 7.25, 40.0, 63.0])
    got = psv_warp(fr, disps)
    want = _ref_warp(fr, disps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_forward_non_multiple_rows():
    rng = np.random.RandomState(1)
    fr = jnp.asarray(rng.rand(12, 32, 4).astype(np.float32))  # H % 8 != 0
    disps = jnp.asarray([3.5, 0.25])
    got = psv_warp(fr, disps)
    want = _ref_warp(fr, disps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_backward_matches_autodiff_of_reference():
    rng = np.random.RandomState(2)
    fr = jnp.asarray(rng.rand(8, 32, 4).astype(np.float32))
    disps = jnp.asarray([0.0, 1.75, 5.5, 20.0])
    g = jnp.asarray(rng.rand(4, 8, 32, 4).astype(np.float32))

    def loss_k(x):
        return (psv_warp(x, disps) * g).sum()

    def loss_r(x):
        return (_ref_warp(x, disps) * g).sum()

    gk = jax.grad(loss_k)(fr)
    gr = jax.grad(loss_r)(fr)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-4)


def test_build_psv_pallas_matches_einsum():
    rng = np.random.RandomState(3)
    fl = jnp.asarray(rng.rand(1, 8, 32, 4).astype(np.float32))
    fr = jnp.asarray(rng.rand(1, 8, 32, 4).astype(np.float32))
    planes = depth_planes(2.0, 40.0, 6)
    a = build_psv(fl, fr, jnp.array([100.0]), jnp.array([0.5]), planes, 1)
    b = build_psv_pallas(fl, fr, jnp.array([100.0]), jnp.array([0.5]),
                         planes, 1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
