"""Fused Pallas depth-tap conv: forward/backward equivalence with the XLA
reference formulation, and checkpoint interchangeability of the model's
`depth_method` variants (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# compile-heavy: full tier only
pytestmark = pytest.mark.slow

import eval_driving_safety_tpu.ops.pallas_depthconv as dtc
from eval_driving_safety_tpu.ops.pallas_depthconv import (
    depth_tap_conv, pick_nb, reference_depth_tap_conv)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(dtc, "_FORCE_INTERPRET", True)


def _inputs(shape, f, seed=0):
    rng = np.random.RandomState(seed)
    b, d, h, w, c = shape
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.5)
    wk = jnp.asarray(rng.randn(3, c, f).astype(np.float32) * 0.2)
    inv = jnp.asarray(rng.randn(f).astype(np.float32) * 0.5 + 1.0)
    off = jnp.asarray(rng.randn(f).astype(np.float32) * 0.2)
    return x, wk, inv, off


@pytest.mark.parametrize("relu", [True, False])
def test_forward_matches_reference(relu):
    x, wk, inv, off = _inputs((1, 6, 4, 8, 16), 16)
    assert pick_nb(4 * 8, 16, 16) is not None
    got = depth_tap_conv(x, wk, inv, off, relu)
    want = reference_depth_tap_conv(x, wk, inv, off, relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_backward_matches_autodiff_of_reference():
    x, wk, inv, off = _inputs((2, 5, 8, 8, 8), 24, seed=1)
    g = jnp.asarray(np.random.RandomState(2).rand(2, 5, 8, 8, 24)
                    .astype(np.float32))

    def loss(fn):
        return lambda *a: (fn(*a) * g).sum()

    gk = jax.grad(loss(depth_tap_conv), argnums=(0, 1, 2, 3))(
        x, wk, inv, off)
    gr = jax.grad(loss(reference_depth_tap_conv), argnums=(0, 1, 2, 3))(
        x, wk, inv, off)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_model_depth_methods_share_checkpoints():
    """ConvBnRelu2p1D(depth_method="pallas") must consume the exact
    parameter tree of the "transpose" default and produce the same output
    and input gradient."""
    from eval_driving_safety_tpu.models.dsgn import ConvBnRelu2p1D

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 8, 8, 8).astype(np.float32) * 0.5)
    mt = ConvBnRelu2p1D(8, depth_method="transpose")
    mp = ConvBnRelu2p1D(8, depth_method="pallas")
    params = mt.init(jax.random.PRNGKey(0), x)
    # randomize the frozen BN so the affine path is non-trivial
    bn = params["params"]["FrozenBatchNorm_0"]
    for k in bn:
        bn[k] = jnp.asarray(rng.rand(*bn[k].shape).astype(np.float32) + 0.5)

    yt = mt.apply(params, x)
    yp = mp.apply(params, x)
    assert set(jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a: a.shape, params))) \
        == set(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a: a.shape, mp.init(jax.random.PRNGKey(0), x))))
    np.testing.assert_allclose(np.asarray(yt), np.asarray(yp), atol=1e-4)

    gt = jax.grad(lambda a: (mt.apply(params, a) ** 2).sum())(x)
    gp = jax.grad(lambda a: (mp.apply(params, a) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gp),
                               atol=1e-3, rtol=1e-3)


def test_fallback_when_no_divisor():
    """Prime column counts (no VMEM-fitting divisor) fall back to the XLA
    reference instead of failing."""
    x, wk, inv, off = _inputs((1, 4, 1, 7, 8), 8, seed=4)
    assert pick_nb(7, 8, 8) is None
    got = depth_tap_conv(x, wk, inv, off)
    want = reference_depth_tap_conv(x, wk, inv, off)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
