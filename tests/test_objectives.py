"""Attack objectives: gradients push depth predictions the intended way."""
import jax
import jax.numpy as jnp
import numpy as np

from eval_driving_safety_tpu.attack import objectives as O
from eval_driving_safety_tpu.config import DSGNConfig


def _fake_outputs(pred):
    return {"depth_preds": [pred]}


def test_depth_divergence_increases_error():
    cfg = DSGNConfig.tiny()
    gt = jnp.full((1, 8, 8), 20.0)
    pred0 = jnp.full((1, 8, 8), 20.0)

    def obj(p):
        return O.depth_divergence(_fake_outputs(p), gt, cfg)

    assert float(obj(pred0)) == 0.0
    g = jax.grad(obj)(pred0 + 0.5)      # pred above gt -> grad positive
    assert float(g.mean()) > 0          # ascent pushes pred further away


def test_depth_shift_targets_offset():
    cfg = DSGNConfig.tiny()
    gt = jnp.full((1, 8, 8), 20.0)

    def obj(p):
        return O.depth_shift(_fake_outputs(p), gt, 10.0, cfg)

    # maximized exactly at gt + 10
    assert float(obj(jnp.full((1, 8, 8), 30.0))) == 0.0
    assert float(obj(jnp.full((1, 8, 8), 20.0))) == -10.0
    g = jax.grad(obj)(jnp.full((1, 8, 8), 25.0))
    assert float(g.mean()) > 0          # ascent moves pred toward 30


def test_mask_excludes_invalid_depth():
    cfg = DSGNConfig.tiny()
    gt = jnp.zeros((1, 4, 4))           # all below min_depth -> masked
    v = O.depth_divergence(_fake_outputs(jnp.full((1, 4, 4), 99.0)), gt, cfg)
    assert float(v) == 0.0
