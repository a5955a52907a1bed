"""Sign-trajectory PGD: packed 2-bit signs + host replay reproduce every
device iterate bit-exactly (the transfer-minimal sweep path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eval_driving_safety_tpu.attack.pgd import (pack_signs, pgd_attack,
                                                replay_pgd, unpack_signs)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    s = rng.randint(-1, 2, size=(2, 6, 16, 3)).astype(np.float32)
    packed = np.asarray(pack_signs(jnp.asarray(s)))
    assert packed.shape == (2, 6, 12) and packed.dtype == np.uint8
    out = unpack_signs(packed)
    assert np.array_equal(out, s)


def test_pack_rejects_unaligned_width():
    with pytest.raises(ValueError):
        pack_signs(jnp.zeros((1, 4, 5, 3)))


def _toy_loss(il, ir):
    # non-trivial loss with sign structure that flips across iterations
    cl = il - jnp.roll(il, 1, axis=2) + 0.3 * jnp.roll(il, 1, axis=1)
    return jnp.sum(jnp.sin(37.0 * cl) * cl) - 0.1 * jnp.sum(ir ** 2) \
        + jnp.sum(il * jnp.roll(ir, 1, axis=2))


@pytest.mark.parametrize("space", ["dsgn", "srcnn"])
def test_replay_matches_device_iterates_bitwise(space):
    rng = np.random.RandomState(3)
    shape = (2, 8, 16, 3)
    if space == "dsgn":
        clean_l = (rng.randint(0, 256, shape) / 255.0).astype(np.float32)
        clean_r = (rng.randint(0, 256, shape) / 255.0).astype(np.float32)
        kw = dict(alpha=1 / 255.0, eps=0.3, clip_min=0.0, clip_max=1.0)
    else:
        means = np.array([102.9801, 115.9465, 122.7717], np.float32)
        clean_l = rng.randint(0, 256, shape).astype(np.float32) - means
        clean_r = rng.randint(0, 256, shape).astype(np.float32) - means
        kw = dict(alpha=1.0, eps=255.0 * 0.3, clip_min=-means,
                  clip_max=255.0 - means)

    n = 6
    full = jax.jit(lambda l, r: pgd_attack(
        _toy_loss, l, r, num_iters=n, collect=True, **kw))(
        jnp.asarray(clean_l), jnp.asarray(clean_r))
    signs = jax.jit(lambda l, r: pgd_attack(
        _toy_loss, l, r, num_iters=n, collect="signs", **kw))(
        jnp.asarray(clean_l), jnp.asarray(clean_r))

    # same attack: losses and final iterates identical
    assert np.array_equal(np.asarray(full.losses), np.asarray(signs.losses))
    assert np.array_equal(np.asarray(full.adv_left),
                          np.asarray(signs.adv_left))

    pl = np.asarray(signs.trajectory[0])
    pr = np.asarray(signs.trajectory[1])
    assert pl.dtype == np.uint8 and pl.shape == (n, 2, 8, 12)

    replayed = list(replay_pgd(clean_l, clean_r, pl, pr, **kw))
    assert len(replayed) == n
    for k in range(n):
        dev_l = np.asarray(full.trajectory[0][k])
        dev_r = np.asarray(full.trajectory[1][k])
        assert np.array_equal(replayed[k][0], dev_l), f"iter {k} left"
        assert np.array_equal(replayed[k][1], dev_r), f"iter {k} right"
    # the ball/pixel clips actually engaged at least somewhere, so the
    # bit-exactness covers the projection path too
    deltas = np.abs(replayed[-1][0] - clean_l)
    assert deltas.max() > 0


def test_device_u8_ingest_matches_host_load_exhaustive():
    """Device-side u8/255 must equal the host image load's floats for all
    256 byte values — the precondition for the sign replay's clean pair
    matching the device's (the contract of prepare_dsgn_batch_u8)."""
    from eval_driving_safety_tpu.data.dataset import u8_to_01
    u = np.arange(256, dtype=np.uint8).reshape(1, 4, 64, 1)
    host = u.astype(np.float32) / 255.0          # kitti.load_image formula
    dev = np.asarray(jax.jit(u8_to_01)(jnp.asarray(u)))
    assert np.array_equal(host, dev)
