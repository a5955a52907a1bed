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


@pytest.mark.parametrize("eps", [76.5, 2.5])
def test_replay_255_matches_f32_quantized(eps):
    """The int16 replay (255-space, unit step) emits u8 frames bit-equal
    to running the f32 replay and truncating — including iterations where
    the half-integer eps ball binds (eps=2.5 binds from iteration 3)."""
    from eval_driving_safety_tpu.attack.pgd import replay_pgd_255
    rng = np.random.RandomState(5)
    shape = (2, 8, 16, 3)
    u8l = rng.randint(0, 256, shape).astype(np.uint8)
    u8r = rng.randint(0, 256, shape).astype(np.uint8)
    kw = dict(alpha=np.float32(1.0), eps=np.float32(eps),
              clip_min=0.0, clip_max=255.0)
    n = 6
    res = jax.jit(lambda l, r: pgd_attack(
        _toy_loss, l, r, num_iters=n, collect="signs", **kw))(
        jnp.asarray(u8l, jnp.float32), jnp.asarray(u8r, jnp.float32))
    pl = np.asarray(res.trajectory[0])
    pr = np.asarray(res.trajectory[1])

    f32_frames = list(replay_pgd(u8l.astype(np.float32),
                                 u8r.astype(np.float32), pl, pr, **kw))
    int_frames = list(replay_pgd_255(u8l, u8r, pl, pr, eps=eps))
    assert len(int_frames) == n
    for k in range(n):
        for side in (0, 1):
            q = np.clip(f32_frames[k][side], 0, 255).astype(np.uint8)
            assert np.array_equal(int_frames[k][side], q), f"iter {k}"
    # device iterates live exactly on the half grid (the exactness basis)
    assert np.array_equal(np.asarray(res.adv_left) * 2,
                          np.round(np.asarray(res.adv_left) * 2))
    # the ball actually bound for the small eps
    if eps == 2.5:
        d = np.abs(f32_frames[-1][0] - u8l.astype(np.float32)).max()
        assert d == eps


def test_replay_ints_matches_f32_chain_per_sample_params():
    """The doubled-int32 replay for grid attack spaces (SRCNN v-space)
    reproduces the device's f32 iterates exactly, with PER-SAMPLE
    alpha/eps/clip_max arrays — v2/2 == the f32 chain bitwise."""
    from eval_driving_safety_tpu.attack.pgd import replay_pgd_ints
    rng = np.random.RandomState(9)
    shape = (2, 8, 16, 3)
    K = np.array([48.0, 80.0])                     # per-sample scales
    v_l = rng.randint(0, 256 * 80, shape).astype(np.int32)
    v_r = rng.randint(0, 256 * 80, shape).astype(np.int32)
    v_l = np.minimum(v_l, (255 * K).astype(np.int32).reshape(2, 1, 1, 1))
    v_r = np.minimum(v_r, (255 * K).astype(np.int32).reshape(2, 1, 1, 1))
    kw = dict(alpha=(1.0 * K).astype(np.float32).reshape(2, 1, 1, 1),
              eps=(2.5 * K).astype(np.float32).reshape(2, 1, 1, 1),
              clip_min=0.0,
              clip_max=(255.0 * K).astype(np.float32).reshape(2, 1, 1, 1))
    n = 6                                          # ball binds from iter 3
    res = jax.jit(lambda l, r: pgd_attack(
        _toy_loss, l, r, num_iters=n, collect="signs", **kw))(
        jnp.asarray(v_l, jnp.float32), jnp.asarray(v_r, jnp.float32))
    full = jax.jit(lambda l, r: pgd_attack(
        _toy_loss, l, r, num_iters=n, collect=True, **kw))(
        jnp.asarray(v_l, jnp.float32), jnp.asarray(v_r, jnp.float32))
    pl = np.asarray(res.trajectory[0])
    pr = np.asarray(res.trajectory[1])
    frames = list(replay_pgd_ints(
        v_l * 2, v_r * 2, pl, pr,
        alpha2=(2 * K).astype(np.int64),
        eps2=(5 * K).astype(np.int64),
        clip_max2=(510 * K).astype(np.int64)))
    assert len(frames) == n
    for k in range(n):
        dev_l = np.asarray(full.trajectory[0][k])
        dev_r = np.asarray(full.trajectory[1][k])
        assert np.array_equal(frames[k][0].astype(np.float32) * 0.5,
                              dev_l), f"iter {k} left"
        assert np.array_equal(frames[k][1].astype(np.float32) * 0.5,
                              dev_r), f"iter {k} right"


def test_srcnn_replay_intable_gate():
    """The integer-replay gate (ADVICE r4 #3): paper-scale K = 16*3974
    with the default alpha=1/eps=76.5 lands on the even (integer) grid and
    passes the 2^24 bound — the old 2^23 gate silently forced the slow
    f32 replay for every paper-scale sweep. Odd K with eps=76.5 puts
    iterates on the HALF grid where the bound tightens back to 2^23."""
    from eval_driving_safety_tpu.attack.pgd import srcnn_replay_intable
    K_paper = 16 * 3974                            # 63584, even
    assert srcnn_replay_intable(1.0, 76.5, K_paper)
    assert srcnn_replay_intable(1.0, 76.5, np.array([K_paper, 48.0]))
    # odd K -> e2 = 153*K odd -> half grid -> (255+1)*K >= 2^23 -> reject
    assert not srcnn_replay_intable(1.0, 76.5, 63585)
    # odd K but small enough for the half grid -> accept
    assert srcnn_replay_intable(1.0, 76.5, 33)
    # non-grid alpha -> reject regardless of scale
    assert not srcnn_replay_intable(0.3, 76.5, 48)
    # even grid but past 2^24: (255+1)*K >= 2^24
    assert not srcnn_replay_intable(1.0, 76.5, 2 ** 16)


def test_replay_ints_matches_f32_chain_paper_scale_K():
    """Bit-exactness of the doubled-int replay vs the device f32 chain AT
    PAPER SCALE (K = 63584): clean values reach 255K = 16.21M, the
    pre-clip step reaches 255K + K < 2^24, and the eps-ball upper bound
    clean+eps exceeds 2^24 for bright pixels but is absorbed by the range
    clamp — the exactness argument of srcnn_replay_intable, verified."""
    from eval_driving_safety_tpu.attack.pgd import (replay_pgd_ints,
                                                    srcnn_replay_intable)
    K = 16 * 3974
    assert srcnn_replay_intable(1.0, 76.5, float(K))
    rng = np.random.RandomState(7)
    shape = (1, 8, 16, 3)
    # force bright pixels so clean+eps > 2^24 actually occurs
    u8 = rng.randint(0, 256, shape)
    u8.flat[:64] = 255
    v = (u8 * K).astype(np.int64)
    assert float((v + 76.5 * K).max()) > 2 ** 24
    kw = dict(alpha=np.float32(1.0 * K), eps=np.float32(76.5 * K),
              clip_min=0.0, clip_max=np.float32(255.0 * K))
    n = 5
    vf = jnp.asarray(v, jnp.float32)
    res = jax.jit(lambda l, r: pgd_attack(
        _toy_loss, l, r, num_iters=n, collect="signs", **kw))(vf, vf)
    full = jax.jit(lambda l, r: pgd_attack(
        _toy_loss, l, r, num_iters=n, collect=True, **kw))(vf, vf)
    pl = np.asarray(res.trajectory[0])
    pr = np.asarray(res.trajectory[1])
    frames = list(replay_pgd_ints(
        (v * 2).astype(np.int64), (v * 2).astype(np.int64), pl, pr,
        alpha2=2 * K, eps2=int(2 * 76.5 * K), clip_max2=510 * K))
    for k in range(n):
        dev_l = np.asarray(full.trajectory[0][k])
        assert np.array_equal(frames[k][0].astype(np.float64) * 0.5,
                              dev_l.astype(np.float64)), f"iter {k} left"
        dev_r = np.asarray(full.trajectory[1][k])
        assert np.array_equal(frames[k][1].astype(np.float64) * 0.5,
                              dev_r.astype(np.float64)), f"iter {k} right"
    # the range clamp actually engaged at the top (bright pixels ride it)
    assert float(np.asarray(full.trajectory[0]).max()) == 255.0 * K


def test_quantize_v_matches_device_formula():
    """Host quantize_v_rgb_u8 == the device branch bitwise (the CLI full
    vs signs byte-parity depends on it), over 4-d and 5-d stacks."""
    from eval_driving_safety_tpu.data.dataset import quantize_v_rgb_u8
    rng = np.random.RandomState(2)
    K = np.array([31792.0, 120.0 * 1987], np.float64)
    c255 = (1.0 / K).astype(np.float32)
    v = (rng.rand(3, 2, 6, 8, 3) * 255.0 * K.reshape(1, 2, 1, 1, 1)
         ).astype(np.int32).astype(np.float32)
    host = quantize_v_rgb_u8(np.asarray(v), c255)
    dev = np.asarray(jax.jit(quantize_v_rgb_u8)(jnp.asarray(v),
                                                jnp.asarray(c255)))
    assert np.array_equal(host, dev)
    host4 = quantize_v_rgb_u8(np.asarray(v[0]), c255)
    assert np.array_equal(host4, host[0])


def test_native_replay_matches_numpy_paths():
    """The fused C++ sweep replay (attack.replay_native) emits the same
    u8 frames as the numpy int replay + quantize for BOTH spaces (DSGN
    255-space and SRCNN v-space with per-sample scales)."""
    from eval_driving_safety_tpu.attack.replay_native import replay_sweep_u8
    from eval_driving_safety_tpu.attack.pgd import (replay_pgd_ints,
                                                    replay_pgd_255)
    from eval_driving_safety_tpu.data.dataset import quantize_v_rgb_u8
    rng = np.random.RandomState(4)
    shape = (2, 8, 16, 3)

    # DSGN 255-space: u8 clean, alpha=1, eps=76.5, quantize = v>>1
    u8l = rng.randint(0, 256, shape).astype(np.uint8)
    u8r = rng.randint(0, 256, shape).astype(np.uint8)
    packed = rng.randint(0, 171, (4, 2, 8, 16 * 3 // 4)).astype(np.uint8)
    native = replay_sweep_u8(u8l.astype(np.int32), packed,
                             alpha2=2, eps2=153, max2=510, c255=1.0,
                             flip_channels=False)
    if native is None:
        pytest.skip("native toolchain unavailable")
    ref = [l for l, _ in replay_pgd_255(u8l, u8r, packed, packed, eps=76.5)]
    for k in range(4):
        assert np.array_equal(native[k], ref[k]), f"255-space iter {k}"

    # SRCNN v-space: per-sample K, BGR->RGB flip, f32-mul quantize
    K = np.array([48, 80], np.int64)
    v = (rng.rand(*shape) * 255 * K.reshape(2, 1, 1, 1)).astype(np.int32)
    c255 = (1.0 / K).astype(np.float32)
    native = replay_sweep_u8(v, packed, alpha2=2 * K, eps2=5 * K,
                             max2=510 * K, c255=c255, flip_channels=True)
    ints = replay_pgd_ints(v * 2, v * 2, packed, packed,
                           alpha2=2 * K, eps2=5 * K, clip_max2=510 * K)
    for k, (v2l, _) in enumerate(ints):
        ref_q = quantize_v_rgb_u8(v2l.astype(np.float32) * np.float32(0.5),
                                  c255)
        assert np.array_equal(native[k], ref_q), f"v-space iter {k}"


def test_signs1_conversion_matches_pack_signs():
    """1-bit plane pair -> 2-bit codes (signs1_to_packed2) equals
    pack_signs exactly, with and without zeros."""
    from eval_driving_safety_tpu.attack.pgd import pack_bits, \
        signs1_to_packed2
    rng = np.random.RandomState(11)
    s = rng.randint(-1, 2, size=(4, 2, 8, 16, 3)).astype(np.float32)
    p2 = np.asarray(pack_signs(jnp.asarray(s)))
    pA = np.asarray(pack_bits(jnp.asarray(s > 0)))
    pZ = np.asarray(pack_bits(jnp.asarray(s == 0)))
    assert pA.shape == (4, 2, 8, 16 * 3 // 8)
    assert np.array_equal(signs1_to_packed2(pA, pZ), p2)
    s_nz = np.where(s == 0, -1.0, s).astype(np.float32)
    p2_nz = np.asarray(pack_signs(jnp.asarray(s_nz)))
    pA_nz = np.asarray(pack_bits(jnp.asarray(s_nz > 0)))
    assert np.array_equal(signs1_to_packed2(pA_nz), p2_nz)


def test_signs1_trajectory_replays_bitwise():
    """collect='signs1' + fetch_packed_signs reproduce the device
    iterates bit-exactly; gradients here are never exactly zero, so only
    the 1-bit positive plane is consumed (bits=1)."""
    from eval_driving_safety_tpu.data.dataset import fetch_packed_signs
    rng = np.random.RandomState(13)
    shape = (2, 8, 16, 3)
    clean_l = (rng.randint(0, 256, shape) / 255.0).astype(np.float32)
    clean_r = (rng.randint(0, 256, shape) / 255.0).astype(np.float32)
    kw = dict(alpha=1 / 255.0, eps=0.3, clip_min=0.0, clip_max=1.0)
    n = 5
    full = jax.jit(lambda l, r: pgd_attack(
        _toy_loss, l, r, num_iters=n, collect=True, **kw))(
        jnp.asarray(clean_l), jnp.asarray(clean_r))
    s1 = jax.jit(lambda l, r: pgd_attack(
        _toy_loss, l, r, num_iters=n, collect="signs1", **kw))(
        jnp.asarray(clean_l), jnp.asarray(clean_r))
    assert np.array_equal(np.asarray(full.adv_left),
                          np.asarray(s1.adv_left))
    pl, pr, bits = fetch_packed_signs(s1.trajectory[0], s1.trajectory[1])
    assert bits == 1 and pl.shape == (n, 2, 8, 16 * 3 // 8)
    from eval_driving_safety_tpu.attack.pgd import signs1_to_packed2
    replayed = list(replay_pgd(clean_l, clean_r, signs1_to_packed2(pl),
                               signs1_to_packed2(pr), **kw))
    for k in range(n):
        assert np.array_equal(replayed[k][0],
                              np.asarray(full.trajectory[0][k])), f"it {k}"
        assert np.array_equal(replayed[k][1],
                              np.asarray(full.trajectory[1][k])), f"it {k}"


def test_signs1_zero_gradient_falls_back_to_two_bit():
    """A loss with a dead input region produces exact zero gradients;
    the zero counts must trigger the zero-plane fetch (bits=2) and the
    converted codes must still replay bit-exactly."""
    from eval_driving_safety_tpu.data.dataset import fetch_packed_signs
    mask = np.ones((1, 4, 16, 3), np.float32)
    mask[:, :2] = 0.0                              # dead half: grad == 0
    jm = jnp.asarray(mask)

    def dead_loss(il, ir):
        return jnp.sum(jnp.sin(7.0 * il) * il * jm) + jnp.sum(ir * jm)

    rng = np.random.RandomState(17)
    clean = (rng.randint(0, 256, mask.shape) / 255.0).astype(np.float32)
    kw = dict(alpha=1 / 255.0, eps=0.3, clip_min=0.0, clip_max=1.0)
    n = 3
    s1 = jax.jit(lambda l, r: pgd_attack(
        dead_loss, l, r, num_iters=n, collect="signs1", **kw))(
        jnp.asarray(clean), jnp.asarray(clean))
    nz = np.asarray(s1.trajectory[0][2])
    assert nz.shape == (n,) and (nz > 0).all()
    pl, pr, bits = fetch_packed_signs(s1.trajectory[0], s1.trajectory[1])
    assert bits == 2
    full = jax.jit(lambda l, r: pgd_attack(
        dead_loss, l, r, num_iters=n, collect=True, **kw))(
        jnp.asarray(clean), jnp.asarray(clean))
    replayed = list(replay_pgd(clean, clean, pl, pr, **kw))
    for k in range(n):
        assert np.array_equal(replayed[k][0],
                              np.asarray(full.trajectory[0][k])), f"it {k}"
    # the dead region never moved (sign 0 round-tripped through the planes)
    assert np.array_equal(replayed[-1][0][:, :2], clean[:, :2])


def test_native_replay_b1_matches_two_bit():
    """The 1-bit native kernel (replay_sweep_u8 bits=1) emits frames
    byte-equal to the 2-bit kernel on the converted codes, both spaces."""
    from eval_driving_safety_tpu.attack.pgd import signs1_to_packed2
    from eval_driving_safety_tpu.attack.replay_native import replay_sweep_u8
    rng = np.random.RandomState(23)
    shape = (2, 8, 16, 3)
    pA = rng.randint(0, 256, (4, 2, 8, 16 * 3 // 8)).astype(np.uint8)
    p2 = signs1_to_packed2(pA)
    u8l = rng.randint(0, 256, shape).astype(np.int32)
    nat1 = replay_sweep_u8(u8l, pA, alpha2=2, eps2=153, max2=510,
                           c255=1.0, flip_channels=False, bits=1)
    if nat1 is None:
        pytest.skip("native toolchain unavailable")
    nat2 = replay_sweep_u8(u8l, p2, alpha2=2, eps2=153, max2=510,
                           c255=1.0, flip_channels=False, bits=2)
    assert np.array_equal(nat1, nat2)
    K = np.array([48, 80], np.int64)
    v = (rng.rand(*shape) * 255 * K.reshape(2, 1, 1, 1)).astype(np.int32)
    c255 = (1.0 / K).astype(np.float32)
    nat1 = replay_sweep_u8(v, pA, alpha2=2 * K, eps2=5 * K, max2=510 * K,
                           c255=c255, flip_channels=True, bits=1)
    nat2 = replay_sweep_u8(v, p2, alpha2=2 * K, eps2=5 * K, max2=510 * K,
                           c255=c255, flip_channels=True, bits=2)
    assert np.array_equal(nat1, nat2)
