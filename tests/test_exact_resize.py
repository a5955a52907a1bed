"""Exact integer bilinear resize: host/device bit-parity and fidelity to
the float resize it replaces (the SRCNN transfer-minimal ingest)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eval_driving_safety_tpu.config import SRCNNInputConfig
from eval_driving_safety_tpu.data.dataset import (KittiSample,
                                                  prepare_srcnn_batch,
                                                  prepare_srcnn_batch_u8,
                                                  srcnn_clean01_device,
                                                  srcnn_clean01_host)
from eval_driving_safety_tpu.data.exact_resize import (bilinear_axis_weights,
                                                       resize_v2_host)
from eval_driving_safety_tpu.data.kitti import Calibration


def _samples(rng, sizes, u8=True):
    out = []
    for i, (h, w) in enumerate(sizes):
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        im2 = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        if not u8:
            img = img.astype(np.float32) / 255.0
            im2 = im2.astype(np.float32) / 255.0
        out.append(KittiSample(f"{i:06d}", img, im2, Calibration.default(),
                               [], (h, w)))
    return out


def test_axis_weights_identity_when_same_size():
    w = bilinear_axis_weights(375, 375)
    assert np.array_equal(w.i0, np.arange(375))
    assert np.all(w.r == 0)


def test_resize_matches_float_bilinear():
    """Integer resize == jax.image.resize 'linear' up to f32 accumulation
    error (the integer path is the exactly-rounded rational value)."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (75, 124, 3)).astype(np.uint8)
    wh = bilinear_axis_weights(75, 120)
    ww = bilinear_axis_weights(124, 198)
    v2 = resize_v2_host(img, wh, ww).astype(np.float64) / (wh.den * ww.den)
    ref = np.asarray(jax.image.resize(
        jnp.asarray(img.astype(np.float32)), (120, 198, 3), "linear"))
    assert np.abs(v2 - ref).max() < 2e-3


@pytest.mark.parametrize("sizes", [
    [(96, 320)],                          # tiny config scale
    [(75, 248), (74, 250)],               # mixed KITTI-like sizes, one batch
])
def test_device_and_host_clean_bit_identical(sizes):
    """The ingest contract: device clean01 (u8 upload + on-device integer
    resize + one f32 multiply) == host clean01 bitwise, on every backend
    this runs on (CPU in CI, the real TPU when available)."""
    cfg = SRCNNInputConfig(height=120, width=400)
    rng = np.random.RandomState(1)
    b = prepare_srcnn_batch_u8(_samples(rng, sizes), cfg)
    host_l, host_r = srcnn_clean01_host(b)
    dev_args = {k: jnp.asarray(b[k])
                for k in ("ih", "iw", "den_h", "den_w", "wmask", "c")}

    @jax.jit
    def ingest(img, args):
        return srcnn_clean01_device({**args, "ih": args["ih"],
                                     "iw": args["iw"]}, img)

    dev_l = np.asarray(ingest(jnp.asarray(b["im_left_u8"]), dev_args))
    dev_r = np.asarray(ingest(jnp.asarray(b["im_right_u8"]), dev_args))
    assert np.array_equal(host_l, dev_l)
    assert np.array_equal(host_r, dev_r)
    assert host_l.dtype == np.float32 and 0.0 <= host_l.min() \
        and host_l.max() <= 1.0


def test_clean01_matches_float_prep_values():
    """The new BGR[0,1] clean pair equals the float path's mean-subtracted
    BGR255 clean (prepare_srcnn_batch) up to f32 resize accumulation
    error, including the width padding convention (0 <-> -means)."""
    cfg = SRCNNInputConfig(height=120, width=400)
    rng = np.random.RandomState(2)
    sizes = [(75, 250)]
    su8 = _samples(rng, sizes)
    rng = np.random.RandomState(2)
    sf = _samples(rng, sizes, u8=False)
    bu = prepare_srcnn_batch_u8(su8, cfg)
    bf = prepare_srcnn_batch(sf, cfg)
    hl, _ = srcnn_clean01_host(bu)
    means = np.asarray(cfg.pixel_means_bgr, np.float32)
    old01 = (bf["im_left"] + means) / 255.0
    assert np.abs(hl - old01).max() < 2e-3


def test_fused_cleanv_q0_matches_two_pass():
    """The fused native resize+quantize (srcnn_cleanv_q0_host /
    resize_v2_q0) returns v bit-equal to srcnn_cleanv_host and q0
    bit-equal to quantize_v_batch_u8(v) — the sweep's replay seed and
    iteration-0 frames in one pass, incl. width-cropped and width-padded
    samples (r5 host-pipeline fusion)."""
    from eval_driving_safety_tpu.data.dataset import (quantize_v_batch_u8,
                                                      srcnn_cleanv_host,
                                                      srcnn_cleanv_q0_host)
    cfg = SRCNNInputConfig(height=120, width=400)
    rng = np.random.RandomState(5)
    # 75 -> 120 scale 1.6: 260 -> 416 crops at 400; 200 -> 320 pads
    for sizes in ([(75, 260)], [(75, 200)], [(60, 250), (75, 260)]):
        b = prepare_srcnn_batch_u8(_samples(rng, sizes), cfg)
        v2l, v2r = srcnn_cleanv_host(b)
        v2l_f, v2r_f, q0l, q0r = srcnn_cleanv_q0_host(b)
        assert np.array_equal(v2l_f, v2l), sizes
        assert np.array_equal(v2r_f, v2r), sizes
        assert np.array_equal(q0l, quantize_v_batch_u8(v2l, b["c255"])), sizes
        assert np.array_equal(q0r, quantize_v_batch_u8(v2r, b["c255"])), sizes


def test_width_crop_1984_is_exact_crop_of_1987_oracle():
    """config.py:55 uses width 1984 vs the reference's 600x1987
    (/root/reference/attack/Stereo-RCNN/patch_attack.py:170-171). The
    resize weights are built for the FULL round(ow*scale) grid and only
    CROPPED to the static width (bilinear_axis_weights(crop=...)), so the
    1984 network input must be BIT-EXACTLY the first 1984 columns of a
    true-1987 oracle (static width 2016 >= 1987): the whole 1984-vs-1987
    delta is the dropped 3 net-pixel right band (~1.9 px at KITTI
    original scale), not a resampling shift (VERDICT r4 next #7)."""
    import dataclasses
    from eval_driving_safety_tpu.data.dataset import prepare_srcnn_batch_u8

    rng = np.random.RandomState(11)
    samples = _samples(rng, [(375, 1242)])
    cfg_pipe = SRCNNInputConfig(height=600, width=1984)
    cfg_oracle = SRCNNInputConfig(height=600, width=2016)
    bp = prepare_srcnn_batch_u8(samples, cfg_pipe)
    bo = prepare_srcnn_batch_u8(samples, cfg_oracle)
    # the true full-resolution grid is 1987 wide: round(1242 * 600/375)
    assert bp["net_hw"][0] == (600, 1984)
    assert bo["net_hw"][0] == (600, 1987)
    pl, pr = srcnn_clean01_host(bp)
    ol, orr = srcnn_clean01_host(bo)
    # bit-exact crop: identical f32 values on every surviving column
    assert np.array_equal(pl[0], ol[0, :, :1984])
    assert np.array_equal(pr[0], orr[0, :, :1984])
    # and the oracle's extra content is exactly the 3-column band
    assert np.abs(ol[0, :, 1984:1987]).max() > 0
    assert np.abs(ol[0, :, 1987:]).max() == 0
