"""DSGN compat assembly: numerical parity against torch replicas of the
upstream module graph, plus full-state-dict import with zero-unmapped-key
accounting (VERDICT r2 missing #1 — the published-.tar ingestion path,
/root/reference/attack/DSGN/pgd_attack.py:142-145)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eval_driving_safety_tpu.models.dsgn_compat import (  # noqa: E402
    CompatDeconvBn, CompatFeatureExtraction, CompatHourglass3D,
    DSGNCompatArch)
from eval_driving_safety_tpu.utils.torch_import import (  # noqa: E402
    convert_dsgn_cost_trunk, convert_dsgn_feature_extraction,
    convert_dsgn_rpn3d, discover_dsgn_arch, import_dsgn)


def _np(x):
    return x.detach().numpy()


def _nhwc(x):
    return jnp.asarray(_np(x).transpose(0, 2, 3, 1))


def _ndhwc(x):
    return jnp.asarray(_np(x).transpose(0, 2, 3, 4, 1))


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
                mod.running_mean.copy_(
                    torch.randn_like(mod.running_mean) * 0.1)
                mod.running_var.copy_(torch.rand_like(mod.running_var) + 0.5)
                mod.weight.copy_(torch.randn_like(mod.weight) * 0.2 + 1.0)
                mod.bias.copy_(torch.randn_like(mod.bias) * 0.1)


# --------------------------------------------------------------------------
# torch replicas of the upstream (PSMNet-derived) module graph — these pin
# the state-dict key layout `import_dsgn` maps (see the spec in
# models/dsgn_compat.py's docstring)
# --------------------------------------------------------------------------

def convbn(cin, cout, k, s, p, d=1):
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, k, s, p, dilation=d, bias=False),
        tnn.BatchNorm2d(cout))


def convbn_3d(cin, cout, k=3, s=1, p=1):
    return tnn.Sequential(tnn.Conv3d(cin, cout, k, s, p, bias=False),
                          tnn.BatchNorm3d(cout))


class TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride, dilation):
        super().__init__()
        self.conv1 = tnn.Sequential(
            convbn(cin, cout, 3, stride, dilation, dilation),
            tnn.ReLU(inplace=True))
        self.conv2 = convbn(cout, cout, 3, 1, dilation, dilation)
        self.downsample = tnn.Sequential(
            tnn.Conv2d(cin, cout, 1, stride, bias=False),
            tnn.BatchNorm2d(cout)) if (stride != 1 or cin != cout) else None

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        if self.downsample is not None:
            x = self.downsample(x)
        return y + x


class TFeatureExtraction(tnn.Module):
    def __init__(self, a: DSGNCompatArch):
        super().__init__()
        c = a.base_channels
        self.firstconv = tnn.Sequential(
            convbn(3, c, 3, 2, 1), tnn.ReLU(True),
            convbn(c, c, 3, 1, 1), tnn.ReLU(True),
            convbn(c, c, 3, 1, 1), tnn.ReLU(True))
        cin = c
        for li, (ch, n, st, dil) in enumerate(zip(
                a.layer_channels, a.layer_blocks, a.layer_strides,
                a.layer_dilations), start=1):
            blocks = [TBasicBlock(cin if b == 0 else ch, ch,
                                  st if b == 0 else 1, dil)
                      for b in range(n)]
            setattr(self, f"layer{li}", tnn.Sequential(*blocks))
            cin = ch
        skip_ch = a.layer_channels[-1]
        for bi, pool in enumerate(a.spp_pools, start=1):
            setattr(self, f"branch{bi}", tnn.Sequential(
                tnn.AvgPool2d((pool, pool), stride=(pool, pool)),
                convbn(skip_ch, a.spp_channels, 1, 1, 0), tnn.ReLU(True)))
        cat = (a.layer_channels[1] + skip_ch
               + len(a.spp_pools) * a.spp_channels)
        self.lastconv = tnn.Sequential(
            convbn(cat, a.last_channels, 3, 1, 1), tnn.ReLU(True),
            tnn.Conv2d(a.last_channels, a.feature_channels, 1, bias=True))
        self.arch = a

    def forward(self, x):
        x = self.firstconv(x)
        outs = []
        for li in range(1, len(self.arch.layer_blocks) + 1):
            x = getattr(self, f"layer{li}")(x)
            outs.append(x)
        raw, skip = outs[1], outs[-1]
        h, w = skip.shape[2], skip.shape[3]
        branches = []
        for bi in range(1, len(self.arch.spp_pools) + 1):
            p = getattr(self, f"branch{bi}")(skip)
            branches.append(torch.nn.functional.interpolate(
                p, size=(h, w), mode="bilinear", align_corners=False))
        x = torch.cat([raw, skip] + branches[::-1], 1)
        return self.lastconv(x)


class THourglass(tnn.Module):
    def __init__(self, cin, c):
        super().__init__()
        self.conv1 = tnn.Sequential(convbn_3d(cin, c, 3, 2, 1),
                                    tnn.ReLU(True))
        self.conv2 = convbn_3d(c, c)
        self.conv3 = tnn.Sequential(convbn_3d(c, c, 3, 2, 1), tnn.ReLU(True))
        self.conv4 = tnn.Sequential(convbn_3d(c, c), tnn.ReLU(True))
        self.conv5 = tnn.Sequential(
            tnn.ConvTranspose3d(c, c, 3, 2, 1, output_padding=1, bias=False),
            tnn.BatchNorm3d(c))
        self.conv6 = tnn.Sequential(
            tnn.ConvTranspose3d(c, cin, 3, 2, 1, output_padding=1,
                                bias=False),
            tnn.BatchNorm3d(cin))

    def forward(self, x):
        out1 = self.conv1(x)
        pre = torch.relu(self.conv2(out1))
        out2 = self.conv4(self.conv3(pre))
        post = torch.relu(self.conv5(out2) + pre)
        return self.conv6(post)


class TCostTrunk(tnn.Module):
    """dres0/dres1/hg1/classif1 — the full-3D-conv matching trunk."""

    def __init__(self, cin, cv, hg):
        super().__init__()
        self.dres0 = tnn.Sequential(convbn_3d(cin, cv), tnn.ReLU(True),
                                    convbn_3d(cv, cv), tnn.ReLU(True))
        self.dres1 = tnn.Sequential(convbn_3d(cv, cv), tnn.ReLU(True),
                                    convbn_3d(cv, cv))
        self.hg1 = THourglass(cv, hg)
        self.classif1 = tnn.Sequential(
            convbn_3d(cv, cv), tnn.ReLU(True),
            tnn.Conv3d(cv, 1, 3, 1, 1, bias=False))

    def forward(self, cost):
        x = self.dres0(cost)
        x = self.dres1(x) + x
        hg = self.hg1(x) + x
        return self.classif1(hg), hg


class TRPN3DHead(tnn.Module):
    """FCOS-style BEV towers + logits/pred/centerness heads."""

    def __init__(self, a: DSGNCompatArch):
        super().__init__()
        c, g = a.bev_channels, a.gn_groups
        def tower():
            layers = []
            for _ in range(a.tower_convs):
                layers += [tnn.Conv2d(c, c, 3, padding=1),
                           tnn.GroupNorm(g, c), tnn.ReLU(True)]
            return tnn.Sequential(*layers)
        self.cls_tower = tower()
        self.bbox_tower = tower()
        self.cls_logits = tnn.Conv2d(c, a.num_classes, 3, padding=1)
        self.bbox_pred = tnn.Conv2d(c, 8, 3, padding=1)
        self.centerness = tnn.Conv2d(c, 1, 3, padding=1)

    def forward(self, bev):
        ct = self.cls_tower(bev)
        bt = self.bbox_tower(bev)
        return self.cls_logits(ct), self.bbox_pred(bt), self.centerness(bt)


class TDSGNUpstream(tnn.Module):
    """The parameterized layers of the upstream StereoNet graph under their
    upstream names — geometry ops (PSV warp, voxel resample) are weight-free
    and excluded (proven exact separately, tests/test_cost_volume.py)."""

    def __init__(self, a: DSGNCompatArch, num_voxels_y: int):
        super().__init__()
        self.feature_extraction = TFeatureExtraction(a)
        trunk = TCostTrunk(2 * a.feature_channels, a.cv_channels,
                           a.hg_channels)
        self.dres0, self.dres1 = trunk.dres0, trunk.dres1
        self.hg1, self.classif1 = trunk.hg1, trunk.classif1
        self.rpn3d_conv = convbn_3d(a.cv_channels, a.gv_channels)
        self.rpn3d_conv2 = convbn_3d(a.gv_channels, a.gv_channels)
        self.rpn3d_conv3 = convbn(num_voxels_y * a.gv_channels,
                                  a.bev_channels, 3, 1, 1)
        self.rpn3d = TRPN3DHead(a)


TINY = DSGNCompatArch.tiny()


def test_feature_extraction_parity():
    tm = TFeatureExtraction(TINY).eval()
    _randomize_bn(tm)
    x = torch.randn(1, 3, 64, 96)
    want = _np(tm(x)).transpose(0, 2, 3, 1)
    sd = {f"feature_extraction.{k}": _np(v)
          for k, v in tm.state_dict().items()}
    params = convert_dsgn_feature_extraction(sd, TINY)
    fm = CompatFeatureExtraction(TINY)
    got = np.asarray(fm.apply({"params": params}, _nhwc(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_hourglass_parity():
    tm = THourglass(8, 16).eval()
    _randomize_bn(tm)
    x = torch.randn(1, 8, 8, 8, 12)
    want = _np(tm(x)).transpose(0, 2, 3, 4, 1)
    sd = {f"hg1.{k}": _np(v) for k, v in tm.state_dict().items()}
    params = convert_dsgn_cost_trunk(_FilledTrunkSd(sd))["hg1"]
    fm = CompatHourglass3D(16)
    got = np.asarray(fm.apply({"params": params}, _ndhwc(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


class _FilledTrunkSd(dict):
    """Wraps an hg1-only state dict with zero dres/classif entries so the
    shared trunk converter can run for a single-module test."""

    def __init__(self, base, cv=8):
        super().__init__(base)
        z3 = np.zeros((cv, cv, 3, 3, 3), np.float32)
        for pre in ("dres0.0", "dres0.2", "dres1.0", "dres1.2",
                    "classif1.0"):
            self[f"{pre}.0.weight"] = (
                np.zeros((cv, 2 * cv, 3, 3, 3), np.float32)
                if pre == "dres0.0" else z3)
            for suf, val in (("weight", 1.0), ("bias", 0.0),
                             ("running_mean", 0.0), ("running_var", 1.0)):
                self[f"{pre}.1.{suf}"] = np.full((cv,), val, np.float32)
        self["classif1.2.weight"] = np.zeros((1, cv, 3, 3, 3), np.float32)


def test_cost_trunk_parity():
    """dres0 -> dres1(+res) -> hg1(+res) -> classif1, end to end."""
    tm = TCostTrunk(16, 8, 16).eval()
    _randomize_bn(tm)
    cost = torch.randn(1, 16, 8, 8, 12)
    want_score, want_hg = tm(cost)
    sd = {k: _np(v) for k, v in tm.state_dict().items()}
    p = convert_dsgn_cost_trunk(sd)

    from eval_driving_safety_tpu.models.dsgn_compat import CompatConvBn

    def fwd(x):
        x = CompatConvBn(8, dims=3).apply(
            {"params": p["dres0_0"]}, x)
        x = CompatConvBn(8, dims=3).apply(
            {"params": p["dres0_1"]}, x)
        y = CompatConvBn(8, dims=3).apply(
            {"params": p["dres1_0"]}, x)
        y = CompatConvBn(8, dims=3, relu=False).apply(
            {"params": p["dres1_1"]}, y)
        x = y + x
        hg = CompatHourglass3D(16).apply(
            {"params": p["hg1"]}, x) + x
        s = CompatConvBn(8, dims=3).apply(
            {"params": p["classif1_0"]}, hg)
        import flax.linen as nn
        s = nn.Conv(1, (3, 3, 3), padding="SAME", use_bias=False).apply(
            {"params": p["classif1_1"]}, s)
        return s, hg

    got_score, got_hg = fwd(_ndhwc(cost))
    np.testing.assert_allclose(np.asarray(got_hg),
                               _np(want_hg).transpose(0, 2, 3, 4, 1),
                               atol=3e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_score),
                               _np(want_score).transpose(0, 2, 3, 4, 1),
                               atol=3e-4, rtol=1e-4)


def test_bev_head_parity():
    tm = TRPN3DHead(TINY).eval()
    x = torch.randn(1, TINY.bev_channels, 6, 10)
    want = tuple(_np(t).transpose(0, 2, 3, 1) for t in tm(x))
    sd = {f"rpn3d.{k}": _np(v) for k, v in tm.state_dict().items()}
    # the converter also eats the rpn3d_conv* blocks — provide zeros
    for pre, cin, cout, rank in (("rpn3d_conv", 4, 4, 3),
                                 ("rpn3d_conv2", 4, 4, 3),
                                 ("rpn3d_conv3", 4, TINY.bev_channels, 2)):
        k = (3,) * rank
        sd[f"{pre}.0.weight"] = np.zeros((cout, cin) + k, np.float32)
        for suf, val in (("weight", 1.0), ("bias", 0.0),
                         ("running_mean", 0.0), ("running_var", 1.0)):
            sd[f"{pre}.1.{suf}"] = np.full((cout,), val, np.float32)
    p = convert_dsgn_rpn3d(sd, TINY)

    from eval_driving_safety_tpu.models.dsgn_compat import CompatTowerBlock
    import flax.linen as nn

    ct = bt = _nhwc(x)
    for i in range(TINY.tower_convs):
        ct = CompatTowerBlock(TINY.bev_channels, TINY.gn_groups).apply(
            {"params": p[f"cls_tower_{i}"]}, ct)
        bt = CompatTowerBlock(TINY.bev_channels, TINY.gn_groups).apply(
            {"params": p[f"bbox_tower_{i}"]}, bt)
    got = (
        nn.Conv(TINY.num_classes, (3, 3), padding="SAME").apply(
            {"params": p["cls_logits"]}, ct),
        nn.Conv(8, (3, 3), padding="SAME").apply(
            {"params": p["bbox_pred"]}, bt),
        nn.Conv(1, (3, 3), padding="SAME").apply(
            {"params": p["centerness"]}, bt),
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-4, rtol=1e-4)


def _tiny_cfg():
    import dataclasses

    from eval_driving_safety_tpu.config import DSGNConfig
    return dataclasses.replace(DSGNConfig.tiny(), dtype="float32")


def test_import_dsgn_zero_unmapped_and_forward():
    """Synthetic upstream-shaped DSGN state dict (DataParallel-wrapped like
    the published .tar) imports with unmapped == [], the discovered arch
    matches, the tree shapes equal model.init's, and the grafted model runs
    a finite forward (VERDICT r2 next #1)."""
    cfg = _tiny_cfg()
    tm = TDSGNUpstream(TINY, cfg.num_voxels_y).eval()
    _randomize_bn(tm)
    sd = {f"module.{k}": _np(v) for k, v in tm.state_dict().items()}
    sd["module.dres0.1.num_batches_tracked"] = np.zeros((), np.int64)

    imported = import_dsgn(sd)
    assert imported["unmapped"] == [], imported["unmapped"]
    import dataclasses
    assert dataclasses.replace(imported["arch"], spp_pools=TINY.spp_pools) == TINY

    from eval_driving_safety_tpu.models.dsgn_compat import DSGNCompat
    model = DSGNCompat(cfg, imported["arch"])
    h, w = cfg.height, cfg.width
    il = jnp.linspace(0, 1, h * w * 3).reshape(1, h, w, 3)
    ir = il * 0.9
    calib = (jnp.full((1,), 720.0), jnp.full((1,), 0.54),
             jnp.full((1,), w / 2.0), jnp.full((1,), h / 2.0))
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), il, ir, *calib))
    want = jax.tree_util.tree_map(lambda s: s.shape, init["params"])
    got = jax.tree_util.tree_map(np.shape, imported["params"])
    assert want == got, f"tree mismatch"

    out = model.apply({"params": imported["params"]}, il, ir, *calib)
    assert np.isfinite(np.asarray(out["depth_preds"][0])).all()
    assert np.isfinite(np.asarray(out["bbox_cls"])).all()
    assert out["bbox_cls"].shape == (1, cfg.num_voxels_z, cfg.num_voxels_x,
                                     TINY.num_classes)
    assert out["bbox_reg"].shape[-1] == 8


def test_discover_dsgn_arch_reads_widths():
    tm = TDSGNUpstream(TINY, 4).eval()
    sd = {k: _np(v) for k, v in tm.state_dict().items()}
    a = discover_dsgn_arch(sd)
    assert a.layer_blocks == TINY.layer_blocks
    assert a.layer_channels == TINY.layer_channels
    assert a.cv_channels == TINY.cv_channels
    assert a.hg_channels == TINY.hg_channels
    assert a.tower_convs == TINY.tower_convs
    assert a.num_classes == TINY.num_classes


@pytest.mark.slow
@pytest.mark.medium
def test_load_dsgn_checkpoint_roundtrip(tmp_path):
    """torch.save -> load_dsgn_checkpoint -> attack gradients flow to the
    input pixels through the compat assembly (the reference's usage:
    attacked through torch.load'ed weights, pgd_attack.py:142-145,308)."""
    cfg = _tiny_cfg()
    tm = TDSGNUpstream(TINY, cfg.num_voxels_y).eval()
    _randomize_bn(tm)
    path = str(tmp_path / "dsgn_compat.tar")
    torch.save({"state_dict": {f"module.{k}": v
                               for k, v in tm.state_dict().items()}}, path)

    from eval_driving_safety_tpu.models.dsgn_compat import \
        load_dsgn_checkpoint
    model, variables = load_dsgn_checkpoint(path, cfg)
    h, w = cfg.height, cfg.width
    k = jax.random.PRNGKey(0)
    il = jax.random.uniform(jax.random.fold_in(k, 1), (1, h, w, 3))
    ir = jax.random.uniform(jax.random.fold_in(k, 2), (1, h, w, 3))
    calib = (jnp.full((1,), 720.0), jnp.full((1,), 0.54),
             jnp.full((1,), w / 2.0), jnp.full((1,), h / 2.0))

    from eval_driving_safety_tpu.models.rpn3d_loss import dsgn_total_loss
    boxes = jnp.zeros((1, 4, 8)).at[:, 0].set(
        jnp.array([2.0, 1.6, 20.0, 1.5, 1.7, 4.0, 0.3, 1.0]))
    nb = jnp.ones((1,), jnp.int32)
    depth_gt = jnp.full((1, h, w), 20.0)

    def loss_fn(l, r):
        out = model.apply(variables, l, r, *calib)
        total, _ = dsgn_total_loss(out, depth_gt, boxes, nb, cfg)
        return total

    gl, gr = jax.grad(loss_fn, argnums=(0, 1))(il, ir)
    assert float(jnp.abs(gl).max()) > 0.0
    assert float(jnp.abs(gr).max()) > 0.0


@pytest.mark.parametrize("stride", [1, 2])
def test_conv3d_slice2d_matches_nn_conv(stride):
    """ops.conv3d_slice2d == nn.Conv(F,(3,3,3)) exactly (same kernel
    tensor), for both strides the compat assembly uses."""
    from flax import linen as nn

    from eval_driving_safety_tpu.ops.conv3d_slice2d import conv3d_slice2d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 6, 10, 5).astype(np.float32))
    ref = nn.Conv(7, (3, 3, 3), strides=(stride,) * 3,
                  padding=[(1, 1)] * 3, use_bias=False)
    params = ref.init(jax.random.PRNGKey(0), x)
    want = ref.apply(params, x)
    got = conv3d_slice2d(x, params["params"]["kernel"], stride)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv3d_tapconcat_matches_nn_conv(stride):
    """ops.conv3d_tapconcat == nn.Conv(F,(3,3,3)) exactly (same kernel
    tensor), for both strides the compat assembly uses."""
    from flax import linen as nn

    from eval_driving_safety_tpu.ops.conv3d_slice2d import conv3d_tapconcat

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 6, 10, 5).astype(np.float32))
    ref = nn.Conv(7, (3, 3, 3), strides=(stride,) * 3,
                  padding=[(1, 1)] * 3, use_bias=False)
    params = ref.init(jax.random.PRNGKey(0), x)
    want = ref.apply(params, x)
    got = conv3d_tapconcat(x, params["params"]["kernel"], stride)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv3d_nstack_matches_slice2d_bitwise(stride):
    """ops.conv3d_nstack is BIT-IDENTICAL to conv3d_slice2d (each stacked
    tap is the same conv2d contraction; taps added in the same order) and
    matches nn.Conv(F,(3,3,3)) to tolerance, for both strides."""
    from flax import linen as nn

    from eval_driving_safety_tpu.ops.conv3d_slice2d import (conv3d_nstack,
                                                            conv3d_slice2d)

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, 8, 6, 10, 5).astype(np.float32))
    ref = nn.Conv(7, (3, 3, 3), strides=(stride,) * 3,
                  padding=[(1, 1)] * 3, use_bias=False)
    params = ref.init(jax.random.PRNGKey(0), x)
    want = ref.apply(params, x)
    got = jax.jit(conv3d_nstack, static_argnums=2)(
        x, params["params"]["kernel"], stride)
    via_slice = jax.jit(conv3d_slice2d, static_argnums=2)(
        x, params["params"]["kernel"], stride)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    assert np.array_equal(np.asarray(got), np.asarray(via_slice))


@pytest.mark.parametrize("method", ["slice2d", "concat", "nstack"])
def test_compat_convbn_conv3d_methods_share_checkpoints(method):
    """CompatConvBn's reformulated conv3d methods consume the "xla"
    variant's exact parameter tree and produce the same output and input
    grad."""
    from eval_driving_safety_tpu.models.dsgn_compat import CompatConvBn

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 6, 10, 4).astype(np.float32))
    mx = CompatConvBn(6, dims=3, stride=2, conv3d_method="xla")
    ms = CompatConvBn(6, dims=3, stride=2, conv3d_method=method)
    params = mx.init(jax.random.PRNGKey(0), x)
    bn = params["params"]["bn"]
    for k in bn:
        bn[k] = jnp.asarray(rng.rand(*bn[k].shape).astype(np.float32) + 0.5)
    np.testing.assert_allclose(np.asarray(mx.apply(params, x)),
                               np.asarray(ms.apply(params, x)),
                               atol=1e-5, rtol=1e-5)
    gx = jax.grad(lambda a: (mx.apply(params, a) ** 2).sum())(x)
    gs = jax.grad(lambda a: (ms.apply(params, a) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gs),
                               atol=1e-4, rtol=1e-4)


def test_conv_transpose3d_depthpoly_matches_nn_convtranspose():
    """ops.conv_transpose3d_depthpoly == nn.ConvTranspose(F,(3,3,3),s=2,
    padding=[(1,2)]*3) exactly, and CompatDeconvBn's two methods share one
    parameter tree (output + input grad)."""
    from flax import linen as nn

    from eval_driving_safety_tpu.models.dsgn_compat import CompatDeconvBn
    from eval_driving_safety_tpu.ops.conv3d_slice2d import \
        conv_transpose3d_depthpoly

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 4, 3, 5, 6).astype(np.float32))
    ref = nn.ConvTranspose(7, (3, 3, 3), strides=(2, 2, 2),
                           padding=[(1, 2)] * 3, use_bias=False)
    params = ref.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(conv_transpose3d_depthpoly(
            x, params["params"]["kernel"])),
        np.asarray(ref.apply(params, x)), atol=1e-5, rtol=1e-5)

    mx = CompatDeconvBn(7, conv3d_method="xla")
    ms = CompatDeconvBn(7, conv3d_method="slice2d")
    p2 = mx.init(jax.random.PRNGKey(1), x)
    bn = p2["params"]["bn"]
    for k in bn:
        bn[k] = jnp.asarray(rng.rand(*bn[k].shape).astype(np.float32) + 0.5)
    np.testing.assert_allclose(np.asarray(mx.apply(p2, x)),
                               np.asarray(ms.apply(p2, x)),
                               atol=1e-5, rtol=1e-5)
    gx = jax.grad(lambda a: (mx.apply(p2, a) ** 2).sum())(x)
    gs = jax.grad(lambda a: (ms.apply(p2, a) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gs),
                               atol=1e-4, rtol=1e-4)


def test_bev_collapse_matches_torch_view():
    """Pins the Y-collapse seam feeding rpn3d_conv3: upstream merges (C, Y)
    into the conv's input channels via a contiguous `view(N, C*Y, Z, X)` —
    c-outer / y-inner. The compat collapse must produce the same flattened
    ordering or imported rpn3d_conv3 weights run on permuted channels."""
    from eval_driving_safety_tpu.models.dsgn_compat import (CompatConvBn,
                                                            bev_collapse)

    c, yv, z, xv = 4, 5, 6, 10
    torch.manual_seed(3)
    vt = torch.randn(1, c, yv, z, xv)
    conv3 = convbn(c * yv, TINY.bev_channels, 3, 1, 1).eval()
    _randomize_bn(conv3)
    want = _np(torch.relu(conv3(vt.reshape(1, c * yv, z, xv))))
    want = want.transpose(0, 2, 3, 1)                     # (1, Z, X, bev)

    sd = {f"rpn3d_conv3.{k}": _np(v) for k, v in conv3.state_dict().items()}
    tm = TRPN3DHead(TINY)
    sd.update({f"rpn3d.{k}": _np(v) for k, v in tm.state_dict().items()})
    for pre in ("rpn3d_conv", "rpn3d_conv2"):
        sd[f"{pre}.0.weight"] = np.zeros((c, c, 3, 3, 3), np.float32)
        for suf, val in (("weight", 1.0), ("bias", 0.0),
                         ("running_mean", 0.0), ("running_var", 1.0)):
            sd[f"{pre}.1.{suf}"] = np.full((c,), val, np.float32)
    p = convert_dsgn_rpn3d(sd, TINY)

    # torch (N, C, Y, Z, X) -> flax voxel layout (B, Z, Y, X, C)
    voxels = jnp.asarray(_np(vt).transpose(0, 3, 2, 4, 1))
    bev = bev_collapse(voxels)
    got = CompatConvBn(TINY.bev_channels, 3, 1).apply(
        {"params": p["rpn3d_conv3"]}, bev)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)
