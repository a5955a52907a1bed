"""Torch-checkpoint conversion: numerical parity on hand-built modules."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eval_driving_safety_tpu.models.common import FrozenBatchNorm  # noqa: E402
from eval_driving_safety_tpu.models.resnet import Bottleneck, ResNet  # noqa: E402
from eval_driving_safety_tpu.utils.torch_import import (  # noqa: E402
    bn_params, conv_kernel, convert_torchvision_resnet, dense_kernel,
    load_torch_state_dict)


def _np(x):
    return x.detach().numpy()


def test_conv_kernel_parity():
    tconv = tnn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    x = torch.randn(1, 3, 16, 16)
    want = _np(tconv(x)).transpose(0, 2, 3, 1)
    from flax import linen as nn
    fconv = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False)
    params = {"params": {"kernel": conv_kernel(_np(tconv.weight))}}
    got = np.asarray(fconv.apply(params, jnp.asarray(
        _np(x).transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bn_parity():
    tbn = tnn.BatchNorm2d(8).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.randn(8))
        tbn.bias.copy_(torch.randn(8))
        tbn.running_mean.copy_(torch.randn(8))
        tbn.running_var.copy_(torch.rand(8) + 0.5)
    x = torch.randn(1, 8, 4, 4)
    want = _np(tbn(x)).transpose(0, 2, 3, 1)
    sd = {f"bn.{k}": _np(v) for k, v in tbn.state_dict().items()}
    fbn = FrozenBatchNorm(8)
    got = np.asarray(fbn.apply({"params": bn_params(sd, "bn")},
                               jnp.asarray(_np(x).transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5)


class TorchBottleneck(tnn.Module):
    """torchvision-style bottleneck (stride on the 3x3)."""

    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU()
        self.downsample = tnn.Sequential(
            tnn.Conv2d(cin, cout, 1, stride, bias=False),
            tnn.BatchNorm2d(cout)) if (cin != cout or stride != 1) else None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * 0.1)
                mod.running_var.copy_(torch.rand_like(mod.running_var) + 0.5)
                mod.weight.copy_(torch.randn_like(mod.weight) * 0.2 + 1.0)
                mod.bias.copy_(torch.randn_like(mod.bias) * 0.1)


def test_bottleneck_block_parity():
    tb = TorchBottleneck(16, 8, stride=2).eval()
    _randomize_bn(tb)
    x = torch.randn(1, 16, 12, 12)
    want = _np(tb(x)).transpose(0, 2, 3, 1)
    sd = {f"layer1.0.{k}": _np(v) for k, v in tb.state_dict().items()}
    from eval_driving_safety_tpu.utils.torch_import import convert_bottleneck
    converted = {"layer1_block0": convert_bottleneck(sd, "layer1.0.")}
    fb = Bottleneck(8, stride=2)
    got = np.asarray(fb.apply({"params": converted["layer1_block0"]},
                              jnp.asarray(_np(x).transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_full_tiny_resnet_parity():
    """stem + 2 stages vs a torch equivalent, converted end-to-end."""
    class TorchTiny(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 8, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(8)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = tnn.Sequential(TorchBottleneck(8, 8))
            self.layer2 = tnn.Sequential(TorchBottleneck(32, 16, 2))

        def forward(self, x):
            y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            return self.layer2(self.layer1(y))

    tm = TorchTiny().eval()
    _randomize_bn(tm)
    x = torch.randn(1, 3, 32, 32)
    want = _np(tm(x)).transpose(0, 2, 3, 1)
    sd = {k: _np(v) for k, v in tm.state_dict().items()}
    converted = convert_torchvision_resnet(sd, block_counts=(1, 1))
    fm = ResNet(block_counts=(1, 1), width=8)
    got = fm.apply({"params": converted},
                   jnp.asarray(_np(x).transpose(0, 2, 3, 1)))[-1]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_dense_kernel_and_state_dict_loader(tmp_path):
    lin = tnn.Linear(4, 2)
    x = torch.randn(3, 4)
    want = _np(lin(x))
    from flax import linen as nn
    fd = nn.Dense(2)
    got = np.asarray(fd.apply(
        {"params": {"kernel": dense_kernel(_np(lin.weight)),
                    "bias": _np(lin.bias)}}, jnp.asarray(_np(x))))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # reference-style wrapper checkpoint with uncert
    path = str(tmp_path / "ckpt.pth")
    torch.save({"model": lin.state_dict(),
                "uncert": torch.arange(6).float()}, path)
    sd, uncert = load_torch_state_dict(path)
    assert set(sd) == {"weight", "bias"}
    np.testing.assert_allclose(uncert, np.arange(6, dtype=np.float32))


def test_stereo_rcnn_checkpoint_conversion_shapes():
    """Synthetic upstream-shaped state dict maps onto the flax tree and the
    resulting params run a forward pass."""
    from eval_driving_safety_tpu.config import StereoRCNNConfig
    from eval_driving_safety_tpu.models.stereo_rcnn import StereoRCNN
    from eval_driving_safety_tpu.utils.torch_import import \
        convert_stereo_rcnn_checkpoint

    cfg = StereoRCNNConfig.tiny()
    wid = cfg.backbone_width
    rng = np.random.RandomState(0)

    def t(*shape):
        return rng.rand(*shape).astype(np.float32) * 0.1

    sd = {"RCNN_layer0.0.weight": t(wid, 3, 7, 7)}
    for suf, n in (("weight", wid), ("bias", wid), ("running_mean", wid),
                   ("running_var", wid)):
        sd[f"RCNN_layer0.1.{suf}"] = t(n) + (1.0 if "var" in suf else 0.0)
    cin = wid
    for stage, blocks in enumerate(cfg.backbone_blocks, start=1):
        width = wid * (2 ** (stage - 1))
        cout = width * 4
        for b in range(blocks):
            pre = f"RCNN_layer{stage}.{b}."
            sd[pre + "conv1.weight"] = t(width, cin, 1, 1)
            sd[pre + "conv2.weight"] = t(width, width, 3, 3)
            sd[pre + "conv3.weight"] = t(cout, width, 1, 1)
            for i, ch in ((1, width), (2, width), (3, cout)):
                for suf in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{pre}bn{i}.{suf}"] = \
                        t(ch) + (1.0 if "var" in suf else 0.0)
            if b == 0:
                sd[pre + "downsample.0.weight"] = t(cout, cin, 1, 1)
                for suf in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{pre}downsample.1.{suf}"] = \
                        t(cout) + (1.0 if "var" in suf else 0.0)
            cin = cout
    ch = cfg.fpn_channels
    c5 = wid * 8 * 4
    for name, cin_, k in (("RCNN_toplayer", c5, 1),
                          ("RCNN_latlayer1", c5 // 2, 1),
                          ("RCNN_latlayer2", c5 // 4, 1),
                          ("RCNN_latlayer3", c5 // 8, 1),
                          ("RCNN_smooth1", ch, 3), ("RCNN_smooth2", ch, 3),
                          ("RCNN_smooth3", ch, 3)):
        sd[name + ".weight"] = t(ch, cin_, k, k)
        sd[name + ".bias"] = t(ch)
    sd["RCNN_rpn.RPN_Conv.weight"] = t(512, ch, 3, 3)
    sd["RCNN_rpn.RPN_Conv.bias"] = t(512)
    sd["RCNN_rpn.RPN_cls_score.weight"] = t(6, 1024, 1, 1)
    sd["RCNN_rpn.RPN_cls_score.bias"] = t(6)
    sd["RCNN_rpn.RPN_bbox_pred_left_right.weight"] = t(18, 1024, 1, 1)
    sd["RCNN_rpn.RPN_bbox_pred_left_right.bias"] = t(18)

    converted = convert_stereo_rcnn_checkpoint(sd)
    model = StereoRCNN(cfg)
    h, w = cfg.input.height, cfg.input.width
    x = jnp.zeros((1, h, w, 3))
    params = model.init(jax.random.PRNGKey(0), x, x, mode="infer")
    import flax
    tree = flax.core.unfreeze(params) if hasattr(params, "unfreeze") \
        else dict(params)
    for mod in ("backbone", "fpn", "rpn"):
        want = jax.tree_util.tree_map(np.shape, tree["params"][mod])
        got = jax.tree_util.tree_map(np.shape, converted[mod])
        assert want == got, f"{mod} tree mismatch"
        tree["params"][mod] = converted[mod]
    out = model.apply(tree, x, x, mode="infer")
    assert np.isfinite(np.asarray(out.cls_prob)).all()
