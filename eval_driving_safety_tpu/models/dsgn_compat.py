"""DSGN checkpoint-compat assembly: the upstream layer topology in Flax.

Capability parity target: the reference loads the PUBLISHED DSGN checkpoint
with torch.load and runs it unchanged
(/root/reference/attack/DSGN/pgd_attack.py:142-145; the .tar is saved after
an nn.DataParallel wrap, predict_and_save_pgd.py:161-166). The fast-path
model (`models/dsgn.py`) is a TPU-first redesign whose factorized (2+1)D
hourglass is weight-incompatible with the upstream full-3D-conv stack, so
this module provides a second assembly whose MODULE GRAPH mirrors the
upstream state dict:

* `feature_extraction` — PSMNet-style extractor: `firstconv` (3x convbn,
  stride 2), `layer1..layer4` (BasicBlock stacks, stride-2 in layer2,
  dilation in layer4), SPP `branch1..branch4` (avg-pool + 1x1 convbn +
  upsample), `lastconv` (convbn 3x3 + biased 1x1 conv) -> stride-4 stereo
  features;
* `dres0`/`dres1` — 3D convbn blocks on the concat cost volume (+residual);
* `hg1` — ONE full 3D-conv hourglass (convbn_3d down x2, ConvTranspose3d
  up x2 with pre/post skip adds, PSMNet ordering);
* `classif1` — 3D convbn + 1-channel Conv3d matching score;
* `rpn3d_conv`/`rpn3d_conv2`/`rpn3d_conv3` — 3D convbn into the geometric
  volume, 3D convbn on voxels, 2D convbn on the Y-collapsed BEV plane;
* `rpn3d.cls_tower`/`rpn3d.bbox_tower` + `cls_logits`/`bbox_pred`/
  `centerness` — FCOS-style BEV head (conv + GroupNorm + relu towers).

The WEIGHT-FREE geometry (plane-sweep warp, frustum->voxel resample) reuses
`ops.cost_volume`, whose einsum formulation is proven numerically exact
against the gather formulation (`tests/test_cost_volume.py`) — weight
compatibility is a property of parameterized layers only, so the MXU-native
warp transfers to the compat assembly unchanged.

The exact key layout this maps is defined by `utils.torch_import.import_dsgn`
(discovery-driven: block counts, channel widths, tower depth and the number
of SPP branches are all read from the state dict, not assumed). Until the
published .tar is mounted in an environment, the layout is pinned by the
torch replicas in `tests/test_torch_import.py`/`tests/test_dsgn_compat.py`;
`import_dsgn` reports every unconsumed key so a drifted real checkpoint is
diagnosable rather than silently wrong (PARITY.md "checkpoint ingestion").

Outputs use the same keys as the fast model (`depth_preds`, `bbox_cls`,
`bbox_reg`, `bbox_centerness`), so the whole attack / postprocess / export
stack (`attack/*`, `inference/fcos3d_post.py`, `cli/predict_and_save.py`)
drives either assembly.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eval_driving_safety_tpu.config import DSGNConfig
from eval_driving_safety_tpu.models.common import FrozenBatchNorm
from eval_driving_safety_tpu.ops.cost_volume import (
    build_psv, depth_planes, psv_to_3dgv, soft_argmin_depth)


@dataclass(frozen=True)
class DSGNCompatArch:
    """Architecture knobs of the upstream-shaped assembly.

    Every field that leaves a trace in the state dict (widths, counts) is
    DISCOVERED by `utils.torch_import.discover_dsgn_arch`; the rest
    (pool windows, strides/dilations, GroupNorm groups) are upstream
    constants kept here so tests can shrink them.
    """
    base_channels: int = 32                       # firstconv/layer1 width
    layer_channels: Tuple[int, ...] = (32, 64, 128, 128)
    layer_blocks: Tuple[int, ...] = (3, 16, 3, 3)
    layer_strides: Tuple[int, ...] = (1, 2, 1, 1)
    layer_dilations: Tuple[int, ...] = (1, 1, 1, 2)
    spp_pools: Tuple[int, ...] = (64, 32, 16, 8)  # branch1..branchN windows
    spp_channels: int = 32
    last_channels: int = 128                      # lastconv 3x3 width
    feature_channels: int = 32                    # lastconv 1x1 output
    cv_channels: int = 32                         # dres0/dres1 width
    hg_channels: int = 64                         # hourglass inner width
    gv_channels: int = 64                         # rpn3d_conv/conv2 width
    bev_channels: int = 128                       # rpn3d_conv3 + towers
    tower_convs: int = 2
    gn_groups: int = 32
    num_classes: int = 1

    @staticmethod
    def tiny() -> "DSGNCompatArch":
        return DSGNCompatArch(
            base_channels=8, layer_channels=(8, 16, 24, 24),
            layer_blocks=(1, 2, 1, 1), spp_pools=(8, 4),
            spp_channels=8, last_channels=16, feature_channels=8,
            cv_channels=8, hg_channels=16, gv_channels=8,
            bev_channels=16, tower_convs=1, gn_groups=4)


class _Conv3dSlice2d(nn.Module):
    """Drop-in for `nn.Conv(F, (3,3,3), strides=(s,)*3, padding=[(1,1)]*3,
    use_bias=False)` computed via ops.conv3d_slice2d (three depth-sliced 2D
    convs — the MXU-tiled shape) or ops.conv3d_tapconcat (one 2D conv over
    the depth-tap concat). The parameter is declared in nn.Conv's exact
    name/layout, so all implementations are checkpoint-interchangeable."""
    features: int
    stride: int = 1
    dtype: Any = jnp.float32
    method: str = "slice2d"

    @nn.compact
    def __call__(self, x):
        from eval_driving_safety_tpu.ops.conv3d_slice2d import (
            conv3d_nstack, conv3d_slice2d, conv3d_tapconcat)
        kernel = self.param("kernel", nn.linear.default_kernel_init,
                            (3, 3, 3, x.shape[-1], self.features))
        op = {"concat": conv3d_tapconcat,
              "nstack": conv3d_nstack}.get(self.method, conv3d_slice2d)
        return op(x.astype(self.dtype), kernel, self.stride)


class CompatConvBn(nn.Module):
    """conv (no bias) + frozen BN, submodules named `conv`/`bn` so the
    imported tree maps 1:1 onto upstream `convbn`/`convbn_3d` Sequentials.

    conv3d_method (3D convs only): "slice2d" computes the 3x3x3 conv as
    three depth-sliced 2D convs (ops.conv3d_slice2d — XLA's small-channel
    Conv3D lowering is the compat assembly's measured bottleneck); "xla"
    keeps the plain Conv3D. Same parameters either way.
    """
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    dims: int = 2
    relu: bool = True
    dtype: Any = jnp.float32
    conv3d_method: str = "xla"

    @nn.compact
    def __call__(self, x):
        k, d = self.kernel, self.dims
        if (d == 3 and k == 3 and self.dilation == 1
                and self.conv3d_method in ("slice2d", "concat", "nstack")):
            x = _Conv3dSlice2d(self.features, self.stride, dtype=self.dtype,
                               method=self.conv3d_method, name="conv")(x)
        else:
            pad = self.dilation * (k // 2)
            x = nn.Conv(self.features, (k,) * d,
                        strides=(self.stride,) * d,
                        kernel_dilation=(self.dilation,) * d,
                        padding=[(pad, pad)] * d, use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        x = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.relu else x


class CompatDeconvBn(nn.Module):
    """ConvTranspose3d(k=3, s=2, p=1, output_padding=1) + BN: output side =
    2x input. flax expresses this as a stride-2 ConvTranspose over the
    zero-dilated input with (1, 2) padding; the torch kernel is spatially
    flipped at import (`utils.torch_import.deconv3d_kernel`) because torch's
    ConvTranspose is the conv GRADIENT while flax's is a fractionally-strided
    correlation. Verified numerically exact in tests/test_dsgn_compat.py.

    conv3d_method="slice2d" computes it via ops.conv3d_slice2d.
    conv_transpose3d_depthpoly (depth-polyphase: three 2D transposed convs,
    no depth zero-dilation) — same parameter tensor, same function."""
    features: int
    relu: bool = False
    dtype: Any = jnp.float32
    conv3d_method: str = "xla"

    @nn.compact
    def __call__(self, x):
        if self.conv3d_method in ("slice2d", "concat", "nstack"):
            x = _ConvTranspose3dDepthPoly(self.features, dtype=self.dtype,
                                          name="deconv")(x)
        else:
            x = nn.ConvTranspose(self.features, (3, 3, 3),
                                 strides=(2, 2, 2),
                                 padding=[(1, 2)] * 3, use_bias=False,
                                 dtype=self.dtype, name="deconv")(x)
        x = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.relu else x


class _ConvTranspose3dDepthPoly(nn.Module):
    """Drop-in for `nn.ConvTranspose(F, (3,3,3), strides=(2,)*3,
    padding=[(1,2)]*3, use_bias=False)` via the depth-polyphase op; the
    parameter matches nn.ConvTranspose's name/layout exactly."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from eval_driving_safety_tpu.ops.conv3d_slice2d import \
            conv_transpose3d_depthpoly
        kernel = self.param("kernel", nn.linear.default_kernel_init,
                            (3, 3, 3, x.shape[-1], self.features))
        return conv_transpose3d_depthpoly(x.astype(self.dtype), kernel)


def bev_collapse(voxels):
    """Collapse the voxel Y (height) axis into rpn3d_conv3's input
    channels, matching the upstream torch convention.

    Upstream merges (C, Y) through a contiguous `view(N, C*Y, Z, X)`,
    which requires the merged axes adjacent as (N, C, Y, Z, X) — so the
    flattened channel index is c * Yv + y (c OUTER, y inner). The imported
    rpn3d_conv3 kernel's input-channel ordering is whatever that view
    produced; collapsing y-outer here would silently permute every BEV
    head input under imported weights. Pinned against a torch
    view+Conv2d replica in
    tests/test_dsgn_compat.py::test_bev_collapse_matches_torch_view.

    voxels: (B, Z, Y, X, C) -> (B, Z, X, C*Y).
    """
    b, z, yv, xv, c = voxels.shape
    return voxels.transpose(0, 1, 3, 4, 2).reshape(b, z, xv, c * yv)


class CompatBasicBlock(nn.Module):
    """PSMNet BasicBlock: convbn+relu, convbn, residual add, NO final relu."""
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = CompatConvBn(self.features, 3, self.stride, self.dilation,
                         dtype=self.dtype, name="conv1")(x)
        y = CompatConvBn(self.features, 3, 1, self.dilation, relu=False,
                         dtype=self.dtype, name="conv2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = CompatConvBn(self.features, 1, self.stride, relu=False,
                             dtype=self.dtype, name="downsample")(x)
        return y + x


class CompatFeatureExtraction(nn.Module):
    """PSMNet `feature_extraction`: stem -> residual stacks -> SPP ->
    lastconv. Concat order (layer2 raw, layer4 skip, branchN..branch1)
    follows upstream."""
    arch: DSGNCompatArch
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = self.arch
        x = CompatConvBn(a.base_channels, 3, 2, dtype=self.dtype,
                         name="firstconv_0")(x)
        x = CompatConvBn(a.base_channels, 3, 1, dtype=self.dtype,
                         name="firstconv_1")(x)
        x = CompatConvBn(a.base_channels, 3, 1, dtype=self.dtype,
                         name="firstconv_2")(x)
        outs = []
        for li, (ch, n, st, dil) in enumerate(zip(
                a.layer_channels, a.layer_blocks, a.layer_strides,
                a.layer_dilations), start=1):
            for b in range(n):
                x = CompatBasicBlock(ch, st if b == 0 else 1, dil,
                                     dtype=self.dtype,
                                     name=f"layer{li}_{b}")(x)
            outs.append(x)
        raw, skip = outs[1], outs[-1]
        h, w = skip.shape[1], skip.shape[2]
        branches = []
        for bi, pool in enumerate(a.spp_pools, start=1):
            ph, pw = min(pool, h), min(pool, w)
            p = nn.avg_pool(skip, (ph, pw), strides=(ph, pw),
                            padding="VALID")
            p = CompatConvBn(a.spp_channels, 1, 1, dtype=self.dtype,
                             name=f"branch{bi}")(p)
            branches.append(jax.image.resize(
                p, (p.shape[0], h, w, p.shape[-1]), "linear"))
        x = jnp.concatenate([raw, skip] + branches[::-1], axis=-1)
        x = CompatConvBn(a.last_channels, 3, 1, dtype=self.dtype,
                         name="lastconv_0")(x)
        return nn.Conv(a.feature_channels, (1, 1), use_bias=True,
                       dtype=self.dtype, name="lastconv_1")(x)


class CompatHourglass3D(nn.Module):
    """PSMNet hourglass: 2x stride-2 3D convbn down, 2x ConvTranspose3d up,
    skip adds at both scales (pre/post), output NOT relu'd.

    Requires (D, H, W) divisible by 4 (two exact 2x down/upsamplings)."""
    channels: int                                  # inner (2x input) width
    dtype: Any = jnp.float32
    conv3d_method: str = "xla"

    @nn.compact
    def __call__(self, x):
        c = self.channels
        cin = x.shape[-1]
        m = self.conv3d_method
        out1 = CompatConvBn(c, 3, 2, dims=3, dtype=self.dtype,
                            conv3d_method=m, name="conv1")(x)
        pre = CompatConvBn(c, 3, 1, dims=3, relu=False, dtype=self.dtype,
                           conv3d_method=m, name="conv2")(out1)
        pre = nn.relu(pre)
        out2 = CompatConvBn(c, 3, 2, dims=3, dtype=self.dtype,
                            conv3d_method=m, name="conv3")(pre)
        out2 = CompatConvBn(c, 3, 1, dims=3, dtype=self.dtype,
                            conv3d_method=m, name="conv4")(out2)
        post = nn.relu(CompatDeconvBn(c, dtype=self.dtype, conv3d_method=m,
                                      name="conv5")(out2) + pre)
        return CompatDeconvBn(cin, dtype=self.dtype, conv3d_method=m,
                              name="conv6")(post)


class CompatTowerBlock(nn.Module):
    """FCOS tower block: biased 3x3 conv, GroupNorm, relu — submodules
    named `conv`/`gn` for the import mapping."""
    features: int
    groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=True,
                    dtype=self.dtype, name="conv")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, name="gn")(x)
        return nn.relu(x)


class DSGNCompat(nn.Module):
    """Upstream-topology DSGN. Same call signature / output keys as
    `models.dsgn.DSGN`; `cfg` supplies the geometry (input size, depth
    planes, voxel grid, postprocess thresholds), `arch` the layer widths."""
    cfg: DSGNConfig
    arch: DSGNCompatArch = DSGNCompatArch()
    volume_constraint: Any = None

    @nn.compact
    def __call__(self, im_left, im_right, calib_fu, calib_baseline,
                 calib_cu, calib_cv) -> Dict[str, jnp.ndarray]:
        cfg, a = self.cfg, self.arch
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        stride = cfg.feature_stride
        planes = depth_planes(cfg.min_depth, cfg.max_depth,
                              cfg.num_depth_planes)

        feat = CompatFeatureExtraction(a, dtype=dtype, name="feat")
        fl = feat(im_left.astype(dtype))
        fr = feat(im_right.astype(dtype))

        psv = build_psv(fl, fr, calib_fu.astype(dtype),
                        calib_baseline.astype(dtype),
                        planes.astype(dtype), stride)   # (B,D,H,W,2C)
        if self.volume_constraint is not None:
            psv = self.volume_constraint(psv)

        cv = a.cv_channels
        m3 = cfg.compat_conv3d_method
        x = CompatConvBn(cv, dims=3, dtype=dtype, conv3d_method=m3,
                         name="dres0_0")(psv)
        x = CompatConvBn(cv, dims=3, dtype=dtype, conv3d_method=m3,
                         name="dres0_1")(x)
        y = CompatConvBn(cv, dims=3, dtype=dtype, conv3d_method=m3,
                         name="dres1_0")(x)
        y = CompatConvBn(cv, dims=3, relu=False, dtype=dtype,
                         conv3d_method=m3, name="dres1_1")(y)
        x = y + x                                       # dres1 residual
        hg_cls = nn.remat(CompatHourglass3D) if cfg.remat \
            else CompatHourglass3D
        hg = hg_cls(a.hg_channels, dtype=dtype, conv3d_method=m3,
                    name="hg1")(x) + x

        score = CompatConvBn(cv, dims=3, dtype=dtype, conv3d_method=m3,
                             name="classif1_0")(hg)
        # the published checkpoint's 1-channel matching-score Conv3d, run
        # through the tap-projection formulation (models/dsgn.py Score3D —
        # identical params and math, ~2x faster than the N=1 conv lowering)
        from eval_driving_safety_tpu.models.dsgn import Score3D
        score = Score3D(dtype=dtype, use_bias=False,
                        name="classif1_1")(score)
        depth = soft_argmin_depth(score.astype(jnp.float32), planes)
        full_h, full_w = im_left.shape[1], im_left.shape[2]
        depth = jax.image.resize(
            depth, (depth.shape[0], full_h, full_w), "linear")
        out: Dict[str, Any] = {"depth_preds": [depth]}

        if cfg.rpn3d_enable:
            gv = CompatConvBn(a.gv_channels, dims=3, dtype=dtype,
                              conv3d_method=m3, name="rpn3d_conv")(hg)
            voxels = psv_to_3dgv(gv, planes.astype(jnp.float32),
                                 calib_fu, calib_cu, calib_cv, cfg,
                                 stride)                 # (B,Z,Y,X,C)
            voxels = CompatConvBn(a.gv_channels, dims=3, dtype=dtype,
                                  conv3d_method=m3, name="rpn3d_conv2")(
                                      voxels.astype(dtype))
            bev = bev_collapse(voxels)
            bev = CompatConvBn(a.bev_channels, 3, 1, dtype=dtype,
                               name="rpn3d_conv3")(bev)
            ct, bt = bev, bev
            for i in range(a.tower_convs):
                ct = CompatTowerBlock(a.bev_channels, a.gn_groups,
                                      dtype=dtype, name=f"cls_tower_{i}")(ct)
                bt = CompatTowerBlock(a.bev_channels, a.gn_groups,
                                      dtype=dtype,
                                      name=f"bbox_tower_{i}")(bt)
            cls = nn.Conv(a.num_classes, (3, 3), padding="SAME",
                          dtype=dtype, name="cls_logits",
                          bias_init=nn.initializers.constant(-4.59))(ct)
            reg = nn.Conv(8, (3, 3), padding="SAME", dtype=dtype,
                          name="bbox_pred")(bt)
            ctr = nn.Conv(1, (3, 3), padding="SAME", dtype=dtype,
                          name="centerness")(bt)
            out.update(bbox_cls=cls.astype(jnp.float32),
                       bbox_reg=reg.astype(jnp.float32),
                       bbox_centerness=ctr[..., 0].astype(jnp.float32))
        return out


def load_dsgn_checkpoint(path: str, cfg: DSGNConfig):
    """Published DSGN `.tar` -> (DSGNCompat model, {"params": tree}).

    The architecture is discovered from the state dict
    (`utils.torch_import.import_dsgn`); `cfg` supplies geometry only. The
    reference equivalent is the torch.load at
    /root/reference/attack/DSGN/pgd_attack.py:142-145.
    """
    from eval_driving_safety_tpu.utils.torch_import import (
        import_dsgn, load_torch_state_dict)
    sd, _ = load_torch_state_dict(path)
    imported = import_dsgn(sd)
    if imported["unmapped"]:
        print(f"WARNING: {len(imported['unmapped'])} DSGN checkpoint keys "
              f"unmapped: {imported['unmapped'][:8]}...")
    arch = imported["arch"]
    bev_in = imported["params"]["rpn3d_conv3"]["conv"]["kernel"].shape[2]
    expect = cfg.num_voxels_y * arch.gv_channels
    if bev_in != expect:
        raise ValueError(
            f"checkpoint BEV input dim {bev_in} != num_voxels_y * "
            f"gv_channels = {expect}; adjust DSGNConfig.num_voxels_y to "
            f"{bev_in // arch.gv_channels}")
    model = DSGNCompat(cfg, arch)
    return model, {"params": imported["params"]}
