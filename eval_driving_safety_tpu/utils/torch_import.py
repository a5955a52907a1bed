"""Import published PyTorch checkpoints into Flax param trees.

Capability parity: the reference loads published detector weights with
torch.load (/root/reference/attack/DSGN/pgd_attack.py:142-145 — DSGN .tar;
/root/reference/attack/Stereo-RCNN/pgd_attack.py:93-97 — Stereo R-CNN .pth
including the 6-vector `uncert`). This module maps the standard torchvision
backbone namings (the shared trunk of both detectors and both classifiers)
onto this framework's module tree so detection parity against reference
weights is testable (SURVEY.md §5).

Convention notes:
* torch conv weights are OIHW -> flax HWIO kernels;
* torch BN (weight, bias, running_mean, running_var) -> FrozenBatchNorm
  (scale, bias, mean, var);
* torch Linear weights are (out, in) -> flax Dense kernels (in, out).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Tuple[Dict[str, np.ndarray],
                                              Optional[np.ndarray]]:
    """torch.load -> {key: np.ndarray}, plus the SRCNN `uncert` vector if
    present. Handles the reference's wrapper dicts ('model'/'state_dict')."""
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=False)
    uncert = None
    if isinstance(raw, dict):
        if "uncert" in raw:
            uncert = np.asarray(raw["uncert"].detach().float().numpy())
        for key in ("model", "state_dict"):
            if key in raw and isinstance(raw[key], dict):
                raw = raw[key]
                break
    out = {}
    for k, v in raw.items():
        try:
            out[k] = np.asarray(v.detach().float().numpy())
        except AttributeError:
            pass
    return out, uncert


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def deconv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kH, kW) -> flax nn.ConvTranspose
    (kH, kW, in, out). flax's conv_transpose does not flip the kernel while
    torch's is the conv gradient (flipped), so flip the spatial axes
    (verified exact vs torch for the 2x2/stride-2 case)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def conv_as_dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (O, C, kH, kW) applied at full kernel extent ==
    flax Dense over the NHWC flatten: kernel[(i*kW + j)*C + c, o]."""
    o = w.shape[0]
    return np.transpose(w, (2, 3, 1, 0)).reshape(-1, o)


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """(out, in) -> (in, out)."""
    return np.transpose(w, (1, 0))


def bn_params(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def convert_bottleneck(sd: Dict[str, np.ndarray],
                       tprefix: str) -> Dict[str, Any]:
    """One torchvision bottleneck (`layerL.B.`) -> models.resnet.Bottleneck
    params."""
    blk: Dict[str, Any] = {}
    for ci in range(3):
        blk[f"Conv_{ci}"] = {
            "kernel": conv_kernel(sd[f"{tprefix}conv{ci + 1}.weight"])}
        blk[f"FrozenBatchNorm_{ci}"] = bn_params(sd, f"{tprefix}bn{ci + 1}")
    if f"{tprefix}downsample.0.weight" in sd:
        blk["downsample_conv"] = {
            "kernel": conv_kernel(sd[f"{tprefix}downsample.0.weight"])}
        blk["downsample_bn"] = bn_params(sd, f"{tprefix}downsample.1")
    return blk


def convert_torchvision_resnet(sd: Dict[str, np.ndarray],
                               block_counts=(3, 4, 23, 3),
                               prefix: str = "") -> Dict[str, Any]:
    """torchvision resnet50/101 state_dict -> models.resnet.ResNet params.

    `prefix` strips a wrapper (e.g. 'RCNN_base.' / 'model.') if the
    checkpoint nests the backbone.
    """
    g = lambda k: sd[prefix + k]
    params: Dict[str, Any] = {
        "stem_conv": {"kernel": conv_kernel(g("conv1.weight"))},
        "stem_bn": bn_params(sd, prefix + "bn1"),
    }
    for stage, n_blocks in enumerate(block_counts):
        for b in range(n_blocks):
            params[f"layer{stage + 1}_block{b}"] = convert_bottleneck(
                sd, f"{prefix}layer{stage + 1}.{b}.")
    return params


VGG16_CONV_LAYERS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
VGG16_NAMES = ("conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1",
               "conv3_2", "conv3_3", "conv4_1", "conv4_2", "conv4_3",
               "conv5_1", "conv5_2", "conv5_3")


def convert_torchvision_vgg16(sd: Dict[str, np.ndarray],
                              prefix: str = "features.") -> Dict[str, Any]:
    """torchvision vgg16 `.features` -> models.vgg.VGG16Features params."""
    params = {}
    for layer, name in zip(VGG16_CONV_LAYERS, VGG16_NAMES):
        params[name] = {
            "kernel": conv_kernel(sd[f"{prefix}{layer}.weight"]),
            "bias": sd[f"{prefix}{layer}.bias"],
        }
    return params


def merge_into(params_tree: Dict, subtree: Dict, path: Tuple[str, ...]):
    """Graft converted params into a model.init tree at `path` (in place on
    a deep copy); returns the new tree."""
    import copy
    out = copy.deepcopy(
        {k: v for k, v in params_tree.items()})
    node = out["params"] if "params" in out else out
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = subtree
    return out


def strip_module_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove a DataParallel 'module.' prefix if every key carries it (the
    DSGN .tar is saved wrapped — /root/reference/attack/DSGN/
    predict_and_save_pgd.py:161-166 loads after nn.DataParallel)."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def convert_stereo_rcnn_checkpoint(sd: Dict[str, np.ndarray],
                                   num_anchors: int = 3) -> Dict[str, Any]:
    """Map the published Stereo R-CNN checkpoint's backbone + FPN + RPN onto
    this framework's StereoRCNN module tree.

    Upstream naming (HKUST Stereo-RCNN resnet.py / stereo_rpn.py, loaded at
    /root/reference/attack/Stereo-RCNN/pgd_attack.py:94-97):
      RCNN_layer0.{0,1} = stem conv/bn; RCNN_layer{1..4}.{b} = bottlenecks;
      RCNN_toplayer / RCNN_latlayer{1,2,3} / RCNN_smooth{1,2,3} = FPN;
      RCNN_rpn.RPN_Conv / RPN_cls_score / RPN_bbox_pred_left_right = RPN.

    RPN cls channels are reordered from upstream's class-major (bg*A, fg*A)
    layout to this framework's anchor-major (A, 2) layout.

    Returns a partial params dict {"backbone", "fpn", "rpn"}; use
    `convert_stereo_rcnn_heads` for the per-roi heads and
    `import_stereo_rcnn` for the whole tree with key accounting.
    """
    backbone: Dict[str, Any] = {
        "stem_conv": {"kernel": conv_kernel(sd["RCNN_layer0.0.weight"])},
        "stem_bn": bn_params(sd, "RCNN_layer0.1"),
    }
    stage = 1
    while f"RCNN_layer{stage}.0.conv1.weight" in sd:
        b = 0
        while f"RCNN_layer{stage}.{b}.conv1.weight" in sd:
            backbone[f"layer{stage}_block{b}"] = convert_bottleneck(
                sd, f"RCNN_layer{stage}.{b}.")
            b += 1
        stage += 1

    def conv_wb(name):
        return {"kernel": conv_kernel(sd[f"{name}.weight"]),
                "bias": sd[f"{name}.bias"]}

    fpn = {
        "toplayer": conv_wb("RCNN_toplayer"),
        "latlayer1": conv_wb("RCNN_latlayer1"),
        "latlayer2": conv_wb("RCNN_latlayer2"),
        "latlayer3": conv_wb("RCNN_latlayer3"),
        "smooth1": conv_wb("RCNN_smooth1"),
        "smooth2": conv_wb("RCNN_smooth2"),
        "smooth3": conv_wb("RCNN_smooth3"),
    }

    cls_k = conv_kernel(sd["RCNN_rpn.RPN_cls_score.weight"])
    cls_b = sd["RCNN_rpn.RPN_cls_score.bias"]
    # gather map: ours channel (anchor*2 + class) <- upstream (class*A + a)
    perm = [k * num_anchors + a
            for a in range(num_anchors) for k in range(2)]
    rpn = {
        "rpn_conv": conv_wb("RCNN_rpn.RPN_Conv"),
        "rpn_cls": {"kernel": cls_k[..., perm], "bias": cls_b[perm]},
        "rpn_box": conv_wb("RCNN_rpn.RPN_bbox_pred_left_right"),
    }
    return {"backbone": backbone, "fpn": fpn, "rpn": rpn}


def convert_stereo_rcnn_heads(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map the published checkpoint's per-roi heads onto RCNNHead /
    KeypointHead params.

    Upstream layout (HKUST Stereo-RCNN resnet.py, whose use is pinned by the
    vendored forward at /root/reference/attack/Stereo-RCNN/
    stereo_rcnn.py:253-273):
      RCNN_top        = Sequential(Conv2d(512,1024,P,stride=P), ReLU,
                                   Conv2d(1024,1024,1), ReLU)  — _head_to_tail
      RCNN_cls_score  = Linear(1024, C)
      RCNN_bbox_pred  = Linear(1024, 6C)
      RCNN_dim_orien_pred = Linear(1024, 5C)
      RCNN_kpts       = Sequential of 3x3 convs (+ReLU) ending in a
                        ConvTranspose2d(256,256,2,stride=2) (+ReLU)
      kpts_class      = Conv2d(256, 6, 1)

    The RCNN_top convs act at full kernel extent (P x P input), so they are
    exactly Dense layers over the NHWC flatten (conv_as_dense_kernel);
    RCNN_kpts conv indices are discovered from the state dict, so 3- and
    4-conv variants both import. Returns {"rcnn": ..., "kpts": ...,
    "num_kpts_convs": int}.
    """
    rcnn = {
        "fc1": {"kernel": conv_as_dense_kernel(sd["RCNN_top.0.weight"]),
                "bias": sd["RCNN_top.0.bias"]},
        "fc2": {"kernel": conv_as_dense_kernel(sd["RCNN_top.2.weight"]),
                "bias": sd["RCNN_top.2.bias"]},
        "cls_score": {"kernel": dense_kernel(sd["RCNN_cls_score.weight"]),
                      "bias": sd["RCNN_cls_score.bias"]},
        "bbox_pred": {"kernel": dense_kernel(sd["RCNN_bbox_pred.weight"]),
                      "bias": sd["RCNN_bbox_pred.bias"]},
        "dim_orien_pred": {
            "kernel": dense_kernel(sd["RCNN_dim_orien_pred.weight"]),
            "bias": sd["RCNN_dim_orien_pred.bias"]},
    }
    kpts: Dict[str, Any] = {}
    n_convs = 0
    idx = 0
    while f"RCNN_kpts.{idx}.weight" in sd:
        w = sd[f"RCNN_kpts.{idx}.weight"]
        b = sd[f"RCNN_kpts.{idx}.bias"]
        if w.shape[2] == 3:                      # 3x3 conv
            n_convs += 1
            kpts[f"kpts_conv{n_convs}"] = {"kernel": conv_kernel(w),
                                           "bias": b}
        else:                                    # 2x2 stride-2 deconv
            kpts["kpts_deconv"] = {"kernel": deconv_kernel(w), "bias": b}
        idx += 2                                 # skip the interleaved ReLU
    kpts["kpts_class"] = {"kernel": conv_kernel(sd["kpts_class.weight"]),
                          "bias": sd["kpts_class.bias"]}
    return {"rcnn": rcnn, "kpts": kpts, "num_kpts_convs": n_convs}


# keys a full Stereo R-CNN import is allowed to leave unread: torch BN
# bookkeeping, and anchor/config buffers some forks stash in the state dict
_IGNORABLE = ("num_batches_tracked",)


def import_stereo_rcnn(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Full-tree import of a published Stereo R-CNN state dict.

    Returns {"params": {backbone, fpn, rpn, rcnn, kpts}, "num_kpts_convs",
    "unmapped": [keys the converter did not consume]} — an empty `unmapped`
    list is the zero-unmapped-keys contract the parity path asserts.
    """
    sd = strip_module_prefix(sd)
    rec = _ReadRecorder(sd)
    trunk = convert_stereo_rcnn_checkpoint(rec)
    heads = convert_stereo_rcnn_heads(rec)
    params = dict(trunk)
    params["rcnn"] = heads["rcnn"]
    params["kpts"] = heads["kpts"]
    unmapped = sorted(
        k for k in sd
        if k not in rec.read and not any(t in k for t in _IGNORABLE))
    return {"params": params, "num_kpts_convs": heads["num_kpts_convs"],
            "unmapped": unmapped}


class _ReadRecorder(dict):
    """dict that records which keys a converter actually read — exact
    unmapped-key accounting for `import_stereo_rcnn`."""

    def __init__(self, base):
        super().__init__(base)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def conv3d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv3d (O, I, kD, kH, kW) -> flax (kD, kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def deconv3d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d (I, O, kD, kH, kW) -> flax nn.ConvTranspose
    (kD, kH, kW, I, O), spatially flipped (torch's ConvTranspose is the conv
    gradient, flax's a fractionally-strided correlation; same rationale as
    `deconv_kernel`, verified exact for the k3/s2/p1/op1 case in
    tests/test_dsgn_compat.py)."""
    return np.ascontiguousarray(
        np.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1])


def gn_params(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """torch GroupNorm (weight, bias) -> flax nn.GroupNorm (scale, bias)."""
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


# ---------------------------------------------------------------------------
# DSGN published-checkpoint import (the compat assembly,
# models/dsgn_compat.py). The reference torch.load's the published .tar at
# /root/reference/attack/DSGN/pgd_attack.py:142-145 (DataParallel-wrapped,
# predict_and_save_pgd.py:161-166 — handled by strip_module_prefix).
# ---------------------------------------------------------------------------

def _convbn_nd(sd, prefix: str, rank: int) -> Dict[str, Any]:
    """One upstream convbn/convbn_3d Sequential(Conv, BatchNorm) at `prefix`
    -> CompatConvBn params ({conv, bn}). Tolerates one extra Sequential
    nesting level (upstream wraps some convbn blocks in Sequential(convbn,
    ReLU), giving `...0.0.weight` instead of `...0.weight`)."""
    k = conv3d_kernel if rank == 3 else conv_kernel
    if f"{prefix}.0.0.weight" in sd:
        prefix = f"{prefix}.0"
    return {"conv": {"kernel": k(sd[f"{prefix}.0.weight"])},
            "bn": bn_params(sd, f"{prefix}.1")}


def _deconvbn3d(sd, prefix: str) -> Dict[str, Any]:
    """Sequential(ConvTranspose3d, BatchNorm3d) -> CompatDeconvBn params."""
    return {"deconv": {"kernel": deconv3d_kernel(sd[f"{prefix}.0.weight"])},
            "bn": bn_params(sd, f"{prefix}.1")}


def _convbn_out(sd, prefix: str):
    """Output channels of the convbn at `prefix` (either nesting), or None
    if absent."""
    for key in (f"{prefix}.0.0.weight", f"{prefix}.0.weight"):
        if key in sd:
            return int(sd[key].shape[0])
    return None


def discover_dsgn_arch(sd: Dict[str, np.ndarray]):
    """Read every architecture knob that leaves a trace in a DSGN state
    dict (widths, block counts, SPP branch count, tower depth, classes);
    shapeless knobs (pool windows, strides/dilations, GroupNorm groups)
    keep the upstream defaults."""
    from eval_driving_safety_tpu.models.dsgn_compat import DSGNCompatArch
    d = DSGNCompatArch()
    fe = "feature_extraction."
    layer_channels, layer_blocks = [], []
    li = 1
    while _convbn_out(sd, f"{fe}layer{li}.0.conv1") is not None:
        b = 0
        while _convbn_out(sd, f"{fe}layer{li}.{b}.conv1") is not None:
            b += 1
        layer_channels.append(_convbn_out(sd, f"{fe}layer{li}.0.conv1"))
        layer_blocks.append(b)
        li += 1
    n_branch = 0
    while _convbn_out(sd, f"{fe}branch{n_branch + 1}.1") is not None:
        n_branch += 1
    bev = _convbn_out(sd, "rpn3d_conv3")
    tower = 0
    while f"rpn3d.cls_tower.{3 * tower}.weight" in sd:
        tower += 1
    import dataclasses
    return dataclasses.replace(
        d,
        base_channels=_convbn_out(sd, f"{fe}firstconv.0"),
        layer_channels=tuple(layer_channels),
        layer_blocks=tuple(layer_blocks),
        layer_strides=d.layer_strides[:len(layer_blocks)],
        layer_dilations=d.layer_dilations[:len(layer_blocks)],
        spp_pools=d.spp_pools[:n_branch],
        spp_channels=_convbn_out(sd, f"{fe}branch1.1"),
        last_channels=_convbn_out(sd, f"{fe}lastconv.0"),
        feature_channels=int(sd[f"{fe}lastconv.2.weight"].shape[0]),
        cv_channels=_convbn_out(sd, "dres0.2"),
        hg_channels=_convbn_out(sd, "hg1.conv1"),
        gv_channels=_convbn_out(sd, "rpn3d_conv"),
        bev_channels=bev,
        tower_convs=tower,
        gn_groups=(32 if bev % 32 == 0 else 4 if bev % 4 == 0 else 1),
        num_classes=int(sd["rpn3d.cls_logits.weight"].shape[0]),
    )


def convert_dsgn_feature_extraction(sd, arch) -> Dict[str, Any]:
    """`feature_extraction.*` -> CompatFeatureExtraction params."""
    fe = "feature_extraction."
    p: Dict[str, Any] = {}
    for i in range(3):
        # firstconv = Sequential(convbn, ReLU, convbn, ReLU, convbn, ReLU)
        p[f"firstconv_{i}"] = _convbn_nd(sd, f"{fe}firstconv.{2 * i}", 2)
    for li, n in enumerate(arch.layer_blocks, start=1):
        for b in range(n):
            pre = f"{fe}layer{li}.{b}"
            blk = {"conv1": _convbn_nd(sd, f"{pre}.conv1", 2),
                   "conv2": _convbn_nd(sd, f"{pre}.conv2", 2)}
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": {"kernel": conv_kernel(
                        sd[f"{pre}.downsample.0.weight"])},
                    "bn": bn_params(sd, f"{pre}.downsample.1")}
            p[f"layer{li}_{b}"] = blk
    for bi in range(1, len(arch.spp_pools) + 1):
        # branch = Sequential(AvgPool2d, convbn, ReLU) -> params at index 1
        p[f"branch{bi}"] = _convbn_nd(sd, f"{fe}branch{bi}.1", 2)
    p["lastconv_0"] = _convbn_nd(sd, f"{fe}lastconv.0", 2)
    p["lastconv_1"] = {"kernel": conv_kernel(sd[f"{fe}lastconv.2.weight"]),
                       "bias": sd[f"{fe}lastconv.2.bias"]}
    return p


def convert_dsgn_cost_trunk(sd) -> Dict[str, Any]:
    """dres0/dres1/hg1/classif1 -> compat cost-volume trunk params."""
    p: Dict[str, Any] = {}
    for name, pre in (("dres0_0", "dres0.0"), ("dres0_1", "dres0.2"),
                      ("dres1_0", "dres1.0"), ("dres1_1", "dres1.2")):
        p[name] = _convbn_nd(sd, pre, 3)
    hg = {f"conv{i}": _convbn_nd(sd, f"hg1.conv{i}", 3) for i in (1, 2, 3, 4)}
    hg["conv5"] = _deconvbn3d(sd, "hg1.conv5")
    hg["conv6"] = _deconvbn3d(sd, "hg1.conv6")
    p["hg1"] = hg
    p["classif1_0"] = _convbn_nd(sd, "classif1.0", 3)
    p["classif1_1"] = {"kernel": conv3d_kernel(sd["classif1.2.weight"])}
    return p


def convert_dsgn_rpn3d(sd, arch) -> Dict[str, Any]:
    """rpn3d_conv* volume convs + FCOS-style BEV towers/heads -> params."""
    p: Dict[str, Any] = {
        "rpn3d_conv": _convbn_nd(sd, "rpn3d_conv", 3),
        "rpn3d_conv2": _convbn_nd(sd, "rpn3d_conv2", 3),
        "rpn3d_conv3": _convbn_nd(sd, "rpn3d_conv3", 2),
    }
    for tower in ("cls_tower", "bbox_tower"):
        for i in range(arch.tower_convs):
            pre = f"rpn3d.{tower}.{3 * i}"
            p[f"{tower}_{i}"] = {
                "conv": {"kernel": conv_kernel(sd[f"{pre}.weight"]),
                         "bias": sd[f"{pre}.bias"]},
                "gn": gn_params(sd, f"rpn3d.{tower}.{3 * i + 1}")}
    for ours, theirs in (("cls_logits", "rpn3d.cls_logits"),
                         ("bbox_pred", "rpn3d.bbox_pred"),
                         ("centerness", "rpn3d.centerness")):
        p[ours] = {"kernel": conv_kernel(sd[f"{theirs}.weight"]),
                   "bias": sd[f"{theirs}.bias"]}
    return p


def import_dsgn(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Full-tree import of a published DSGN state dict onto the compat
    assembly (models/dsgn_compat.py), with the same zero-unmapped-key
    accounting as `import_stereo_rcnn`.

    Returns {"params": flax tree, "arch": DSGNCompatArch (discovered),
    "unmapped": [keys not consumed]} — `unmapped == []` is the contract the
    parity path asserts (tests/test_torch_import.py,
    tests/test_checkpoint_parity.py DSGN leg)."""
    sd = strip_module_prefix(sd)
    arch = discover_dsgn_arch(sd)
    rec = _ReadRecorder(sd)
    params: Dict[str, Any] = {
        "feat": convert_dsgn_feature_extraction(rec, arch)}
    params.update(convert_dsgn_cost_trunk(rec))
    params.update(convert_dsgn_rpn3d(rec, arch))
    unmapped = sorted(
        k for k in sd
        if k not in rec.read and not any(t in k for t in _IGNORABLE))
    return {"params": params, "arch": arch, "unmapped": unmapped}


def graft_stereo_rcnn(init_tree: Dict, imported: Dict[str, Any]) -> Dict:
    """Graft a full import (from `import_stereo_rcnn`) into a
    StereoRCNN.init tree, preserving non-param collections (constants)."""
    out = init_tree
    for name in ("backbone", "fpn", "rpn", "rcnn", "kpts"):
        out = merge_into(out, imported["params"][name], (name,))
    return out
