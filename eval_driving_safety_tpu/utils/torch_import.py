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

    The per-roi heads (RCNN_top, bbox/dim_orien/kpts) are a TPU-first
    redesign here and are NOT mapped — returns a partial params dict
    {"backbone": ..., "fpn": ..., "rpn": ...} to graft into a model.init
    tree; the heads keep their initialization (fine-tune or retrain).
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
