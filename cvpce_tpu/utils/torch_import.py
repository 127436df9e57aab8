"""Torch checkpoint -> flax variable conversion.

The reference ships torch checkpoints (GitHub releases, README.md:40-43) and
loads torchvision-pretrained trunks (resnet50/vgg16); with zero egress, our
pretrained weights come from user-provided torch files. This module maps
torch state_dicts onto the flax module trees defined in cvpce_tpu.models.

Conventions:
- conv weights OIHW -> HWIO
- nn.BatchNorm: params {scale, bias}, batch_stats {mean, var}
- FrozenBatchNorm: everything in the 'frozen' collection

torch is only used to deserialize (torch.load on CPU); no torch compute.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def conv_kernel(t) -> np.ndarray:
    """OIHW -> HWIO."""
    return _np(t).transpose(2, 3, 1, 0)


def load_state_dict(path: str) -> Dict[str, Any]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    # reference checkpoints nest under 'model_state_dict'
    # (proposals_training.py:17, classification_training.py:17)
    for key in ("state_dict", "model_state_dict"):
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
            break
    if isinstance(obj, dict) and "model" in obj and hasattr(
        next(iter(obj["model"].values()), None), "shape"
    ):
        obj = obj["model"]
    return {k.replace("module.", "", 1) if k.startswith("module.") else k: v
            for k, v in obj.items()}


def _set(tree: Dict, path: list, value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _import_norm(sd: Mapping, torch_prefix: str, out: Dict, flax_path: list,
                 kind: str) -> None:
    w = _np(sd[f"{torch_prefix}.weight"])
    b = _np(sd[f"{torch_prefix}.bias"])
    m = _np(sd[f"{torch_prefix}.running_mean"])
    v = _np(sd[f"{torch_prefix}.running_var"])
    if kind == "frozen":
        _set(out, ["frozen"] + flax_path + ["fbn", "scale"], w)
        _set(out, ["frozen"] + flax_path + ["fbn", "bias"], b)
        _set(out, ["frozen"] + flax_path + ["fbn", "mean"], m)
        _set(out, ["frozen"] + flax_path + ["fbn", "var"], v)
    else:
        _set(out, ["params"] + flax_path + ["bn", "scale"], w)
        _set(out, ["params"] + flax_path + ["bn", "bias"], b)
        _set(out, ["batch_stats"] + flax_path + ["bn", "mean"], m)
        _set(out, ["batch_stats"] + flax_path + ["bn", "var"], v)


def import_resnet50(sd: Mapping, norm: str = "frozen",
                    torch_prefix: str = "", flax_prefix: list | None = None,
                    out: Dict | None = None) -> Dict[str, Any]:
    """Map a torchvision resnet50 state_dict onto models.resnet.ResNet50.

    `torch_prefix` allows importing a trunk embedded in a larger checkpoint
    (e.g. 'backbone.body.' for GLN checkpoints).
    """
    out = out if out is not None else {}
    fp = flax_prefix or []
    tp = torch_prefix

    _set(out, ["params"] + fp + ["conv1", "kernel"],
         conv_kernel(sd[f"{tp}conv1.weight"]))
    _import_norm(sd, f"{tp}bn1", out, fp + ["bn1"], norm)

    stages = (3, 4, 6, 3)
    for si, blocks in enumerate(stages):
        for bi in range(blocks):
            t = f"{tp}layer{si + 1}.{bi}"
            f = fp + [f"layer{si + 1}_{bi}"]
            for ci in (1, 2, 3):
                _set(out, ["params"] + f + [f"conv{ci}", "kernel"],
                     conv_kernel(sd[f"{t}.conv{ci}.weight"]))
                _import_norm(sd, f"{t}.bn{ci}", out, f + [f"bn{ci}"], norm)
            if f"{t}.downsample.0.weight" in sd:
                _set(out, ["params"] + f + ["downsample_conv", "kernel"],
                     conv_kernel(sd[f"{t}.downsample.0.weight"]))
                _import_norm(sd, f"{t}.downsample.1", out,
                             f + ["downsample_bn"], norm)
    return out


def import_vgg16_features(sd: Mapping, batch_norm: bool = True,
                          torch_prefix: str = "features.",
                          flax_prefix: list | None = None,
                          out: Dict | None = None) -> Dict[str, Any]:
    """Map torchvision vgg16(_bn) `features.*` onto models.embedders.MACVGG
    (conv/bn layers named f{torch_index})."""
    out = out if out is not None else {}
    fp = flax_prefix or []
    conv_indices = []
    idx = 0
    cfg = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M")
    for entry in cfg:
        if entry == "M":
            idx += 1
            continue
        conv_indices.append(idx)
        idx += 1
        if batch_norm:
            # bn right after conv
            bn_idx = idx
            _set(out, ["params"] + fp + [f"f{bn_idx}", "scale"],
                 _np(sd[f"{torch_prefix}{bn_idx}.weight"]))
            _set(out, ["params"] + fp + [f"f{bn_idx}", "bias"],
                 _np(sd[f"{torch_prefix}{bn_idx}.bias"]))
            _set(out, ["batch_stats"] + fp + [f"f{bn_idx}", "mean"],
                 _np(sd[f"{torch_prefix}{bn_idx}.running_mean"]))
            _set(out, ["batch_stats"] + fp + [f"f{bn_idx}", "var"],
                 _np(sd[f"{torch_prefix}{bn_idx}.running_var"]))
            idx += 1
        idx += 1  # relu

    for ci in conv_indices:
        _set(out, ["params"] + fp + [f"f{ci}", "kernel"],
             conv_kernel(sd[f"{torch_prefix}{ci}.weight"]))
        _set(out, ["params"] + fp + [f"f{ci}", "bias"],
             _np(sd[f"{torch_prefix}{ci}.bias"]))
    return out


def _conv_wb(sd: Mapping, torch_prefix: str, out: Dict, flax_path: list,
             bias: bool = True) -> None:
    _set(out, ["params"] + flax_path + ["kernel"],
         conv_kernel(sd[f"{torch_prefix}.weight"]))
    if bias and f"{torch_prefix}.bias" in sd:
        _set(out, ["params"] + flax_path + ["bias"],
             _np(sd[f"{torch_prefix}.bias"]))


def _bn_wb(sd: Mapping, torch_prefix: str, out: Dict, flax_path: list) -> None:
    _set(out, ["params"] + flax_path + ["scale"],
         _np(sd[f"{torch_prefix}.weight"]))
    _set(out, ["params"] + flax_path + ["bias"],
         _np(sd[f"{torch_prefix}.bias"]))
    _set(out, ["batch_stats"] + flax_path + ["mean"],
         _np(sd[f"{torch_prefix}.running_mean"]))
    _set(out, ["batch_stats"] + flax_path + ["var"],
         _np(sd[f"{torch_prefix}.running_var"]))


def import_gln(sd: Mapping) -> Dict[str, Any]:
    """Map a reference GLN checkpoint (GaussianLayerNetwork state_dict,
    cvpce/models/proposals.py:162-203 — torchvision RetinaNet layout plus
    `backbone.gaussian_layer` / `backbone.gaussian_subnet`) onto
    models.gln.GLN variables."""
    out: Dict[str, Any] = {}

    import_resnet50(sd, norm="frozen", torch_prefix="backbone.body.",
                    flax_prefix=["body"], out=out)

    for i in range(3):
        _conv_wb(sd, f"backbone.fpn.inner_blocks.{i}", out,
                 ["fpn", f"inner_{i}"])
        _conv_wb(sd, f"backbone.fpn.layer_blocks.{i}", out,
                 ["fpn", f"layer_{i}"])
    _conv_wb(sd, "backbone.fpn.extra_blocks.p6", out, ["fpn", "p6"])
    _conv_wb(sd, "backbone.fpn.extra_blocks.p7", out, ["fpn", "p7"])

    g = "backbone.gaussian_layer"
    _conv_wb(sd, f"{g}.lateral", out, ["gaussian", "lateral"])
    for bi in (1, 2):
        _conv_wb(sd, f"{g}.block{bi}.conv", out,
                 ["gaussian", f"block{bi}_conv"])
        _bn_wb(sd, f"{g}.block{bi}.norm", out, ["gaussian", f"block{bi}_bn"])
    for i in range(5):
        _conv_wb(sd, f"backbone.gaussian_subnet.blocks.{i}.conv", out,
                 ["gaussian", f"subnet_{i}"])

    for torch_head, flax_tower, flax_final, torch_final in (
        ("classification_head", "cls_tower", "cls_logits", "cls_logits"),
        ("regression_head", "reg_tower", "bbox_reg", "bbox_reg"),
    ):
        for i in range(4):
            _conv_wb(sd, f"head.{torch_head}.conv.{2 * i}", out,
                     ["head", flax_tower, f"conv_{i}"])
        _conv_wb(sd, f"head.{torch_head}.{torch_final}", out,
                 ["head", flax_final])
    return out
