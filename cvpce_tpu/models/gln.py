"""GLN — Gaussian Layer Network: class-agnostic product detector.

TPU-native re-design of the reference's GaussianLayerNetwork
(cvpce/models/proposals.py:109-203): a RetinaNet (ResNet-50 FPN backbone,
shared conv heads, focal loss) extended with a Gaussian heatmap branch fed
from C2 + P3. Differences from the torch original are deliberate TPU
choices:

- static input canvas (H, W divisible by 64) instead of dynamic per-batch
  padding; per-image content sizes ride along as data,
- fixed-shape postprocessing (per-level static top-k, masked score
  threshold, O(N^2) mask NMS, static detections_per_img output),
- losses are pure functions over padded gt (see train/gln.py), not module
  state; the heatmap is returned, never stashed (the reference mutates
  `self.gaussians` — proposals.py:125-137 — which has no place in jit).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import anchors as anchor_ops
from ..ops.boxes import decode_boxes
from ..ops.nms import merge_boxes as merge_boxes_op
from ..ops.nms import nms_mask
from .fpn import FPN
from .layers import conv, upsample_nearest_2x
from .quant import Int8Conv
from .resnet import ResNet50

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class GLNConfig:
    canvas_h: int = 832
    canvas_w: int = 1344
    num_classes: int = 1
    tanh: bool = False
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    topk_candidates: int = 1000      # per level, pre-NMS
    detections_per_img: int = 1000   # cvpce/models/proposals.py:164-165
    # device NMS budget across levels; the default covers every
    # above-threshold candidate the reference's torchvision postprocess
    # would see (5 levels x topk 1000) — affordable with the Pallas kernel
    max_nms_candidates: int = 5120
    # anchor box-coder weights (torchvision RetinaNet uses all-ones)
    box_weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    # compute dtype for the conv stacks ('float32' | 'bfloat16'); params
    # and postprocessing stay f32
    compute_dtype: str = "float32"
    # use the Pallas bitmask NMS kernel (TPU) instead of the XLA fori-loop
    use_pallas_nms: bool = False
    # TPU-optimized approximate per-level top-k (lax.approx_max_k,
    # recall ~0.95); exact top_k when False
    use_approx_topk: bool = False
    # 'hard' (torchvision parity) or 'soft' (Soft-NMS re-scoring,
    # BASELINE.json's alternative postprocess)
    nms_mode: str = "hard"
    soft_nms_sigma: float = 0.5
    # EM-style score-weighted box merging of NMS survivors
    merge_boxes: bool = False
    # fold the gaussian branch's [up2x -> subnet conv1] into one conv at
    # the lower resolution (exact semantics, 4x MXU lane utilization)
    fold_gaussian_upsample: bool = True
    # int8 MXU serving path for backbone stages + FPN + head towers
    # (models/quant.py): 'off', 'calibrate' (record act scales into the
    # 'act_scales' collection), or 'static' (serve with calibrated
    # scales). The stem, predictors (cls_logits/bbox_reg) and the
    # Gaussian branch stay in compute_dtype. Same checkpoints; AP parity
    # validated on trained weights in scripts/detector_int8_check.py.
    int8: str = "off"
    # Serving option: run the backbone with FrozenBN folded into conv
    # kernels/biases (models/resnet.py:fold_frozen_bn — exact).
    # Requires variables transformed by fold_gln_backbone; training and
    # checkpoint layouts are untouched (fold at load time only).
    fold_backbone_fbn: bool = False
    # Serving option: stem as an explicit im2col contraction (same
    # 'conv1' params; avoids XLA's Cin=3 lane padding — PERF.md r4)
    stem_im2col: bool = False
    # Serving option: skip the Gaussian heatmap branch entirely. The
    # detect -> classify -> compliance production path never consumes
    # the heatmap — the reference computes it unconditionally only
    # because its module stashes it for eval visualization
    # (cvpce/models/proposals.py:125-137). The branch is ~17 ms of the
    # ~24 ms single-chip detector forward (PERF.md r2), so gating it is
    # the single biggest detector serving lever. Training/eval keep it.
    with_gaussians: bool = True

    def anchors(self) -> Tuple[np.ndarray, List[int]]:
        return anchor_ops.grid_anchors(self.canvas_h, self.canvas_w)


def _head_kernel_init():
    return nn.initializers.normal(stddev=0.01)


class _ConvTower(nn.Module):
    """4x (3x3 conv 256 + ReLU), shared across pyramid levels."""
    features: int = 256
    dtype: Any = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(4):
            if self.quant:
                x = Int8Conv(self.features,
                             kernel_init=_head_kernel_init(),
                             dtype=self.dtype,
                             static_scale=self.quant == "static",
                             calibrate=self.quant == "calibrate",
                             name=f"conv_{i}")(x)
            else:
                x = nn.Conv(self.features, (3, 3),
                            padding=[(1, 1), (1, 1)],
                            kernel_init=_head_kernel_init(),
                            bias_init=nn.initializers.zeros,
                            dtype=self.dtype,
                            name=f"conv_{i}")(x)
            x = nn.relu(x)
        return x


class RetinaNetHead(nn.Module):
    num_classes: int = 1
    num_anchors: int = 9
    prior_probability: float = 0.01
    dtype: Any = jnp.float32
    # int8 towers; the final cls_logits/bbox_reg predictors always stay
    # in compute dtype (their outputs feed thresholds/box decode)
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, features: Sequence[Array]) -> Tuple[Array, Array]:
        cls_tower = _ConvTower(dtype=self.dtype, quant=self.quant,
                               name="cls_tower")
        reg_tower = _ConvTower(dtype=self.dtype, quant=self.quant,
                               name="reg_tower")
        bias_value = -math.log(
            (1 - self.prior_probability) / self.prior_probability
        )
        cls_logits = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3),
            padding=[(1, 1), (1, 1)],
            kernel_init=_head_kernel_init(),
            bias_init=nn.initializers.constant(bias_value),
            dtype=self.dtype,
            name="cls_logits",
        )
        bbox_reg = nn.Conv(
            self.num_anchors * 4, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=_head_kernel_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="bbox_reg",
        )

        logits_all = []
        regs_all = []
        for f in features:
            b = f.shape[0]
            logits = cls_logits(cls_tower(f)).astype(jnp.float32)
            regs = bbox_reg(reg_tower(f)).astype(jnp.float32)
            # (B, H, W, A*K) -> (B, H*W*A, K): same (y, x, anchor) flatten
            # order as the anchor grid and torchvision's permute+reshape.
            logits_all.append(logits.reshape(b, -1, self.num_classes))
            regs_all.append(regs.reshape(b, -1, 4))
        return (jnp.concatenate(logits_all, axis=1),
                jnp.concatenate(regs_all, axis=1))


class _FoldedUpConv(nn.Module):
    """[nearest-2x-upsample -> 3x3 conv] as ONE conv at the lower
    resolution producing all four phase outputs, then depth-to-space.

    Exact reformulation (up to float summation order): with
    xu[2a+u] = x[a], the 3x3 taps collapse per output phase di into a
    3-tap kernel on x — e.g. 1-D phase 0 is [w0, w1+w2, 0], phase 1 is
    [0, w0+w1, w2]. TPU motivation: the original conv runs at 2H x 2W
    with 32 output channels (a quarter of the 128 MXU lanes); the folded
    form runs at H x W with 4x32=128 output channels at identical FLOPs
    — measured ~4x better per-FLOP efficiency (scripts/profile_gauss.py).
    Param names/shapes match the plain nn.Conv, so checkpoints load
    unchanged."""
    features: int
    dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.kaiming_normal()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        o = self.features
        kernel = self.param("kernel", self.kernel_init, (3, 3, c, o),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (o,), jnp.float32)
        w = kernel.astype(self.dtype)
        folded = jnp.zeros((3, 3, c, 4 * o), self.dtype)
        for di in (0, 1):
            for dj in (0, 1):
                slot = di * 2 + dj
                for ky in range(3):
                    for kx in range(3):
                        pa = (di + ky - 1) // 2 + 1
                        pb = (dj + kx - 1) // 2 + 1
                        folded = folded.at[
                            pa, pb, :, slot * o:(slot + 1) * o
                        ].add(w[ky, kx])
        dn = jax.lax.conv_dimension_numbers(
            x.shape, folded.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), folded, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn)
        y = y + jnp.tile(bias, 4).astype(self.dtype)
        b, h2, w2, _ = y.shape
        y = y.reshape(b, h2, w2, 2, 2, o).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, h2 * 2, w2 * 2, o)


class GaussianBranch(nn.Module):
    """Gaussian heatmap head: C2 lateral + 2x-upsampled P3 -> conv-BN-ReLU
    pyramid -> subnet -> half-resolution heatmap
    (cvpce/models/proposals.py:51-107).

    `fold_upsample`: compute [up2x -> subnet conv 1] as a folded conv at
    the lower resolution (_FoldedUpConv) — exact semantics, ~4x better
    MXU lane utilization for the thin 64->32 layer."""
    tanh: bool = False
    train: bool = False
    dtype: Any = jnp.float32
    fold_upsample: bool = True

    @nn.compact
    def __call__(self, c2: Array, p3: Array) -> Array:
        def bn(x, name):
            return nn.BatchNorm(use_running_average=not self.train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)(x)

        relu_init = nn.initializers.kaiming_normal()
        xavier = nn.initializers.xavier_normal()

        lat = nn.Conv(256, (1, 1), kernel_init=xavier,
                      bias_init=nn.initializers.zeros, dtype=self.dtype,
                      name="lateral")(c2)
        x = lat + upsample_nearest_2x(p3)
        x = nn.relu(bn(nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)],
                               kernel_init=relu_init, dtype=self.dtype,
                               name="block1_conv")(x),
                       "block1_bn"))
        x = nn.relu(bn(nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)],
                               kernel_init=relu_init, dtype=self.dtype,
                               name="block2_conv")(x),
                       "block2_bn"))

        # GaussianSubnet: 64->32->32->16->16->1 (on the 2x-upsampled map)
        spec = [(32, 3), (32, 3), (16, 3), (16, 1)]
        if self.fold_upsample:
            x = nn.relu(_FoldedUpConv(spec[0][0], dtype=self.dtype,
                                      kernel_init=relu_init,
                                      name="subnet_0")(x))
            rest = list(enumerate(spec))[1:]
        else:
            x = upsample_nearest_2x(x)
            rest = list(enumerate(spec))
        for i, (ch, k) in rest:
            pad = [(k // 2, k // 2)] * 2
            x = nn.relu(nn.Conv(ch, (k, k), padding=pad,
                                kernel_init=relu_init, dtype=self.dtype,
                                name=f"subnet_{i}")(x))
        final_init = (nn.initializers.xavier_normal() if self.tanh
                      else nn.initializers.kaiming_normal())
        x = nn.Conv(1, (1, 1), kernel_init=final_init, dtype=self.dtype,
                    name="subnet_4")(x)
        x = x.astype(jnp.float32)
        return jnp.tanh(x) if self.tanh else nn.relu(x)


class GLN(nn.Module):
    """Full detector. Returns head outputs + heatmap; no losses inside."""
    config: GLNConfig = GLNConfig()
    train: bool = False

    @nn.compact
    def __call__(self, images: Array) -> Dict[str, Array]:
        dt = jnp.dtype(self.config.compute_dtype)
        quant = None if self.config.int8 == "off" else self.config.int8
        body_norm = ("none" if self.config.fold_backbone_fbn
                     else "frozen")
        feats = ResNet50(norm=body_norm, dtype=dt, quant=quant,
                         conv_bias=self.config.fold_backbone_fbn,
                         stem_im2col=self.config.stem_im2col,
                         name="body")(images)
        pyramid = FPN(dtype=dt, quant=quant, name="fpn")(
            feats["c3"], feats["c4"], feats["c5"])
        # The branch module must be CONSTRUCTED even when gated so the
        # param tree (and thus checkpoint compatibility) is unchanged;
        # flax only materializes params for modules actually called, so
        # gate at the call site but keep init covered via train/eval
        # configs (with_gaussians=True there).
        out = {}
        if self.config.with_gaussians:
            out["gaussians"] = GaussianBranch(          # (B, H/2, W/2, 1)
                tanh=self.config.tanh, train=self.train, dtype=dt,
                fold_upsample=self.config.fold_gaussian_upsample,
                name="gaussian"
            )(feats["c2"], pyramid[0])
        cls_logits, bbox_regression = RetinaNetHead(
            num_classes=self.config.num_classes, dtype=dt, quant=quant,
            name="head"
        )(pyramid)
        out["cls_logits"] = cls_logits               # (B, A, K)
        out["bbox_regression"] = bbox_regression     # (B, A, 4)
        return out


def fold_gln_backbone(variables):
    """Fold the backbone's FrozenBN into its conv weights (serving).

    Returns variables for a GLNConfig(fold_backbone_fbn=True) twin of a
    norm='frozen' GLN: the 'body' params absorb the affines
    (models/resnet.py:fold_frozen_bn), the 'frozen' collection loses its
    'body' subtree (dropped entirely if then empty). All other
    collections (act_scales, batch_stats) pass through unchanged —
    int8 per-channel weight scales absorb the fold exactly.
    """
    from .resnet import fold_frozen_bn

    frozen = variables.get("frozen", {})
    if "body" not in frozen:
        return variables
    folded_body = fold_frozen_bn(
        {"params": variables["params"]["body"],
         "frozen": frozen["body"]})
    out = {k: v for k, v in variables.items() if k != "frozen"}
    out["params"] = {**variables["params"], "body": folded_body["params"]}
    frozen_rest = {k: v for k, v in frozen.items() if k != "body"}
    if frozen_rest:
        out["frozen"] = frozen_rest
    return out


def postprocess_detections(
    outputs: Dict[str, Array],
    anchors: Array,
    level_counts: Sequence[int],
    image_sizes: Array,
    config: GLNConfig,
) -> Dict[str, Array]:
    """Fixed-shape detection decoding (torchvision postprocess semantics:
    per-level score threshold + top-k, decode, clip, cross-level NMS, keep
    detections_per_img).

    Args:
      outputs: GLN forward outputs.
      anchors: (A, 4) canvas anchors.
      level_counts: per-level anchor counts (static).
      image_sizes: (B, 2) content (h, w) inside the canvas per image.

    Returns dict with 'boxes' (B, D, 4), 'scores' (B, D), 'valid' (B, D),
    D = detections_per_img; plus 'gaussians' passthrough
    (cvpce/models/proposals.py:176-181 attaches heatmaps to eval results).
    """
    cfg = config
    num_classes = cfg.num_classes

    def per_image(logits, regs, size_hw):
        level_boxes = []
        level_scores = []
        level_valid = []
        start = 0
        for count in level_counts:
            l_logits = jax.lax.dynamic_slice_in_dim(logits, start, count, 0)
            l_regs = jax.lax.dynamic_slice_in_dim(regs, start, count, 0)
            l_anchors = jax.lax.dynamic_slice_in_dim(anchors, start, count, 0)
            scores = jax.nn.sigmoid(l_logits).reshape(-1)  # (count*K,)
            k = min(cfg.topk_candidates, count * num_classes)
            if cfg.use_approx_topk and count * num_classes > 4 * k:
                top_scores, top_idx = jax.lax.approx_max_k(
                    scores, k, recall_target=0.95)
            else:
                top_scores, top_idx = jax.lax.top_k(scores, k)
            anchor_idx = top_idx // num_classes
            boxes = decode_boxes(l_regs[anchor_idx], l_anchors[anchor_idx],
                                 cfg.box_weights)
            h, w = size_hw[0], size_hw[1]
            x1 = jnp.clip(boxes[:, 0], 0, w)
            y1 = jnp.clip(boxes[:, 1], 0, h)
            x2 = jnp.clip(boxes[:, 2], 0, w)
            y2 = jnp.clip(boxes[:, 3], 0, h)
            boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
            level_boxes.append(boxes)
            level_scores.append(top_scores)
            level_valid.append(top_scores > cfg.score_thresh)
            start += count

        boxes = jnp.concatenate(level_boxes, 0)
        scores = jnp.concatenate(level_scores, 0)
        valid = jnp.concatenate(level_valid, 0)

        # Bound NMS cost: keep the best max_nms_candidates across levels.
        c = min(cfg.max_nms_candidates, boxes.shape[0])
        cand_scores, cand_idx = jax.lax.top_k(
            jnp.where(valid, scores, -jnp.inf), c
        )
        cand_boxes = boxes[cand_idx]
        cand_valid = jnp.isfinite(cand_scores)
        cand_scores = jnp.where(cand_valid, cand_scores, 0.0)

        if cfg.nms_mode == "soft":
            # Soft-NMS re-scoring instead of hard suppression; survivors
            # are candidates whose decayed score clears score_thresh
            if cfg.use_pallas_nms:
                from ..ops.nms_pallas import soft_nms_scores_pallas

                new_scores = soft_nms_scores_pallas(
                    cand_boxes, cand_scores, cand_valid,
                    cfg.soft_nms_sigma, cfg.nms_thresh)
            else:
                from ..ops.nms import soft_nms_scores

                new_scores = soft_nms_scores(
                    cand_boxes, cand_scores, cand_valid,
                    cfg.soft_nms_sigma, cfg.nms_thresh)
            keep = cand_valid & (new_scores > cfg.score_thresh)
            cand_scores = new_scores
            if cfg.merge_boxes:
                cand_boxes = merge_boxes_op(cand_boxes, cand_scores,
                                            cand_valid, keep,
                                            cfg.nms_thresh)
        else:
            if cfg.use_pallas_nms:
                from ..ops.nms_pallas import nms_mask_pallas

                keep = nms_mask_pallas(cand_boxes, cand_scores, cand_valid,
                                       cfg.nms_thresh)
            else:
                keep = nms_mask(cand_boxes, cand_scores, cand_valid,
                                cfg.nms_thresh)
            if cfg.merge_boxes:
                # EM-style score-weighted refinement of the survivors
                cand_boxes = merge_boxes_op(cand_boxes, cand_scores,
                                            cand_valid, keep,
                                            cfg.nms_thresh)
        kept_scores = jnp.where(keep, cand_scores, -jnp.inf)
        d = min(cfg.detections_per_img, c)
        out_scores, out_idx = jax.lax.top_k(kept_scores, d)
        out_valid = jnp.isfinite(out_scores)
        return (cand_boxes[out_idx],
                jnp.where(out_valid, out_scores, 0.0),
                out_valid)

    boxes, scores, valid = jax.vmap(per_image)(
        outputs["cls_logits"], outputs["bbox_regression"], image_sizes
    )
    res = {
        "boxes": boxes,
        "scores": scores,
        "valid": valid,
    }
    if "gaussians" in outputs:
        res["gaussians"] = outputs["gaussians"]
    return res
