"""GLN training: losses, jitted train step, data-parallel mesh variant.

Re-design of cvpce/proposals_training.py for TPU:
- the torch loop (DDP + NCCL all-reduce, proposals_training.py:191-196) is a
  single jitted step over a `jax.sharding.Mesh`: batch sharded on the data
  axis, params replicated, gradient all-reduce inserted by XLA,
- SGD(momentum 0.9, weight decay 1e-4, lr 2.5e-3) with the per-epoch
  multiplicative LR decay (proposals_training.py:33-37,76-79) expressed as
  an optax schedule over steps,
- losses: torchvision-semantics focal + L1 (inherited by the reference) and
  the Gaussian heatmap loss (models/proposals.py:141-160), with heatmap
  targets rendered on device at half-canvas resolution (the reference
  renders full-res on host then bilinearly downsamples in the loss;
  rendering directly at target resolution is the TPU-native equivalent),
- total = scale_class * cls + reg + scale_gaussian * gauss
  (proposals_training.py:235-237).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.gln import GLN, GLNConfig
from ..ops.boxes import encode_boxes
from ..ops.gaussians import render_gaussians
from ..ops.losses import gaussian_heatmap_loss, sigmoid_focal_loss
from ..ops.matching import match_anchors

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class GLNTrainConfig:
    # cvpce/proposals_training.py:33-39 defaults
    lr: float = 0.0025
    momentum: float = 0.9
    weight_decay: float = 1e-4
    lr_multiplier: float = 0.99
    scale_class: float = 1.0
    scale_gaussian: float = 1.0
    # gaussian loss params (cvpce/models/proposals.py:141)
    negative_threshold: float = 0.0
    positive_threshold: float = 0.1
    min_negatives: int = 1000
    negatives_per_positive: int = 3
    # anchor matcher chunking; anchors are padded to a multiple of this
    match_chunk: int = 8192
    # backbone freezing (cvpce/models/proposals.py:183-191, default
    # trainable_layers=4: conv1/bn1 frozen, layer1..4 train)
    trainable_layers: int = 4
    steps_per_epoch: int = 1000
    gauss_method: str = "simple"
    gauss_join: str = "max"


class GLNTrainState(struct.PyTreeNode):
    step: Array
    params: Any
    frozen: Any
    batch_stats: Any
    opt_state: Any


def _freeze_mask(params, trainable_layers: int):
    """True = trainable. Mirrors gln_backbone's layers_to_train slicing."""
    train_prefixes = ["layer4", "layer3", "layer2", "layer1", "conv1"]
    trainable = set(train_prefixes[:trainable_layers])

    def mask_fn(path, _):
        keys = [getattr(p, "key", None) for p in path]
        if keys and keys[0] == "body":
            name = keys[1] or ""
            stem = name.split("_")[0]
            if stem in ("conv1", "bn1"):
                return "conv1" in trainable
            return any(stem.startswith(t) for t in trainable if t != "conv1")
        return True

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(cfg: GLNTrainConfig, params) -> optax.GradientTransformation:
    def schedule(step):
        epoch = step // cfg.steps_per_epoch
        return cfg.lr * cfg.lr_multiplier**epoch

    sgd = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(learning_rate=schedule, momentum=cfg.momentum),
    )
    mask = _freeze_mask(params, cfg.trainable_layers)
    return optax.chain(
        optax.masked(sgd, mask),
        optax.masked(optax.set_to_zero(),
                     jax.tree.map(lambda m: not m, mask)),
    )


def pad_anchors(anchors: np.ndarray, chunk: int) -> Tuple[np.ndarray, int]:
    """Pad the anchor table to a multiple of `chunk` with far-away dummy
    boxes (they never match: IoU 0 with any gt)."""
    a = len(anchors)
    pad = (-a) % chunk
    if pad:
        dummy = np.tile(np.array([[-1e6, -1e6, -1e6 + 1, -1e6 + 1]],
                                 np.float32), (pad, 1))
        anchors = np.concatenate([anchors, dummy], 0)
    return anchors, a


def compute_losses(outputs: Dict[str, Array], anchors: Array,
                   num_real_anchors: int, gt_boxes: Array, gt_valid: Array,
                   heatmap_targets: Array, model_cfg: GLNConfig,
                   cfg: GLNTrainConfig) -> Dict[str, Array]:
    """Per-batch GLN losses. gt boxes in canvas coordinates, padded (B, T, 4)."""
    a_real = num_real_anchors

    def per_image(logits, regs, boxes, valid):
        matched_idx, fg, not_ignored = match_anchors(
            anchors, boxes, valid, chunk=cfg.match_chunk
        )
        # drop the padded anchor tail (head outputs cover real anchors only)
        matched_idx = matched_idx[:a_real]
        fg = fg[:a_real]
        not_ignored = not_ignored[:a_real]
        real_anchors = anchors[:a_real]
        num_fg = jnp.maximum(fg.sum(), 1)

        # classification: focal over non-ignored anchors, single class
        cls_targets = fg.astype(jnp.float32)[:, None]
        focal = sigmoid_focal_loss(logits, cls_targets)
        cls_loss = jnp.where(not_ignored[:, None], focal, 0.0).sum() / num_fg

        # regression: L1 on encoded deltas over foreground anchors
        matched_boxes = boxes[matched_idx]
        target_deltas = encode_boxes(matched_boxes, real_anchors)
        l1 = jnp.abs(regs - target_deltas).sum(-1)
        reg_loss = jnp.where(fg, l1, 0.0).sum() / num_fg
        return cls_loss, reg_loss

    cls_losses, reg_losses = jax.vmap(per_image)(
        outputs["cls_logits"], outputs["bbox_regression"], gt_boxes, gt_valid
    )

    gauss = gaussian_heatmap_loss(
        outputs["gaussians"], heatmap_targets,
        tanh=model_cfg.tanh,
        negative_threshold=cfg.negative_threshold,
        positive_threshold=cfg.positive_threshold,
        min_negatives=cfg.min_negatives,
        negatives_per_positive=cfg.negatives_per_positive,
    )

    return {
        "classification": cls_losses.mean(),
        "bbox_regression": reg_losses.mean(),
        "gaussian": gauss,
    }


def render_heatmap_targets(gt_boxes: Array, gt_valid: Array,
                           image_sizes: Array, model_cfg: GLNConfig,
                           cfg: GLNTrainConfig) -> Array:
    """Render (B, H/2, W/2) heatmap targets from canvas-space boxes.

    Pixels beyond an image's content region keep the fill value, which the
    loss counts as negatives — same effect as the reference's canvas fill
    (models/proposals.py:142-148).
    """
    def one(boxes, valid, size_hw):
        hm = render_gaussians(
            boxes, valid,
            height=model_cfg.canvas_h, width=model_cfg.canvas_w,
            method=cfg.gauss_method, join=cfg.gauss_join,
            tanh=model_cfg.tanh, size_reduction=2,
        )
        h2 = model_cfg.canvas_h // 2
        w2 = model_cfg.canvas_w // 2
        yy = jnp.arange(h2)[:, None]
        xx = jnp.arange(w2)[None, :]
        inside = (yy < (size_hw[0] // 2)) & (xx < (size_hw[1] // 2))
        fill = -1.0 if model_cfg.tanh else 0.0
        return jnp.where(inside, hm, fill)

    return jax.vmap(one)(gt_boxes, gt_valid, image_sizes)


def make_train_step(model_cfg: GLNConfig, cfg: GLNTrainConfig,
                    anchors: np.ndarray,
                    optimizer: optax.GradientTransformation):
    """Build the train step (pure; jit or wrap with parallel.make_dp_train_step).

    `anchors` is the unpadded table from GLNConfig.anchors()."""
    anchors_padded, num_real = pad_anchors(anchors, cfg.match_chunk)
    model = GLN(config=model_cfg, train=True)
    anchors_dev = jnp.asarray(anchors_padded)

    def train_step(state: GLNTrainState, images, gt_boxes,
                   gt_valid, image_sizes):
        heatmaps = render_heatmap_targets(
            gt_boxes, gt_valid, image_sizes, model_cfg, cfg
        )[..., None]

        def loss_fn(params):
            outputs, mutations = model.apply(
                {"params": params, "frozen": state.frozen,
                 "batch_stats": state.batch_stats},
                images, mutable=["batch_stats"],
            )
            losses = compute_losses(
                outputs, anchors_dev, num_real, gt_boxes, gt_valid,
                heatmaps, model_cfg, cfg,
            )
            total = (cfg.scale_class * losses["classification"]
                     + losses["bbox_regression"]
                     + cfg.scale_gaussian * losses["gaussian"])
            return total, (losses, mutations["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt,
        )
        metrics = dict(losses, total=total)
        return new_state, metrics

    return train_step


def make_multi_step(step_fn):
    """Scan `step_fn` over a leading steps axis of stacked batches inside
    one compiled call — the train state never leaves HBM between steps.

    The reference pays a Python-loop dispatch + host sync per optimizer
    step (cvpce/proposals_training.py:222-264); on TPU a `lax.scan` of k
    steps amortizes dispatch to one call per k steps and returns only the
    per-step loss scalars (shape [k]) to the host. Use for throughput
    measurement and long runs; semantics are step-for-step identical to
    calling `step_fn` k times.
    """

    def multi_step(state, images, gt_boxes, gt_valid, image_sizes):
        def body(st, batch):
            st, metrics = step_fn(st, *batch)
            return st, metrics

        return jax.lax.scan(
            body, state, (images, gt_boxes, gt_valid, image_sizes))

    return multi_step


def init_train_state(model_cfg: GLNConfig, cfg: GLNTrainConfig,
                     rng: jax.Array, variables: Optional[Dict] = None,
                     sample_shape: Optional[Tuple[int, ...]] = None):
    """Initialize params (or adopt imported `variables`) + optimizer state."""
    model = GLN(config=model_cfg, train=True)
    if variables is None:
        shape = sample_shape or (1, model_cfg.canvas_h, model_cfg.canvas_w, 3)
        variables = model.init(rng, jnp.zeros(shape, jnp.float32))
    optimizer = make_optimizer(cfg, variables["params"])
    opt_state = optimizer.init(variables["params"])
    state = GLNTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables["frozen"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt_state,
    )
    return state, optimizer
