"""`gln` command group (reference: cvpce/cli/gln.py)."""
from __future__ import annotations

import json
import os

import click
import numpy as np

from ..data import defaults
from ..models.gln import GLNConfig
from .common import default_gln_config, load_gln_variables

# hyperopt'd presets (cvpce/cli/gln.py:124-126)
HYPEROPT_LR_MULTIPLIER = 0.995
HYPEROPT_THRESHOLDS_TANH = (-1.0, 0.3)
HYPEROPT_THRESHOLDS_PLAIN = (0.0, 0.65)


@click.group()
def gln():
    """Gaussian Layer Network: product proposal detection."""


def _dataset_options(f):
    f = click.option("--imgs", default=defaults.SKU110K_IMG_DIR,
                     show_default=True)(f)
    f = click.option("--annotations", default=defaults.SKU110K_ANNOTATION_FILE,
                     show_default=True)(f)
    return f


@gln.command("build-assistant")
@click.option("--canvas", nargs=2, type=int, default=(832, 1344),
              show_default=True)
def build_assistant(canvas):
    """Shape-logging dry run of an untrained GLN
    (cvpce/cli/gln.py:29-57)."""
    import jax
    import jax.numpy as jnp

    from ..models.gln import GLN, postprocess_detections
    from ..models.resnet import ResNet50
    from ..models.fpn import FPN

    h, w = canvas
    config = GLNConfig(canvas_h=h, canvas_w=w)
    x = jnp.zeros((1, h, w, 3), jnp.float32)

    feats = ResNet50(norm="frozen").init_with_output(
        jax.random.PRNGKey(0), x)[0]
    click.echo(", ".join(f"{k}: {tuple(v.shape)}" for k, v in feats.items()))
    pyramid = FPN().init_with_output(
        jax.random.PRNGKey(0), feats["c3"], feats["c4"], feats["c5"])[0]
    click.echo(", ".join(f"P{i + 3}: {tuple(p.shape)}"
                         for i, p in enumerate(pyramid)))

    model = GLN(config=config)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    click.echo(f"cls_logits: {tuple(out['cls_logits'].shape)}, "
               f"bbox_regression: {tuple(out['bbox_regression'].shape)}, "
               f"gaussians: {tuple(out['gaussians'].shape)}")
    anchors, counts = config.anchors()
    click.echo(f"anchors: {anchors.shape[0]} over levels {counts}")
    res = postprocess_detections(
        out, jnp.asarray(anchors), counts,
        jnp.asarray([[h, w]], jnp.float32), config)
    click.echo(f"detections: {tuple(res['boxes'].shape)}")


@gln.command()
@_dataset_options
@click.option("--evalimgs", default=None)
@click.option("--evalannotations", default=None)
@click.option("--out", required=True, type=click.Path())
@click.option("--load", default=None,
              help="starting point: a torch checkpoint FILE to import, "
                   "or an orbax DIRECTORY (serving export / training "
                   "run) to warm-start from — the reference's --load "
                   "accepts its own checkpoints too "
                   "(proposals_training.py:180-189)")
@click.option("--resume", is_flag=True)
@click.option("--tanh", is_flag=True)
@click.option("--method", type=click.Choice(["normal", "kant", "simple"]),
              default="normal", show_default=True)
@click.option("--batch-size", default=1, show_default=True)
@click.option("--epochs", default=1, show_default=True)
@click.option("--gauss-loss-neg-thresh", default=0.0, show_default=True)
@click.option("--gauss-loss-pos-thresh", default=0.1, show_default=True)
@click.option("--hyperopt-params", is_flag=True,
              help="use the hyper-optimized params (cli/gln.py:124-126)")
@click.option("--grain", is_flag=True,
              help="grain input pipeline (deterministic multi-host "
                   "order, mid-epoch resumable)")
@click.option("--canvas", nargs=2, type=int, default=(832, 1344),
              show_default=True,
              help="detector canvas (h w); static shapes replace the "
                   "reference's variable-size RetinaNet transform")
@click.option("--max-detections", default=1000, show_default=True)
@click.option("--nms-candidates", default=5120, show_default=True)
def train(imgs, annotations, evalimgs, evalannotations, out, load, resume,
          tanh, method, batch_size, epochs, gauss_loss_neg_thresh,
          gauss_loss_pos_thresh, hyperopt_params, grain, canvas,
          max_detections, nms_candidates):
    """Train GLN on SKU-110K (cvpce/cli/gln.py:59-133). Best model used
    `--tanh --method simple --hyperopt-params`."""
    from ..data.sku110k import SKU110KDataset
    from ..train.gln import GLNTrainConfig
    from ..train.loops import train_proposal_generator

    method_map = {"normal": "mvn", "kant": "kant", "simple": "simple"}
    model_cfg = GLNConfig(tanh=tanh, canvas_h=canvas[0], canvas_w=canvas[1],
                          detections_per_img=max_detections,
                          max_nms_candidates=nms_candidates)
    lr_multiplier = 0.99
    neg, pos = gauss_loss_neg_thresh, gauss_loss_pos_thresh
    if hyperopt_params:
        lr_multiplier = HYPEROPT_LR_MULTIPLIER
        neg, pos = (HYPEROPT_THRESHOLDS_TANH if tanh
                    else HYPEROPT_THRESHOLDS_PLAIN)
    train_cfg = GLNTrainConfig(
        lr_multiplier=lr_multiplier, negative_threshold=neg,
        positive_threshold=pos, gauss_method=method_map[method],
    )
    dataset = SKU110KDataset(imgs, annotations, skip=defaults.SKU110K_SKIP,
                             canvas_h=model_cfg.canvas_h,
                             canvas_w=model_cfg.canvas_w)
    evalset = SKU110KDataset(
        evalimgs or imgs, evalannotations or annotations,
        skip=defaults.SKU110K_SKIP, flip_chance=0.0,
        canvas_h=model_cfg.canvas_h, canvas_w=model_cfg.canvas_w)
    kwargs = {}
    if grain:
        from ..data.grain_loader import GrainLoader

        kwargs["loader_cls"] = GrainLoader
    if load is not None and os.path.isdir(load):
        kwargs["load_orbax"] = load
    else:
        kwargs["load_torch"] = load
    train_proposal_generator(
        dataset, evalset, out, model_cfg=model_cfg, train_cfg=train_cfg,
        batch_size=batch_size, epochs=epochs, resume=resume, **kwargs)


@gln.command("eval")
@_dataset_options
@click.option("--weights", required=True)
@click.option("--dataset-type", type=click.Choice(
    ["sku110k", "gp180", "gpbaseline"]), default="sku110k",
    show_default=True)
@click.option("--iou-threshold", "iou_thresholds", multiple=True,
              type=float, help="IoU threshold(s); default 0.5")
@click.option("--coco", is_flag=True, help="IoU sweep 0.5:0.95")
@click.option("--batch-size", default=4, show_default=True)
@click.option("--fast", is_flag=True,
              help="bf16 + approx top-k TPU speed path")
@click.option("--canvas", nargs=2, type=int, default=(832, 1344),
              show_default=True, help="detector canvas (h w)")
@click.option("--max-detections", default=1000, show_default=True,
              help="detections kept per image (postprocess shape)")
@click.option("--nms-candidates", default=5120, show_default=True,
              help="device NMS candidate budget across levels")
@click.option("--out", default=None, help="write metrics JSON here")
@click.option("--plots", default=None,
              help="save P/R/F1 curve plots here (.png)")
def eval_cmd(imgs, annotations, weights, dataset_type, iou_thresholds,
             coco, batch_size, fast, canvas, max_detections,
             nms_candidates, out, plots):
    """Proposal AP/AR evaluation (cvpce/cli/gln.py:230-280)."""
    import dataclasses

    from ..eval.proposals import evaluate_gln

    config = dataclasses.replace(
        default_gln_config(fast), canvas_h=canvas[0], canvas_w=canvas[1],
        detections_per_img=max_detections, max_nms_candidates=nms_candidates)
    variables = load_gln_variables(weights, config)
    dataset = _load_eval_dataset(dataset_type, imgs, annotations, config)
    if coco:
        thresholds = tuple(np.arange(0.5, 1.0, 0.05).round(2))
    elif iou_thresholds:
        thresholds = tuple(iou_thresholds)
    else:
        thresholds = (0.5,)
    res = evaluate_gln(variables, dataset, config, thresholds=thresholds,
                       batch_size=batch_size, verbose=True, plot_out=plots)
    summary = {str(t): {k: float(v) for k, v in d.items() if k != "raw"}
               for t, d in res.items()}
    click.echo(json.dumps(summary, indent=2))
    if out:
        with open(out, "w") as f:
            json.dump(summary, f)


def _load_eval_dataset(dataset_type, imgs, annotations, config):
    from ..data.sku110k import SKU110KDataset
    from ..eval.proposals import DetectionEvalAdapter

    if dataset_type == "sku110k":
        return SKU110KDataset(imgs, annotations,
                              skip=defaults.SKU110K_SKIP, flip_chance=0.0,
                              canvas_h=config.canvas_h,
                              canvas_w=config.canvas_w)
    if dataset_type == "gp180":
        from ..data.grocery import GroceryProductsTestSet

        base = GroceryProductsTestSet(imgs or defaults.GP_TEST_DIR,
                                      annotations or defaults.GP_ANN_DIR)
        return DetectionEvalAdapter(
            base, lambda it: (it[0], it[2]),
            config.canvas_h, config.canvas_w)
    if dataset_type == "gpbaseline":
        from ..data.grocery import GPBaselineDataset

        base = GPBaselineDataset(imgs, annotations
                                 or defaults.GP_BASELINE_ANN_FILE)
        return DetectionEvalAdapter(
            base, lambda it: (it[0], it[1]),
            config.canvas_h, config.canvas_w)
    raise click.UsageError(f"unknown dataset type {dataset_type}")


@gln.command()
@click.argument("image", type=click.Path(exists=True))
@click.option("--weights", required=True)
@click.option("--threshold", default=0.5, show_default=True)
@click.option("--fast", is_flag=True)
@click.option("--out", default=None, help="save visualization here")
def detect(image, weights, threshold, fast, out):
    """Single-image detection (cvpce/cli/gln.py:282-307)."""
    from ..data import transforms as T
    from ..pipeline.proposals import ProposalGenerator

    from ..pipeline.calibrate import (calibration_dir_for_weights,
                                      resolve_input_norm)

    config = default_gln_config(fast)
    variables = load_gln_variables(weights, config)
    gen = ProposalGenerator(
        variables, config, confidence_threshold=threshold,
        input_norm=resolve_input_norm(calibration_dir_for_weights(weights)))
    img = T.load_image(image)
    res = gen.detect(img)
    keep = res["valid"] & (res["scores"] > threshold)
    click.echo(f"{int(keep.sum())} detections over {threshold}")
    for box, score in zip(res["boxes"][keep][:20], res["scores"][keep][:20]):
        click.echo(f"  {score:.3f} {np.round(box, 1).tolist()}")
    if out:
        _save_detection_viz(img, res["boxes"][keep], out)


def _save_detection_viz(img, boxes, out):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import patches, pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 9))
    ax.imshow(img)
    for x1, y1, x2, y2 in boxes:
        ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                       fill=False, edgecolor="lime",
                                       linewidth=1))
    ax.axis("off")
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)
    click.echo(f"saved {out}")


@gln.command("seek-sku110k-outliers")
@_dataset_options
@click.option("--weights", required=True)
@click.option("--sigmas", default=3.0, show_default=True)
def seek_outliers(imgs, annotations, weights, sigmas):
    """Per-image loss outlier scan used to curate SKU110K_SKIP
    (cvpce/cli/gln.py:309-377). Here: per-image eval-mode total loss via
    the train-step loss function."""
    import jax
    import jax.numpy as jnp

    from ..data.sku110k import SKU110KDataset, pad_boxes
    from ..models.gln import GLN
    from ..train.gln import (GLNTrainConfig, compute_losses, pad_anchors,
                             render_heatmap_targets)

    config = GLNConfig()
    train_cfg = GLNTrainConfig()
    variables = load_gln_variables(weights, config)
    dataset = SKU110KDataset(imgs, annotations, flip_chance=0.0,
                             canvas_h=config.canvas_h,
                             canvas_w=config.canvas_w)
    anchors, _ = config.anchors()
    anchors_p, num_real = pad_anchors(anchors, train_cfg.match_chunk)
    model = GLN(config=config, train=False)

    @jax.jit
    def loss_of(images, boxes, valid, sizes):
        outputs = model.apply(variables, images)
        heat = render_heatmap_targets(boxes, valid, sizes, config,
                                      train_cfg)[..., None]
        losses = compute_losses(outputs, jnp.asarray(anchors_p), num_real,
                                boxes, valid, heat, config, train_cfg)
        return (losses["classification"] + losses["bbox_regression"]
                + losses["gaussian"])

    all_losses = []
    for i in range(len(dataset)):
        item = dataset[i]
        b, v = pad_boxes(item["boxes"], 768)
        loss = float(loss_of(item["image"][None], b[None], v[None],
                             item["image_size"][None]))
        all_losses.append((loss, item["name"]))
        if i % 50 == 0:
            click.echo(f"{i}/{len(dataset)}")
    values = np.array([l for l, _ in all_losses])
    thresh = values.mean() + sigmas * values.std()
    outliers = [(l, n) for l, n in all_losses if l > thresh]
    click.echo(f"mean {values.mean():.3f} std {values.std():.3f} "
               f"threshold {thresh:.3f}")
    for l, n in sorted(outliers, reverse=True):
        click.echo(f"  {l:.3f}\t{n}")


@gln.command()
@_dataset_options
@click.option("--evalimgs", default=None)
@click.option("--evalannotations", default=None)
@click.option("--out", required=True, type=click.Path())
@click.option("--trials", default=16, show_default=True,
              help="TOTAL trial budget (incl. restored on --resume)")
@click.option("--max-epochs", default=9, show_default=True)
@click.option("--resume", is_flag=True,
              help="restore search_state.json from --out and continue "
                   "(the reference's --load/--load-algo, "
                   "cvpce/cli/gln.py:212-213)")
@click.option("--batch-size", default=1, show_default=True)
@click.option("--canvas", nargs=2, type=int, default=(832, 1344),
              show_default=True, help="detector canvas (h w)")
@click.option("--shared-state", default=None, type=click.Path(),
              help="multi-host search: claim trials from this shared "
                   "flock-backed store (run the same command on every "
                   "host with a distinct --host-id; the Ray Tune "
                   "multi-node analogue)")
@click.option("--host-id", default=0, show_default=True)
def hyperopt(imgs, annotations, evalimgs, evalannotations, out, trials,
             max_epochs, resume, batch_size, canvas, shared_state,
             host_id):
    """Hyperparameter search over the reference's GLN space
    (cvpce/cli/gln.py:171-200) with ASHA early stopping and
    exploding-gradient tolerance (max_failures=2, cli/gln.py:215)."""
    import json
    import os

    from ..data.sku110k import SKU110KDataset
    from ..train.gln import GLNTrainConfig
    from ..train.hyperopt import GLN_SPACE, run_search
    from ..train.loops import train_proposal_generator

    os.makedirs(out, exist_ok=True)

    import jax

    from ..train.hyperopt import device_scope, trial_dir_allocator

    new_trial_dir = trial_dir_allocator(out)
    ch, cw = canvas

    def train_one_epoch(config, epoch, carry, device=None):
        model_cfg = GLNConfig(
            tanh=config["tanh"], canvas_h=ch, canvas_w=cw,
            max_nms_candidates=min(5120, (ch // 8) * (cw // 8)),
            detections_per_img=min(1000, (ch // 8) * (cw // 8)))
        # threshold re-parameterization as in
        # proposals_training.py:62-67 (apply_hyperopt_config)
        tmin = -1.0 if config["tanh"] else 0.0
        tscale = 2.0 if config["tanh"] else 1.0
        low = tmin + config["gauss_loss_neg_thresh"] * tscale
        high = low + (1 - config["gauss_loss_neg_thresh"]) * tscale \
            * config["gauss_loss_pos_thresh"]
        train_cfg = GLNTrainConfig(
            lr_multiplier=config["multiplier"],
            scale_class=config["scale_class"],
            scale_gaussian=config["scale_gaussian"],
            negative_threshold=low, positive_threshold=high,
        )
        dataset = SKU110KDataset(
            imgs, annotations, skip=defaults.SKU110K_SKIP,
            canvas_h=model_cfg.canvas_h, canvas_w=model_cfg.canvas_w)
        evalset = SKU110KDataset(
            evalimgs or imgs, evalannotations or annotations,
            skip=defaults.SKU110K_SKIP, flip_chance=0.0,
            canvas_h=model_cfg.canvas_h, canvas_w=model_cfg.canvas_w)
        metrics = {}

        def report(**kw):
            metrics.update(kw)

        if carry is None:  # first epoch of this trial: own working dir
            carry = new_trial_dir()
        # mesh stays off inside trials so concurrent trials don't
        # contend for chips
        with device_scope(device):
            train_proposal_generator(
                dataset, evalset, carry, model_cfg=model_cfg,
                train_cfg=train_cfg, batch_size=batch_size, epochs=1,
                eval_interval=1, resume=epoch > 0, use_mesh=False,
                hyperopt_report=report)
        return metrics.get("average_precision", 0.0), carry

    from os import path

    if shared_state:
        from ..train.hyperopt import run_search_multihost

        result = run_search_multihost(
            train_one_epoch, GLN_SPACE, state_path=shared_state,
            num_trials=trials, max_epochs=max_epochs,
            devices=jax.devices(), host_id=host_id)
    else:
        result = run_search(
            train_one_epoch, GLN_SPACE, num_trials=trials,
            max_epochs=max_epochs, devices=jax.devices(),
            state_path=path.join(out, "search_state.json"),
            resume=resume)
    click.echo(json.dumps({"best_config": result["best_config"],
                           "best_metric": result["best_metric"]}, indent=2))
    with open(path.join(out, "hyperopt_result.json"), "w") as f:
        json.dump({"best_config": result["best_config"],
                   "best_metric": result["best_metric"]}, f)
