"""Benchmark: detect+embed images/sec/chip on the flagship pipeline.

Measures the BASELINE.json north-star metric — GLN detection (ResNet-50
FPN RetinaNet + Gaussian branch, fixed 832x1344 canvas, full-parity
fixed-shape NMS) followed by per-detection crop + MACVGG embedding —
end-to-end on device, steady state, single chip.

Workload realism (VERDICT r1 #6): inputs are deterministic synthetic
shelf scenes (data/synthetic.py, SKU-110K-like density of ~150-250
products/image) instead of uniform noise, the random-init classification
head is bias-calibrated so the score-threshold/NMS stage sees a
production-like candidate distribution, and the embed crop count is
driven by the measured per-image detection counts (padded to a static
bucket) instead of a fixed 128.

`vs_baseline` compares against an estimated reference throughput of 10
images/sec for the torch CUDA path. That is deliberately GENEROUS to the
reference: its own embed stage runs VGG16-256 in fp32 through a per-box
Python crop loop (reference production.py:20), which alone costs ~5
TFLOP/image — more than 10 img/s worth of fp32 V100 compute. See PERF.md
for the roofline derivation.

Serving numerics default to calibrated static-scale int8 on both
stages (the production path: Classifier calibrates on the gallery;
here on the bench scenes/crops). Evidence on TRAINED weights: embed
triplet/top-1 within noise of f32 with top-1 agreement at bf16's own
level (reports/int8_fidelity_trained_r2.log); detector AP 0.8882 int8
vs 0.8887 bf16 on the 3000-step checkpoint
(reports/detector_int8_r2.log). CVPCE_BENCH_EMBED=bf16 /
CVPCE_BENCH_DETECT=bf16 select the bf16 parity paths; detection
postprocess parity (full NMS candidate budget, reference crop
semantics) is unaffected by either mode, and the head bisection runs
through the same serving numerics it calibrates.

CVPCE_BENCH_WEIGHTS=<serving-export dir> (e.g. the git-tracked
artifacts/gln_r3) runs the same workload on a TRAINED detector instead:
no logit widening, no bias bisection — the crop bucket is sized from
the trained head's real NMS-survivor counts. Off by default only for
round-over-round comparability with the calibrated-random numbers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics (calibration, bucket, det counts) go to stderr.
"""
import json
import os
import sys
import time

import numpy as np

REFERENCE_IMAGES_PER_SEC = 10.0  # documented estimate, see module docstring
SCORE_THRESH_LOGIT = float(np.log(0.05 / 0.95))  # GLNConfig.score_thresh
CROP_BUCKETS = (64, 96, 128, 160, 192, 256, 320, 384, 512)


# (stage, timestamp) swapped as one tuple so the watchdog thread never
# pairs a new stage with an old timestamp (tuple assignment is atomic).
_progress = ("start", time.time())
_heartbeat_started = False


def log(msg):
    global _progress
    _progress = (str(msg), time.time())
    print(msg, file=sys.stderr, flush=True)


def _start_stall_heartbeat(interval=120.0):
    """Emit a stderr heartbeat when no progress is logged for `interval`
    seconds, so a hung run (e.g. a wedged device->host fetch path on a
    tunneled TPU: execution completes, the first np.asarray never
    returns — seen 2026-08-19) is diagnosable from the driver's stderr
    capture. Diagnostics only: never aborts (big-graph remote compiles
    legitimately take minutes) and never touches the JSON contract.
    Singleton: repeated main() calls in one process reuse the thread."""
    global _heartbeat_started
    if _heartbeat_started:
        return
    _heartbeat_started = True
    import threading

    def beat():
        while True:
            time.sleep(interval)
            stage, t = _progress
            dt = time.time() - t
            if dt > interval:
                print(f"[bench watchdog] no progress for {dt:.0f}s; "
                      f"last stage: {stage!r}",
                      file=sys.stderr, flush=True)

    threading.Thread(target=beat, daemon=True).start()


def _find_cls_bias_path(params):
    """Locate the cls_logits bias leaf in the param tree."""
    path = []

    def walk(tree, trail):
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == "cls_logits" and isinstance(v, dict) \
                        and "bias" in v:
                    path.append(trail + [k, "bias"])
                else:
                    walk(v, trail + [k])

    walk(params, [])
    assert len(path) == 1, f"cls_logits bias not unique: {path}"
    return path[0]


def _edit_cls_leaf(variables, leaf, fn):
    path = _find_cls_bias_path(variables["params"])[:-1] + [leaf]

    def apply(tree, keys):
        if not keys:
            return fn(tree)
        return {**tree, keys[0]: apply(tree[keys[0]], keys[1:])}

    return {**variables, "params": apply(variables["params"], path)}


def _shift_cls_bias(variables, shift):
    return _edit_cls_leaf(variables, "bias", lambda b: b + shift)


def _scale_cls_kernel(variables, factor):
    """Widen the logit distribution: a fresh random head's logits are
    nearly constant (bias-dominated, kernel std 0.01), which makes the
    score threshold a step function. Scaling the final kernel spreads
    spatial variation so survivor counts respond smoothly to the bias
    shift, like a trained detector's score distribution."""
    return _edit_cls_leaf(variables, "kernel", lambda k: k * factor)


def main():
    _start_stall_heartbeat()
    import jax
    import jax.numpy as jnp

    from cvpce_tpu.data.synthetic import SyntheticShelfDataset
    from cvpce_tpu.models.embedders import MACVGG, fold_bn_variables
    from cvpce_tpu.models.gln import GLN, GLNConfig, postprocess_detections
    from cvpce_tpu.ops.image import crop_resize_square_mxu, scale_to_tanh

    platform = jax.devices()[0].platform
    # TPU-sized config on accelerators; shrink on CPU so the bench completes
    if platform == "cpu":
        config = GLNConfig(canvas_h=256, canvas_w=320,
                           max_nms_candidates=512, detections_per_img=128)
        batch = 1
        embed_chunk = 32
        iters, warmup = 3, 1
        shelves = (3, 5)
    else:
        # bf16 conv stacks (MXU-native) + Pallas NMS + approx top-k;
        # full-parity NMS candidate budget (5120) stays default
        config = GLNConfig(compute_dtype="bfloat16", use_pallas_nms=True,
                           use_approx_topk=True)
        batch = int(os.environ.get("CVPCE_BENCH_BATCH", "8"))
        embed_chunk = None  # chosen per embed mode below
        iters, warmup = 10, 3
        shelves = (6, 9)

    scenes = SyntheticShelfDataset(batch, config.canvas_h, config.canvas_w,
                                   seed=0, min_shelves=shelves[0],
                                   max_shelves=shelves[1])
    items = [scenes[i] for i in range(batch)]
    images = jnp.asarray(np.stack([it["image"] for it in items]))
    gt_counts = [len(it["boxes"]) for it in items]
    log(f"shelf scenes: gt boxes/image = {gt_counts}")

    rng = jax.random.PRNGKey(0)
    gln = GLN(config=config, train=False)
    gln_vars = gln.init(rng, images[:1])
    # CVPCE_BENCH_WEIGHTS=<dir>: run the bench on a TRAINED detector
    # (a serving export from scripts/export_serving.py, e.g.
    # artifacts/gln_r3) instead of the calibrated random-init head.
    # Params are canvas-agnostic, so the export loads at either the
    # TPU (832x1344) or CPU (256x320) bench shape. The export's
    # calibration sidecar governs the operating point: serving
    # threshold (max-F1, pipeline/calibrate.py) sizes the embed
    # workload, and input_norm decides whether the raw-[0,1] bench
    # scenes need ImageNet normalization first (never hardcoded —
    # CLAUDE.md round-3 facts).
    weights_dir = os.environ.get("CVPCE_BENCH_WEIGHTS", "")
    serve_thresh = None
    if weights_dir:
        from cvpce_tpu.pipeline.calibrate import (resolve_input_norm,
                                                  resolve_threshold)
        from cvpce_tpu.pipeline.serving import load_gln_variables

        gln_vars = jax.device_put(load_gln_variables(weights_dir))
        serve_thresh = resolve_threshold("auto", weights_dir,
                                         default=config.score_thresh)
        input_norm = resolve_input_norm(weights_dir)
        if input_norm == "imagenet":
            from cvpce_tpu.data.transforms import normalize_imagenet

            images = jnp.asarray(
                normalize_imagenet(np.asarray(images, np.float32)))
        log(f"trained weights: {weights_dir} (serving threshold "
            f"{serve_thresh:.4f}, input_norm {input_norm})")
    anchors, level_counts = config.anchors()
    anchors_j = jnp.asarray(anchors)
    sizes = jnp.full((batch, 2), 0, jnp.float32).at[:, 0].set(
        config.canvas_h).at[:, 1].set(config.canvas_w)

    # --- calibrate the random head so score/NMS behavior is realistic ---
    # (skipped entirely for trained weights: their logits ARE the
    # production distribution)
    if not weights_dir:
        raw_logits = np.asarray(
            gln.apply(gln_vars, images[:1])["cls_logits"])
        sigma = float(raw_logits.std())
        factor = float(np.clip(0.5 / max(sigma, 1e-6), 1.0, 1000.0))
        gln_vars = _scale_cls_kernel(gln_vars, factor)
        raw_logits = np.asarray(
            gln.apply(gln_vars, images[:1])["cls_logits"])
        log(f"logit spread: raw sigma {sigma:.4f}, kernel x{factor:.1f} "
            f"-> sigma {raw_logits.std():.3f}")

    # Detector numerics: int8-static trunk/FPN/towers by default (AP on
    # the trained 3000-step checkpoint: bf16 0.8887 vs int8 0.8882 —
    # parity; reports/detector_int8_r2.log). CVPCE_BENCH_DETECT=bf16
    # keeps the bf16 path. Act scales calibrate here, BEFORE the head
    # bisection: the head edits only touch the (unquantized) cls_logits
    # predictor, so the quantized convs' activations are unaffected —
    # and the bisection then measures the actual serving numerics.
    if platform == "cpu":
        detect_mode = "f32"
    else:
        raw_d = os.environ.get("CVPCE_BENCH_DETECT", "")
        detect_mode = "bf16" if raw_d in ("0", "bf16") else "int8"
    log(f"detect numerics: {detect_mode}")
    import dataclasses

    # CVPCE_BENCH_NMS_CANDIDATES=<n>: shrink the NMS candidate budget
    # below the full-parity 5120 (serving option, non-default; Pareto
    # row — recall cost measured by scripts/pareto_study.py)
    nms_budget = int(os.environ.get("CVPCE_BENCH_NMS_CANDIDATES", "0"))
    if nms_budget:
        config = dataclasses.replace(config, max_nms_candidates=nms_budget)
        log(f"NMS candidate budget: {nms_budget} (serving option, "
            f"non-default)")

    serve_cfg = config
    # CVPCE_BENCH_GAUSS=0: serving option that gates the Gaussian
    # heatmap branch (GLNConfig.with_gaussians) — nothing in the
    # detect->classify->compliance path consumes it. NOT the default:
    # the reference computes the heatmap unconditionally, so the
    # comparable-work bench keeps it (see PERF.md for the gated number).
    if os.environ.get("CVPCE_BENCH_GAUSS", "1") in ("0", "off"):
        serve_cfg = dataclasses.replace(serve_cfg, with_gaussians=False)
        log("gaussian branch: GATED (serving option, non-default)")
    # CVPCE_BENCH_IM2COL=1: thin-Cin convs (detector stem + embed
    # conv1_1) as explicit im2col contractions (layers.Im2colConv,
    # exact) — avoids XLA's Cin=3 -> 128-lane padding (PERF.md r4).
    use_im2col = os.environ.get("CVPCE_BENCH_IM2COL", "0") in ("1", "on")
    if use_im2col:
        serve_cfg = dataclasses.replace(serve_cfg, stem_im2col=True)
        log("thin-Cin convs: im2col (serving option, non-default)")
    # CVPCE_BENCH_FOLD_FBN=1: serve the backbone with FrozenBN folded
    # into conv kernels/biases (models/gln.py:fold_gln_backbone, exact).
    # Non-default until the r4 profile shows it beats XLA's own fusion.
    if os.environ.get("CVPCE_BENCH_FOLD_FBN", "0") in ("1", "on"):
        from cvpce_tpu.models.gln import fold_gln_backbone

        serve_cfg = dataclasses.replace(serve_cfg, fold_backbone_fbn=True)
        gln_vars = fold_gln_backbone(gln_vars)
        log("backbone FBN: FOLDED (serving option, non-default)")
    if detect_mode == "int8":
        from cvpce_tpu.models.quant import calibrate_act_scales

        cal_gln = GLN(config=dataclasses.replace(serve_cfg,
                                                 int8="calibrate"),
                      train=False)
        gln_vars = calibrate_act_scales(cal_gln, gln_vars, [images])
        gln_serve = GLN(config=dataclasses.replace(serve_cfg,
                                                   int8="static"),
                        train=False)
    elif serve_cfg is not config:
        gln_serve = GLN(config=serve_cfg, train=False)
    else:
        gln_serve = gln

    @jax.jit
    def detect(variables, imgs):
        outputs = gln_serve.apply(variables, imgs)
        res = postprocess_detections(outputs, anchors_j, level_counts,
                                     sizes, config)
        return res["boxes"], res["scores"], res["valid"]

    gt_mean = float(np.mean(gt_counts))

    if weights_dir:
        # Trained head: no bisection — measure NMS survivors at the
        # export's CALIBRATED serving threshold (not the 0.05
        # postprocess floor, which would inflate the embed workload
        # with dets production never embeds — ADVICE r3).
        _, t_scores, t_valid = detect(gln_vars, images)
        det_counts = np.asarray(
            (np.asarray(t_valid)
             & (np.asarray(t_scores) > serve_thresh)).sum(axis=1))
        log(f"trained-head dets/image at score>{serve_thresh:.4f}: "
            f"{det_counts.tolist()} (gt mean {gt_mean:.0f})")
    else:
        def count_dets(shift):
            cal = _shift_cls_bias(gln_vars, shift)
            _, scores, valid = detect(cal, images)
            n_det = np.asarray(
                (np.asarray(valid)
                 & (np.asarray(scores) > config.score_thresh)).sum(axis=1))
            return cal, n_det

        # The cls bias is shared across FPN levels while per-level logit
        # distributions differ, so a quantile-derived shift is
        # unreliable — bisect the shift against the MEASURED
        # NMS-survivor count instead, targeting the scenes'
        # ground-truth product density.
        hi = float(SCORE_THRESH_LOGIT - np.quantile(raw_logits, 0.999))
        # make sure the bracket actually straddles the target: hi must
        # OVERshoot and lo must undershoot
        cal, n_hi = count_dets(hi)
        tries = 0
        while n_hi.mean() < gt_mean and tries < 6:
            hi += 2.0
            cal, n_hi = count_dets(hi)
            tries += 1
        best = (abs(n_hi.mean() - gt_mean), cal, n_hi)
        lo = hi - 6.0
        cal, n_det = count_dets(lo)
        tries = 0
        while n_det.mean() > gt_mean and tries < 6:
            hi, lo = lo, lo - 4.0
            cal, n_det = count_dets(lo)
            tries += 1
        if abs(n_det.mean() - gt_mean) < best[0]:
            best = (abs(n_det.mean() - gt_mean), cal, n_det)
        for _ in range(10):
            mid = (lo + hi) / 2
            cal, n_det = count_dets(mid)
            log(f"calibration shift={mid:.3f}: counts = {n_det.tolist()}")
            if abs(n_det.mean() - gt_mean) < best[0]:
                best = (abs(n_det.mean() - gt_mean), cal, n_det)
            if n_det.mean() > gt_mean:
                hi = mid
            else:
                lo = mid
            if best[0] < 0.15 * gt_mean:
                break
        _, gln_vars, det_counts = best
        log(f"calibrated to mean {det_counts.mean():.0f} dets/image "
            f"(gt mean {gt_mean:.0f})")

    # bucket from the MEAN count: the production pipeline re-batches
    # crops host-side (pipeline/proposals.py -> Classifier chunks), so
    # total embed work tracks the mean detections/image; per-image
    # padding to p95 would overstate it
    target = int(min(det_counts.mean(), config.detections_per_img))
    crops_per_image = next((b for b in CROP_BUCKETS if b >= target),
                           CROP_BUCKETS[-1])
    over = np.maximum(det_counts - crops_per_image, 0).sum()
    log(f"detections beyond bucket (not embedded): {int(over)} of "
        f"{int(det_counts.sum())}")
    if os.environ.get("CVPCE_BENCH_FIXED_CROPS"):
        # comparability override (round-1 measured a fixed 128)
        crops_per_image = int(os.environ["CVPCE_BENCH_FIXED_CROPS"])
    total_crops = batch * crops_per_image
    log(f"crop bucket: {crops_per_image} (mean detections {target})")

    # Embed numerics: calibrated static-scale int8 MXU convs by default
    # (all convs but conv1_1) — measured 1.43x over bf16 on v5e with
    # task metrics preserved on trained weights (triplet/top-1 within
    # noise, top-1 agreement vs f32 at bf16's own level; PERF.md r2,
    # reports/int8_fidelity_trained_r2.log). Set CVPCE_BENCH_EMBED=bf16
    # (or CVPCE_BENCH_INT8=0) for the bf16 parity path.
    if platform == "cpu":
        embed_mode = "f32"
    else:
        raw = (os.environ.get("CVPCE_BENCH_EMBED")
               or os.environ.get("CVPCE_BENCH_INT8", ""))
        embed_mode = "bf16" if raw in ("0", "bf16") else "int8"
    log(f"embed numerics: {embed_mode}")
    use_int8 = embed_mode == "int8"
    # --- structural Pareto knobs (VERDICT r4 #4): labeled NON-parity
    # serving options. Accuracy deltas for each are measured on the
    # synthetic validation by scripts/pareto_study.py; PERF.md holds the
    # img/s-vs-accuracy table. Defaults keep the parity workload.
    # CVPCE_BENCH_CROP_RES=<n>: classification crop resolution (parity:
    # 256, the reference's SCALED_IMAGE_SIZE); embed FLOPs scale ~n^2.
    crop_res = int(os.environ.get("CVPCE_BENCH_CROP_RES", "256"))
    if crop_res != 256:
        log(f"crop resolution: {crop_res} (serving option, non-default)")
    # CVPCE_BENCH_EMBED_MODEL=macresnet: MACResNet-1536 (ResNet-50 c3+c4
    # MAC) instead of MACVGG-256 — deeper trunk, much better MXU shapes.
    embed_model = os.environ.get("CVPCE_BENCH_EMBED_MODEL", "macvgg")
    if embed_model != "macvgg":
        log(f"embed model: {embed_model} (serving option, non-default)")
    if embed_chunk is None:
        # measured best chunks for 512 crops: int8-static 87.6 ms at 128
        # vs 89.6 at 256 (profile_embed_layers_static); bf16 137.5 at
        # 256 vs 144.2 at 128 (profile_r2)
        embed_chunk = 128 if use_int8 else 256
    embed_chunk = min(embed_chunk, total_crops)
    while total_crops % embed_chunk:
        embed_chunk //= 2
    log(f"embed chunk: {embed_chunk}")
    # Serving embedder: BN folded into the convs (exact at eval; removes
    # the unfused BN bandwidth passes — PERF.md r2 layer profile), then
    # int8-static quantization on the folded weights.
    dtype = jnp.bfloat16 if platform != "cpu" else jnp.float32
    if embed_model == "macresnet":
        from cvpce_tpu.models.embedders import MACResNet

        embedder = MACResNet(dtype=dtype,
                             quant="static" if use_int8 else None)
        emb_vars = MACResNet(dtype=dtype).init(
            jax.random.PRNGKey(1),
            jnp.zeros((8, crop_res, crop_res, 3), jnp.float32))
    else:
        bn_model = MACVGG(batch_norm=True)
        bn_vars = bn_model.init(jax.random.PRNGKey(1),
                                jnp.zeros((8, crop_res, crop_res, 3),
                                          jnp.float32))
        embedder = MACVGG(batch_norm=False, int8_all=use_int8,
                          int8_static=use_int8, dtype=dtype,
                          im2col_conv1=use_im2col)
        emb_vars = fold_bn_variables(bn_vars)
    if use_int8:
        # calibrate activation scales on real crops from one detect
        # pass (production calibrates on the gallery at index build);
        # reuses the already-compiled `detect` + a small crop-only jit
        # instead of compiling another full detect graph
        from cvpce_tpu.models.embedders import calibrate_int8_scales

        @jax.jit
        def crops_of(imgs, boxes):
            top_boxes = boxes[:, :crops_per_image]
            crops = jax.vmap(
                lambda im, bx: crop_resize_square_mxu(
                    im, bx, out_size=crop_res))(imgs, top_boxes)
            return scale_to_tanh(crops).reshape(
                batch * crops_per_image, crop_res, crop_res, 3)

        boxes_cal, _, _ = detect(gln_vars, images)
        if embed_model == "macresnet":
            cal_model = embedder.clone(quant="calibrate")
        else:
            cal_model = embedder.clone(int8_static=False,
                                       int8_calibrate=True)
        emb_vars = calibrate_int8_scales(
            cal_model, emb_vars,
            [crops_of(images, boxes_cal)[:embed_chunk]])

    @jax.jit
    def detect_embed(imgs):
        outputs = gln_serve.apply(gln_vars, imgs)
        res = postprocess_detections(outputs, anchors_j, level_counts,
                                     sizes, config)
        top_boxes = res["boxes"][:, :crops_per_image]

        crops = jax.vmap(
            lambda im, bx: crop_resize_square_mxu(
                im, bx, out_size=crop_res))(imgs, top_boxes)
        crops = scale_to_tanh(crops).reshape(
            batch * crops_per_image, crop_res, crop_res, 3)
        # chunk the embed stage to bound peak HBM
        chunked = crops.reshape(-1, embed_chunk, crop_res, crop_res, 3)
        embs = jax.lax.map(lambda c: embedder.apply(emb_vars, c), chunked)
        return res["boxes"], res["scores"], embs

    # warmup + compile
    for _ in range(warmup):
        out = detect_embed(images)
    jax.block_until_ready(out)

    start = time.perf_counter()
    for _ in range(iters):
        out = detect_embed(images)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    images_per_sec = batch * iters / elapsed
    print(json.dumps({
        "metric": "detect_embed_images_per_sec_per_chip",
        "value": round(images_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / REFERENCE_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
