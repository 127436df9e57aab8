"""GLN convergence run on synthetic shelves (VERDICT r1 #4).

Trains GLN from random init on deterministic synthetic shelf scenes
(data/synthetic.py) through the real training loop
(train/loops.py:train_proposal_generator, compiled 25-step scan chunks)
in ONE loop invocation (one train-step compile), evaluating AP@0.5 on a
held-out split each epoch via the shared inference compilation. Proves on
real TPU: loss decreases, AP goes ~0 -> >0.5, and reports train
images/sec (steady-state median, excluding compile chunks).

Run: python scripts/train_convergence.py [--canvas 256 320] [--epochs 30]
Prints JSON lines; final line has the summary.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class TargetReached(Exception):
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--canvas", nargs=2, type=int, default=(256, 320))
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--train-n", type=int, default=200)
    ap.add_argument("--eval-n", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--steps-per-call", type=int, default=25)
    ap.add_argument("--lr", type=float, default=0.0025)
    ap.add_argument("--out", default="/tmp/convergence_run")
    ap.add_argument("--target-ap", type=float, default=0.8)
    ap.add_argument("--scene-mix", choices=["shelf", "plano", "mixed"],
                    default="shelf",
                    help="training distribution: shelf_scene only "
                         "(r1/r2 behavior), planogram scenes only, or "
                         "a round-robin mix — the production detector "
                         "must see the planogram distribution "
                         "(r2 e2e: precision 0.46 without it)")
    ap.add_argument("--domain-shift", type=float, default=0.0,
                    help="MAX photometric deployment-shift strength; "
                         "each training/eval scene samples its own "
                         "strength in [0, max] so one run covers clean "
                         "through fully-shifted (the r4 shifted e2e "
                         "collapse was detector-dominated: recall 0.68 "
                         "vs 0.93 in-domain)")
    ap.add_argument("--perspective", type=float, default=0.0,
                    help="MAX perspective-warp strength, sampled per "
                         "scene like --domain-shift; box gt tracks the "
                         "warp")
    ap.add_argument("--plano-styles", type=int, default=12,
                    help="archetype count for planogram scenes (the "
                         "shifted e2e validation serves 64)")
    ap.add_argument("--det-per-img", type=int, default=256,
                    help="detections_per_img (production parity: 1000, "
                         "cvpce/models/proposals.py:164-165)")
    ap.add_argument("--nms-candidates", type=int, default=1024)
    ap.add_argument("--checkpoint-interval", type=int, default=0,
                    help="rotating-save every N steps; 0 = only the "
                         "unconditional end-of-epoch save (each save "
                         "fetches the full ~390 MB train state through "
                         "the tunnel at ~25 MB/s — mid-epoch saves are "
                         "pure overhead for short epochs)")
    ap.add_argument("--calibrate", action="store_true",
                    help="after training, pick the max-F1 serving "
                         "threshold on held-out planogram scenes and "
                         "save serving_calibration.json into --out")
    ap.add_argument("--init-from", default=None,
                    help="warm-start params/frozen/batch_stats from a "
                         "serving export or training-run dir (e.g. "
                         "artifacts/gln_r3); optimizer state starts "
                         "fresh — the fine-tune path for adapting a "
                         "converged detector (e.g. shift augmentation) "
                         "at a fraction of from-scratch cost")
    ap.add_argument("--resume", action="store_true",
                    help="continue from --out's rotating checkpoint "
                         "(epoch counter resumes; raise --epochs past "
                         "the prior run's count)")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU platform (logic smoke; the axon "
                         "plugin otherwise forces the tunneled TPU)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from cvpce_tpu.data.synthetic import (InterleavedDataset,
                                          PlanogramSceneDetectionSet,
                                          SyntheticShelfDataset)
    from cvpce_tpu.eval.proposals import evaluate_gln
    from cvpce_tpu.models.gln import GLNConfig
    from cvpce_tpu.train.gln import GLNTrainConfig
    from cvpce_tpu.train.loops import train_proposal_generator

    h, w = args.canvas
    platform = jax.devices()[0].platform
    print(json.dumps({"platform": platform, "canvas": [h, w],
                      "scene_mix": args.scene_mix,
                      "det_per_img": args.det_per_img,
                      "domain_shift": args.domain_shift,
                      "perspective": args.perspective,
                      "plano_styles": args.plano_styles}), flush=True)

    model_cfg = GLNConfig(
        canvas_h=h, canvas_w=w, max_nms_candidates=args.nms_candidates,
        detections_per_img=args.det_per_img,
        use_pallas_nms=platform not in ("cpu",))
    train_cfg = GLNTrainConfig(lr=args.lr, match_chunk=8192,
                               min_negatives=256)
    # scenes scale: fewer shelves at small canvas so boxes stay >12px
    shelves = (3, 5) if h <= 320 else (4, 8)

    def shelf_set(n, seed):
        return SyntheticShelfDataset(n, h, w, seed=seed,
                                     min_shelves=shelves[0],
                                     max_shelves=shelves[1],
                                     domain_shift=args.domain_shift,
                                     perspective=args.perspective)

    def plano_set(n, seed):
        # match the e2e validation's planogram_scene defaults (3..5
        # shelves) exactly — the detector must see the distribution the
        # pipeline serves, including the tall-product 3-shelf layouts
        return PlanogramSceneDetectionSet(
            n, h, w, seed=seed, min_shelves=3,
            max_shelves=min(shelves[1], 5),
            n_styles=args.plano_styles,
            domain_shift=args.domain_shift,
            perspective=args.perspective)

    if args.scene_mix == "shelf":
        trainset = shelf_set(args.train_n, 0)
        evalset = shelf_set(args.eval_n, 10_000)
    elif args.scene_mix == "plano":
        trainset = plano_set(args.train_n, 0)
        evalset = plano_set(args.eval_n, 10_000)
    else:
        trainset = InterleavedDataset(shelf_set(args.train_n // 2, 0),
                                      plano_set(args.train_n // 2, 0))
        evalset = InterleavedDataset(shelf_set(args.eval_n // 2, 10_000),
                                     plano_set(args.eval_n // 2, 10_000))

    ap_history = []

    def report(**stats):
        """hyperopt_report hook — fires after each epoch eval; raises to
        early-stop the single loop invocation once the target is hit."""
        ap_history.append(stats["average_precision"])
        print(json.dumps({"epoch": len(ap_history) - 1,
                          "ap": round(stats["average_precision"], 4),
                          "ar300": round(stats.get("ar_300", 0.0), 4),
                          "wall": round(time.time() - t0, 1)}), flush=True)
        if stats["average_precision"] >= args.target_ap:
            raise TargetReached

    t0 = time.time()
    try:
        ckpt_interval = args.checkpoint_interval or 1_000_000_000
        train_proposal_generator(
            trainset, evalset, args.out, model_cfg=model_cfg,
            train_cfg=train_cfg, batch_size=args.batch_size,
            epochs=args.epochs, checkpoint_interval=ckpt_interval,
            eval_interval=1, eval_threshold=0.5, use_mesh=False,
            steps_per_call=args.steps_per_call, hyperopt_report=report,
            resume=args.resume, load_orbax=args.init_from, seed=0)
    except TargetReached:
        print(json.dumps({"early_stop": True}), flush=True)

    # final state = the rotating checkpoint (checkpoint_interval ==
    # steps_per_call puts it at the last chunk boundary)
    from cvpce_tpu.train.checkpoint import CheckpointManager
    from cvpce_tpu.train.gln import init_train_state

    state, _ = init_train_state(model_cfg, train_cfg, jax.random.PRNGKey(0))
    manager = CheckpointManager(args.out)
    state = manager.restore(state)

    # loss trajectory from the per-epoch stats dumps (latest two kept)
    losses = {}
    for e in range(args.epochs):
        f = os.path.join(args.out, f"stats_{e}.json")
        if os.path.exists(f):
            with open(f) as fh:
                s = json.load(fh)
            losses[e] = s

    final = evaluate_gln(
        {"params": state.params, "frozen": state.frozen,
         "batch_stats": state.batch_stats},
        evalset, model_cfg, thresholds=(0.5,), batch_size=args.batch_size)
    stats = final[0.5]

    # steady-state step time: median over the last epoch's chunks
    last_e = max(losses) if losses else None
    imgs_per_sec = None
    if last_e is not None:
        bt = np.asarray(losses[last_e]["batch_times"])
        imgs_per_sec = round(args.batch_size / float(np.median(bt)), 1)
        first_e = min(losses)
        mean_first = float(np.mean(
            np.asarray(losses[first_e]["class_loss"])
            + np.asarray(losses[first_e]["reg_loss"])
            + np.asarray(losses[first_e]["gauss_loss"])))
        mean_last = float(np.mean(
            np.asarray(losses[last_e]["class_loss"])
            + np.asarray(losses[last_e]["reg_loss"])
            + np.asarray(losses[last_e]["gauss_loss"])))
    if args.calibrate:
        from cvpce_tpu.pipeline.calibrate import (calibrate_confidence,
                                                  save_calibration)

        calset = plano_set(args.eval_n, 20_000)
        cal = calibrate_confidence(
            {"params": state.params, "frozen": state.frozen,
             "batch_stats": state.batch_stats},
            model_cfg, calset, batch_size=args.batch_size,
            input_norm="raw01")  # synthetic sets feed [0,1] images
        save_calibration(args.out, cal)
        print(json.dumps({"calibration": cal}), flush=True)

    summary = {
        "final_ap": round(float(stats["ap"]), 4),
        "final_ar300": round(float(stats["ar_300"]), 4),
        "epochs": len(ap_history),
        "ap_history": [round(a, 4) for a in ap_history],
        "train_imgs_per_sec_steady": imgs_per_sec,
        "mean_loss_epoch_first_kept": round(mean_first, 4)
        if last_e is not None else None,
        "mean_loss_epoch_last": round(mean_last, 4)
        if last_e is not None else None,
        "wall_sec": round(time.time() - t0, 1),
        "converged": bool(stats["ap"] > 0.5),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
