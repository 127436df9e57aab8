"""GLN convergence run on synthetic shelves (VERDICT r1 #4).

Trains GLN from random init on deterministic synthetic shelf scenes
(data/synthetic.py) through the real training loop
(train/loops.py:train_proposal_generator, compiled 25-step scan chunks),
evaluating AP@0.5 on a held-out split each epoch. Proves on real TPU:
loss decreases, AP goes ~0 -> >0.5, and reports train images/sec.

Run: python scripts/train_convergence.py [--canvas 256 320] [--epochs 30]
Prints JSON lines; final line has the summary.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    ap.add_argument("--trace", default=None,
                    help="write a jax profiler trace of 2 chunks here")
    args = ap.parse_args()

    import jax
    import numpy as np

    from cvpce_tpu.data.synthetic import SyntheticShelfDataset
    from cvpce_tpu.eval.proposals import evaluate_gln
    from cvpce_tpu.models.gln import GLNConfig
    from cvpce_tpu.train.gln import GLNTrainConfig
    from cvpce_tpu.train.loops import train_proposal_generator

    h, w = args.canvas
    platform = jax.devices()[0].platform
    print(json.dumps({"platform": platform, "canvas": [h, w]}), flush=True)

    model_cfg = GLNConfig(
        canvas_h=h, canvas_w=w, max_nms_candidates=1024,
        detections_per_img=256,
        use_pallas_nms=platform not in ("cpu",))
    train_cfg = GLNTrainConfig(lr=args.lr, match_chunk=8192,
                               min_negatives=256)
    # scenes scale: fewer shelves at small canvas so boxes stay >12px
    shelves = (3, 5) if h <= 320 else (4, 8)
    trainset = SyntheticShelfDataset(args.train_n, h, w, seed=0,
                                     min_shelves=shelves[0],
                                     max_shelves=shelves[1])
    evalset = SyntheticShelfDataset(args.eval_n, h, w, seed=10_000,
                                    min_shelves=shelves[0],
                                    max_shelves=shelves[1])

    ap_history = []
    loss_history = []

    def report(**stats):
        """hyperopt_report hook — fires after each epoch eval."""
        ap_history.append(stats["average_precision"])
        print(json.dumps({"epoch": len(ap_history) - 1,
                          "ap": round(stats["average_precision"], 4),
                          "ar300": round(stats.get("ar_300", 0.0), 4)}),
              flush=True)

    t0 = time.time()
    epochs_run = 0
    result = None
    for e in range(args.epochs):
        # checkpoint_interval == steps_per_call makes the rotating
        # checkpoint land exactly at end-of-epoch, so resume=True on the
        # next call continues from the true final state
        result = train_proposal_generator(
            trainset, evalset, args.out, model_cfg=model_cfg,
            train_cfg=train_cfg, batch_size=args.batch_size, epochs=1,
            checkpoint_interval=args.steps_per_call, eval_interval=1,
            eval_threshold=0.5,
            use_mesh=False, steps_per_call=args.steps_per_call,
            hyperopt_report=report, resume=e > 0, seed=0)
        epochs_run += 1
        stats_file = os.path.join(args.out, f"stats_{e}.json")
        if os.path.exists(stats_file):
            with open(stats_file) as f:
                s = json.load(f)
            mean_loss = float(np.mean(
                np.asarray(s["class_loss"]) + np.asarray(s["reg_loss"])
                + np.asarray(s["gauss_loss"])))
            bt = np.asarray(s["batch_times"])
            loss_history.append(mean_loss)
            print(json.dumps({
                "epoch_wall": round(time.time() - t0, 1),
                "mean_loss": round(mean_loss, 4),
                "imgs_per_sec": round(
                    args.batch_size / float(np.median(bt)), 1)}), flush=True)
        if ap_history and ap_history[-1] >= args.target_ap:
            break

    if args.trace and result is not None:
        try:
            from cvpce_tpu.utils.profiling import trace

            with trace(args.trace):
                train_proposal_generator(
                    SyntheticShelfDataset(2 * args.steps_per_call
                                          * args.batch_size, h, w, seed=7,
                                          min_shelves=shelves[0],
                                          max_shelves=shelves[1]),
                    evalset, args.out, model_cfg=model_cfg,
                    train_cfg=train_cfg, batch_size=args.batch_size,
                    epochs=1, checkpoint_interval=10_000, eval_interval=99,
                    use_mesh=False, steps_per_call=args.steps_per_call,
                    resume=True, seed=7)
            print(json.dumps({"trace": args.trace}), flush=True)
        except Exception as exc:  # noqa: BLE001 — trace is best-effort
            print(json.dumps({"trace_error": str(exc)[-300:]}), flush=True)

    state = result["state"]
    final = evaluate_gln(
        {"params": state.params, "frozen": state.frozen,
         "batch_stats": state.batch_stats},
        evalset, model_cfg, thresholds=(0.5,), batch_size=args.batch_size)
    stats = final[0.5]
    summary = {
        "final_ap": round(float(stats["ap"]), 4),
        "final_ar300": round(float(stats["ar_300"]), 4),
        "epochs": epochs_run,
        "loss_first_epoch": round(loss_history[0], 4) if loss_history
        else None,
        "loss_last_epoch": round(loss_history[-1], 4) if loss_history
        else None,
        "ap_history": [round(a, 4) for a in ap_history],
        "wall_sec": round(time.time() - t0, 1),
        "converged": bool(stats["ap"] > 0.5),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
