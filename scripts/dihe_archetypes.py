"""DIHE training in the archetype domain the e2e validation classifies.

Round-2 diagnosis (VERDICT r2, weak #2): the trained DIHE embedder
scored gt-crop top-1 0.58 where random init scored 0.97 — because the
r2 checkpoint was trained on a DIFFERENT synthetic taxonomy
(scripts/dihe_convergence.py stripe textures) than the archetype gallery
the e2e pipeline classifies. The reference never does that: it trains on
the deployment gallery (GP products) with scene crops as the target
domain (cvpce/cli/dihe.py:135-147). This script reproduces that recipe
on the archetype domain (data/synthetic.py:ArchetypeGallerySet /
SceneCropSet) and runs the ablation VERDICT asks for:

  baseline  — random-init MACVGG (warmed BN), the 0.97 bar to beat
  triplet   — pure supervised hierarchical-triplet training (no GAN)
  3player   — the full GAN-anchored DIHE loop (train/loops.py:train_dihe)

All modes evaluate the SAME task: gallery-index classification of
gt-box crops from held-out planogram scenes (eval_dihe protocol,
cvpce/classification_eval.py:6-56), i.e. exactly the e2e pipeline's
classify stage. Checkpoints land in --out (train_dihe's rotating
embedder_checkpoint), directly loadable by scripts/e2e_trained_pipeline
--dihe.

Run (TPU): python scripts/dihe_archetypes.py --mode both --epochs 12
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def report(**kw):
    print(json.dumps(kw), flush=True)


def make_eval(styles, canvas, n_scenes, batch_size,
              domain_shift=0.0, perspective=0.0):
    """Returns eval_fn(enc_fn) -> gt-crop top-1 over held-out scenes.

    domain_shift/perspective apply to the SCENES only (the gallery
    index stays clean catalog renders) — the synthetic analogue of the
    web-image->shelf-photo gap (cvpce/classification_training.py:
    303-320)."""
    from cvpce_tpu.data.synthetic import (ArchetypeGallerySet,
                                          PlanogramQuerySet)
    from cvpce_tpu.eval.classification import eval_dihe

    gallery_eval = ArchetypeGallerySet(styles, views=1, seed=9)
    queries = PlanogramQuerySet(styles, n=n_scenes, canvas_h=canvas[0],
                                canvas_w=canvas[1],
                                domain_shift=domain_shift,
                                perspective=perspective)

    def eval_fn(enc_fn):
        acc = eval_dihe(enc_fn, 1024, gallery_eval, queries,
                        batch_size=batch_size, k=(1,), verbose=False)
        return float(acc[1])

    return eval_fn


def warmed_encoder(params, stats, gallery, batch_size):
    """Eval-mode encoder with BN stats settled on clean gallery views
    (same recipe as the e2e loader, scripts/e2e_trained_pipeline.py)."""
    import jax
    import jax.numpy as jnp

    from cvpce_tpu.models.embedders import MACVGG

    model_t = MACVGG(batch_norm=True, train=True)
    model_e = MACVGG(batch_norm=True, train=False)

    @jax.jit
    def warm(stats, batch):
        _, mut = model_t.apply({"params": params, "batch_stats": stats},
                               batch, mutable=["batch_stats"])
        return mut["batch_stats"]

    rng = np.random.default_rng(7)
    for _ in range(40):
        idx = rng.integers(0, len(gallery), batch_size)
        batch = np.stack([gallery[int(i)][0] for i in idx])
        stats = warm(stats, jnp.asarray(batch))

    encode = jax.jit(model_e.apply)

    def enc_fn(imgs):
        return encode({"params": params, "batch_stats": stats}, imgs)

    return enc_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["baseline", "triplet", "augtriplet",
                                       "shiftpos", "3player", "both"],
                    default="both",
                    help="augtriplet = triplet with ANCHORS passed "
                         "through apply_domain_shift at per-sample "
                         "strength U[0, --domain-shift]: the classical "
                         "no-GAN augmentation baseline the 3-player "
                         "machinery must beat to earn its complexity "
                         "(the reference's GAN exists to synthesize "
                         "exactly this domain translation, "
                         "cvpce/classification_training.py:303-320). "
                         "shiftpos = shifted-POSITIVES triplet (VERDICT "
                         "r4 task-2 lever (a)): anchor stays the clean "
                         "canonical render (the index side), positive "
                         "is a SHIFTED other view of the same product "
                         "and the negative a SHIFTED view of another — "
                         "the encoder is trained on exactly the "
                         "clean-index-vs-shifted-query correspondence "
                         "it must serve")
    ap.add_argument("--texture", action="store_true",
                    help="texture-carried archetype identity "
                         "(product_styles(texture=True), NEXT.md r5 "
                         "#1): on the color-carried task, shift "
                         "invariance and identity are structurally "
                         "opposed (the shift perturbs the identity "
                         "channel itself), so no trained arm can beat "
                         "random init; with texture identity they are "
                         "compatible — the regime real packaging and "
                         "the reference's DIHE training live in")
    ap.add_argument("--bn-adapt", action="store_true",
                    help="additionally evaluate every arm with BN "
                         "stats warmed on a 50/50 mix of clean gallery "
                         "renders and SHIFTED scene crops (lever (c): "
                         "serving-side BN-statistics adaptation, no "
                         "retraining)")
    ap.add_argument("--products", type=int, default=12)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--canvas", nargs=2, type=int, default=(832, 1344))
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--gan-steps", type=int, default=200)
    ap.add_argument("--enc-lr", type=float, default=2e-6)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--eval-scenes", type=int, default=6)
    ap.add_argument("--disc-crops", type=int, default=192)
    ap.add_argument("--domain-shift", type=float, default=0.0,
                    help="photometric deployment-domain shift strength "
                         "for scenes (gallery stays clean) — the r4 "
                         "hardened ablation uses 0.7")
    ap.add_argument("--perspective", type=float, default=0.0,
                    help="perspective warp strength for scenes")
    ap.add_argument("--out", default="/tmp/dihe_archetypes")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cvpce_tpu.data.synthetic import (ArchetypeGallerySet,
                                          SceneCropSet, apply_domain_shift,
                                          product_styles)
    from cvpce_tpu.models.embedders import MACVGG
    from cvpce_tpu.train.dihe import DIHETrainConfig
    from cvpce_tpu.train.loops import pretrain_gan, train_dihe

    platform = jax.devices()[0].platform
    report(platform=platform, mode=args.mode, products=args.products,
           texture=args.texture)

    styles = product_styles(args.products, texture=args.texture)
    gallery = ArchetypeGallerySet(styles, views=args.views)
    discset = SceneCropSet(styles, n=args.disc_crops,
                           canvas_h=args.canvas[0],
                           canvas_w=args.canvas[1],
                           domain_shift=args.domain_shift,
                           perspective=args.perspective)
    eval_fn = make_eval(styles, args.canvas, args.eval_scenes,
                        args.batch_size,
                        domain_shift=args.domain_shift,
                        perspective=args.perspective)
    chance = 1.0 / args.products

    class _WarmList:
        """gallery-shaped adapter over a list of tanh images (for
        warmed_encoder's `gallery[i][0]` indexing)."""

        def __init__(self, imgs):
            self.imgs = imgs

        def __len__(self):
            return len(self.imgs)

        def __getitem__(self, i):
            return (self.imgs[i],)

    bn_mix = None
    if args.bn_adapt:
        # 50/50 clean gallery + shifted deployment crops (discset items
        # are [0,1]; gallery items are tanh) — lever (c)
        bn_mix = _WarmList(
            [gallery[i][0] for i in range(len(gallery))]
            + [discset[i] * 2.0 - 1.0 for i in range(len(discset))])

    def eval_arm(stage, params, stats, results):
        top1 = eval_fn(warmed_encoder(params, stats, gallery,
                                      args.batch_size))
        results[stage] = top1
        extra = {}
        if bn_mix is not None:
            adapt = eval_fn(warmed_encoder(params, stats, bn_mix,
                                           args.batch_size))
            results[stage + "+bnadapt"] = adapt
            extra["gt_crop_top1_bnadapt"] = round(adapt, 4)
        report(stage=stage, gt_crop_top1=round(top1, 4), **extra)
        return top1

    # --- baseline: random init (the bar every trained mode must beat) ---
    model = MACVGG(batch_norm=True, train=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3)))
    results = {}
    base_top1 = eval_arm("baseline", variables["params"],
                         variables["batch_stats"], results)
    report(stage="baseline", chance=round(chance, 4))
    if args.mode == "baseline":
        report(name="SUMMARY", chance=round(chance, 4),
               **{k: round(v, 4) for k, v in results.items()})
        return

    if args.mode in ("triplet", "augtriplet", "shiftpos", "both"):
        tri_stage = (args.mode if args.mode in ("augtriplet", "shiftpos")
                     else "triplet")
        aug_anchors = args.mode == "augtriplet"
        shift_pos = args.mode == "shiftpos"
        # pure-triplet ablation: clean-anchor supervised training through
        # the real 3-player step with the GAN players frozen is NOT what
        # we want to isolate; instead reuse the dihe loop but swap the
        # generator for identity by training with gan_state=None and
        # enc-only updates? The honest isolation is a dedicated loop:
        import optax

        from cvpce_tpu.ops.losses import hierarchical_triplet_loss
        from cvpce_tpu.train.dihe import hierarchy_similarity

        model_t = MACVGG(batch_norm=True, train=True)
        tri_vars = model_t.init(jax.random.PRNGKey(1),
                                jnp.zeros((2, 256, 256, 3)))
        params, stats = tri_vars["params"], tri_vars["batch_stats"]
        tx = optax.adam(args.enc_lr)
        opt = tx.init(params)
        b = args.batch_size

        @jax.jit
        def step(params, stats, opt, anchors, pos, neg, sim):
            def loss_fn(p):
                x = jnp.concatenate([anchors, pos, neg])
                emb, mut = model_t.apply(
                    {"params": p, "batch_stats": stats}, x,
                    mutable=["batch_stats"])
                return (hierarchical_triplet_loss(
                    emb[:b], emb[b:2 * b], emb[2 * b:], sim),
                    mut["batch_stats"])

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            upd, new_opt = tx.update(grads, opt, params)
            return (optax.apply_updates(params, upd), new_stats,
                    new_opt, loss)

        rng = np.random.default_rng(0)

        def shifted(img):
            """tanh gallery render -> photometrically shifted copy at
            per-sample strength U[0, max] (the deployment corruption)."""
            a01 = np.clip((img + 1.0) * 0.5, 0.0, 1.0).astype(np.float32)
            a01 = apply_domain_shift(
                a01, rng, float(rng.uniform(0, args.domain_shift)))
            return a01 * 2.0 - 1.0

        steps = args.epochs * max(1, len(gallery) // (2 * b))
        t0 = time.time()
        for it in range(steps):
            # anchor = scene-domain crop of product p (discset items are
            # unlabeled, so re-render crops with known identity)
            a_imgs, p_imgs, n_imgs, ph, nh = [], [], [], [], []
            for _ in range(b):
                pid = int(rng.integers(args.products))
                while True:
                    nid = int(rng.integers(args.products))
                    if nid != pid:
                        break
                j = int(rng.integers(1, args.views))
                if shift_pos and args.domain_shift > 0:
                    # clean-index-vs-shifted-query correspondence:
                    # anchor is the canonical render (what the serving
                    # index holds), positive/negative are shifted views
                    # (what the serving queries look like)
                    a = gallery[pid * args.views][0]
                    p = shifted(gallery[pid * args.views + j][0])
                    n = shifted(gallery[nid * args.views + int(
                        rng.integers(1, args.views))][0])
                else:
                    a = gallery[pid * args.views + j][0]
                    if aug_anchors and args.domain_shift > 0:
                        a = shifted(a)
                    p = gallery[pid * args.views][0]
                    n = gallery[nid * args.views][0]
                a_imgs.append(a)
                p_imgs.append(p)
                n_imgs.append(n)
                ph.append(gallery.hierarchies[pid])
                nh.append(gallery.hierarchies[nid])
            sim = jnp.asarray(hierarchy_similarity(ph, nh))
            params, stats, opt, loss = step(
                params, stats, opt, jnp.asarray(np.stack(a_imgs)),
                jnp.asarray(np.stack(p_imgs)),
                jnp.asarray(np.stack(n_imgs)), sim)
            if it % 20 == 0:
                report(stage=tri_stage, step=it,
                       loss=round(float(loss), 4))
        tri_top1 = eval_arm(tri_stage, params, stats, results)
        report(stage=tri_stage,
               improved_vs_baseline=bool(tri_top1 >= base_top1),
               wall=round(time.time() - t0, 1))

        # persist as a loadable embedder_checkpoint (same layout as
        # train_dihe's rotating save) in <out>_triplet so the e2e
        # validation can serve whichever trained mode wins
        from cvpce_tpu.train.checkpoint import CheckpointManager
        from cvpce_tpu.train.dihe import init_dihe_state

        template, _ = init_dihe_state(DIHETrainConfig(enc_lr=args.enc_lr),
                                      jax.random.PRNGKey(1))
        state_t = template.replace(emb_params=jax.device_get(params),
                                   emb_stats=jax.device_get(stats))
        CheckpointManager(args.out + "_" + tri_stage,
                          name="embedder_checkpoint").save_rotating(
            state_t, {"mode": tri_stage,
                      "gt_crop_top1": float(tri_top1)})

    if args.mode in ("3player", "both"):
        t0 = time.time()
        gan_epochs = max(1, args.gan_steps
                         // max(1, len(gallery) // args.batch_size))
        gan_result = pretrain_gan(gallery, discset, args.out,
                                  epochs=gan_epochs,
                                  batch_size=args.batch_size)
        gs = gan_result["state"]
        gan_state = {k: gs[k] for k in ("gen_params", "gen_stats",
                                        "disc_params", "disc_stats")}
        report(stage="gan", wall=round(time.time() - t0, 1))

        t0 = time.time()
        cfg = DIHETrainConfig(enc_lr=args.enc_lr)
        from cvpce_tpu.data.synthetic import PlanogramQuerySet

        gallery_eval = ArchetypeGallerySet(styles, views=1, seed=9)
        queries = PlanogramQuerySet(styles, n=args.eval_scenes,
                                    canvas_h=args.canvas[0],
                                    canvas_w=args.canvas[1],
                                    domain_shift=args.domain_shift,
                                    perspective=args.perspective)
        result = train_dihe(gallery, discset, gallery_eval, queries,
                            args.out, gan_state=gan_state,
                            epochs=args.epochs,
                            batch_size=args.batch_size,
                            checkpoint_interval=500, eval_interval=2,
                            train_cfg=cfg, use_mesh=False)
        state = result["state"]
        p3_top1 = eval_arm("3player", state.emb_params, state.emb_stats,
                           results)
        report(stage="3player",
               improved_vs_baseline=bool(p3_top1 >= base_top1),
               wall=round(time.time() - t0, 1))

    report(name="SUMMARY", chance=round(chance, 4),
           **{k: round(v, 4) for k, v in results.items()},
           trained_beats_random=bool(
               max([v for k, v in results.items()
                    if not k.startswith("baseline")],
                   default=0.0) >= base_top1))


if __name__ == "__main__":
    main()
    report(name="DONE")
