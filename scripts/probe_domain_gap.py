"""CPU probe: is the hardened DIHE ablation task off the ceiling?

VERDICT r3 weak #6: the 12-archetype gt-crop task sat at top-1 ~0.995
for random/triplet/3-player alike — no ablation can discriminate at
ceiling. Round 4 hardens the task (more archetypes + photometric/
perspective shift between clean gallery renders and scene crops,
data/synthetic.py:apply_domain_shift). Before burning gated TPU hours
on the retrain, this probe measures the RANDOM-INIT baseline on the
hardened task on CPU: if random-init is still >=0.95, the gap needs to
be harder; the sweet spot is a baseline low enough (~0.5-0.8) that
trained encoders have headroom to separate.

Run: python scripts/probe_domain_gap.py --products 64 --shifts 0 0.4 0.7 1.0
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--products", type=int, default=64)
    ap.add_argument("--shifts", nargs="+", type=float,
                    default=[0.0, 0.4, 0.7, 1.0])
    ap.add_argument("--perspective", type=float, default=0.5)
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--canvas", nargs=2, type=int, default=(416, 672))
    ap.add_argument("--warm-iters", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--gallery-augment", type=int, default=1,
                    help="index-time augmentation factor: each gallery "
                         "entry is indexed with N-1 extra domain-shifted "
                         "variants (AugmentedGallerySet) — serving-side "
                         "robustness, no retraining")
    ap.add_argument("--gallery-strength", type=float, default=0.7,
                    help="MAX shift strength for the indexed variants")
    ap.add_argument("--gallery-average", action="store_true",
                    help="collapse the augmented variants into one mean "
                         "embedding per product (expected embedding "
                         "under the shift) instead of multi-entry")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cvpce_tpu.data.synthetic import ArchetypeGallerySet, product_styles
    from cvpce_tpu.eval.classification import eval_dihe
    from cvpce_tpu.models.embedders import MACVGG

    styles = product_styles(args.products)
    gallery = ArchetypeGallerySet(styles, views=2)
    gallery_eval = ArchetypeGallerySet(styles, views=1, seed=9)
    if args.gallery_augment > 1:
        from cvpce_tpu.data.synthetic import AugmentedGallerySet

        gallery_eval = AugmentedGallerySet(
            gallery_eval, factor=args.gallery_augment,
            strength=args.gallery_strength)

    model = MACVGG(batch_norm=True, train=False)
    model_t = MACVGG(batch_norm=True, train=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3)))
    params, stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def warm(stats, batch):
        _, mut = model_t.apply({"params": params, "batch_stats": stats},
                               batch, mutable=["batch_stats"])
        return mut["batch_stats"]

    rng = np.random.default_rng(7)
    for _ in range(args.warm_iters):
        idx = rng.integers(0, len(gallery), args.batch_size)
        batch = np.stack([gallery[int(i)][0] for i in idx])
        stats = warm(stats, jnp.asarray(batch))

    encode = jax.jit(model.apply)

    def enc_fn(imgs):
        return encode({"params": params, "batch_stats": stats}, imgs)

    from cvpce_tpu.data.synthetic import PlanogramQuerySet

    for shift in args.shifts:
        queries = PlanogramQuerySet(
            styles, n=args.scenes, canvas_h=args.canvas[0],
            canvas_w=args.canvas[1], domain_shift=shift,
            perspective=args.perspective if shift > 0 else 0.0)
        t0 = time.time()
        acc = eval_dihe(enc_fn, 1024, gallery_eval, queries,
                        batch_size=args.batch_size, k=(1, 5),
                        verbose=False,
                        index_average=(args.gallery_augment
                                       if args.gallery_average else 1))
        report(shift=shift,
               perspective=args.perspective if shift > 0 else 0.0,
               top1=round(float(acc[1]), 4), top5=round(float(acc[5]), 4),
               chance=round(1 / args.products, 4),
               wall=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
    report(name="DONE")
