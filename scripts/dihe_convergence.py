"""DIHE convergence smoke on a synthetic hierarchy (VERDICT r1 #4).

Builds a synthetic product taxonomy (categories sharing a base color;
products within a category differing only in stripe layout — hard for a
random encoder, learnable for a trained one), pretrains the GAN briefly,
runs the real 3-player DIHE loop (train/loops.py:train_dihe), and
measures gallery-kNN top-1 accuracy on domain-shifted query scenes
before vs after training. Reports: baseline accuracy, trained accuracy,
chance level.

Run: python scripts/dihe_convergence.py [--epochs 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZE = 256  # product image side (UNetGenerator default depth is for 256px)


def product_image(cat: int, prod: int, rng: np.random.Generator,
                  jitter: float = 0.0) -> np.ndarray:
    """[0,1] HWC product texture — deliberately FINE-GRAINED: every
    product shares the same grayish base and the same two stripe tones;
    only stripe positions/widths (product id) and a faint category tint
    distinguish them. A random encoder should be near chance; the query
    domain shift (heavy noise + lighting + blur, see `jitter`) is what
    DIHE's generator is for."""
    base = np.full(3, 0.5, np.float32)
    base[cat % 3] += 0.03  # faint category tint
    img = np.tile(base, (SIZE, SIZE, 1))
    prng = np.random.default_rng((cat, prod))  # pattern is product-stable
    n_stripes = 4
    for s in range(n_stripes):
        y = int(prng.uniform(0.05, 0.9) * SIZE)
        hgt = max(2, int(prng.uniform(0.02, 0.1) * SIZE))
        tone = 0.3 if prng.random() < 0.5 else 0.7  # two shared tones
        img[y:y + hgt] = tone
    if jitter > 0:
        img = img * rng.uniform(0.5, 1.5)  # lighting
        img = img + rng.normal(0, jitter, img.shape).astype(np.float32)
        # cheap blur: average with a 1-px roll in both axes
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)) / 3.0
    return np.clip(img, 0.0, 1.0)


class SyntheticGallery:
    """(emb_view, gen_view, hierarchy, annotation) in tanh scale —
    GroceryProductsDataset item semantics."""

    def __init__(self, n_cat, per_cat, views, seed=0):
        self.keys = [(c, p, v) for c in range(n_cat)
                     for p in range(per_cat) for v in range(views)]
        self.seed = seed

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, i):
        c, p, v = self.keys[i]
        rng = np.random.default_rng((self.seed, i))
        emb = product_image(c, p, rng, jitter=0.02 if v else 0.0)
        gen = product_image(c, p, rng, jitter=0.03)
        hier = [f"Cat{c}", f"Prod{c}_{p}"]
        return emb * 2 - 1, gen * 2 - 1, hier, f"Prod{c}_{p}"


class ShelfCrops:
    """[0,1] target-domain crops for the discriminator: products over a
    noisy shelf background (domain-shifted)."""

    def __init__(self, n_cat, per_cat, n, seed=1):
        self.n = n
        self.n_cat, self.per_cat = n_cat, per_cat
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng((self.seed, i))
        c = int(rng.integers(self.n_cat))
        p = int(rng.integers(self.per_cat))
        img = product_image(c, p, rng, jitter=0.12)
        img = 0.8 * img + 0.2 * rng.uniform(0.2, 0.4)  # shelf tint
        return np.clip(img, 0, 1).astype(np.float32)


class QueryScenes:
    """(img, target_anns, boxes) eval items — one domain-shifted product
    per scene (eval_dihe protocol)."""

    def __init__(self, n_cat, per_cat, seed=2):
        self.keys = [(c, p) for c in range(n_cat) for p in range(per_cat)]
        self.seed = seed

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, i):
        c, p = self.keys[i]
        rng = np.random.default_rng((self.seed, i))
        scene = np.full((SIZE * 2, SIZE * 2, 3),
                        rng.uniform(0.2, 0.4), np.float32)
        scene += rng.normal(0, 0.03, scene.shape).astype(np.float32)
        prod = product_image(c, p, rng, jitter=0.15)
        x0, y0 = int(rng.integers(0, SIZE)), int(rng.integers(0, SIZE))
        scene[y0:y0 + SIZE, x0:x0 + SIZE] = prod
        scene = np.clip(scene, 0, 1)
        return scene, [f"Prod{c}_{p}"], np.asarray(
            [[x0, y0, x0 + SIZE, y0 + SIZE]], np.float32)


def triplet_accuracy(enc_fn, n_cat, per_cat, batch_size, n_triplets=96,
                     seed=123):
    """Fraction of (anchor=domain-shifted view of p, pos=gallery p,
    neg=gallery q!=p) triplets with d(a,p) < d(a,q) — the training
    objective's own metric. Chance = 0.5."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    anchors, poss, negs = [], [], []
    for _ in range(n_triplets):
        c, p = int(rng.integers(n_cat)), int(rng.integers(per_cat))
        while True:
            c2, p2 = int(rng.integers(n_cat)), int(rng.integers(per_cat))
            if (c2, p2) != (c, p):
                break
        anchors.append(product_image(c, p, rng, jitter=0.15) * 2 - 1)
        poss.append(product_image(c, p, rng) * 2 - 1)
        negs.append(product_image(c2, p2, rng) * 2 - 1)

    def embed(stack):
        out = []
        arr = np.stack(stack)
        for i in range(0, len(arr), batch_size):
            chunk = arr[i:i + batch_size]
            if len(chunk) < batch_size:
                pad = np.zeros((batch_size - len(chunk), *chunk.shape[1:]),
                               chunk.dtype)
                out.append(np.asarray(enc_fn(jnp.asarray(
                    np.concatenate([chunk, pad]))))[:len(chunk)])
            else:
                out.append(np.asarray(enc_fn(jnp.asarray(chunk))))
        return np.concatenate(out)

    ea, ep, en = embed(anchors), embed(poss), embed(negs)
    d_pos = 1 - (ea * ep).sum(-1)
    d_neg = 1 - (ea * en).sum(-1)
    return float((d_pos < d_neg).mean())


def warm_batch_stats(model_train, params, stats, gallery, batch_size,
                     n_batches=40, seed=7):
    """Settle BN running statistics on clean gallery images before
    eval-mode inference. From-scratch runs start from the (0, 1) init and
    the 3-player step's stats see GAN outputs; with momentum 0.9 a few
    dozen clean forward passes converge them (standard BN warmup —
    the reference avoids the issue only because it fine-tunes ImageNet
    weights whose running stats are already settled)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(stats, batch):
        _, mut = model_train.apply(
            {"params": params, "batch_stats": stats}, batch,
            mutable=["batch_stats"])
        return mut["batch_stats"]

    rng = np.random.default_rng(seed)
    for _ in range(n_batches):
        idx = rng.integers(0, len(gallery), batch_size)
        batch = np.stack([gallery[int(i)][0] for i in idx])
        stats = step(stats, jnp.asarray(batch))
    return stats


def int8_fidelity_report(params, stats_warmed, n_cat, per_cat,
                         batch_size):
    """Compare embed numerics variants ON TRAINED WEIGHTS: triplet
    accuracy, gallery query top-1 accuracy, and top-1 agreement vs the
    f32 reference — the evidence needed before int8 can be a default
    serving path (random-weights fidelity alone doesn't bind)."""
    import jax
    import jax.numpy as jnp

    from cvpce_tpu.models.embedders import MACVGG, calibrate_int8_scales

    base_vars = {"params": params, "batch_stats": stats_warmed}
    rng = np.random.default_rng(11)
    index_imgs, labels, query_imgs, q_labels = [], [], [], []
    for c in range(n_cat):
        for p in range(per_cat):
            index_imgs.append(product_image(c, p, rng) * 2 - 1)
            labels.append((c, p))
            for _ in range(4):
                query_imgs.append(
                    product_image(c, p, rng, jitter=0.15) * 2 - 1)
                q_labels.append((c, p))
    index_arr = np.stack(index_imgs).astype(np.float32)
    query_arr = np.stack(query_imgs).astype(np.float32)

    cal = MACVGG(batch_norm=True, int8_all=True, int8_calibrate=True)
    vars_cal = calibrate_int8_scales(cal, base_vars,
                                     [jnp.asarray(index_arr)])

    variants = {
        "f32": (MACVGG(batch_norm=True), base_vars),
        "bf16": (MACVGG(batch_norm=True, dtype=jnp.bfloat16), base_vars),
        "int8_hybrid_dyn":
            (MACVGG(batch_norm=True, dtype=jnp.bfloat16, int8=True),
             base_vars),
        "int8_all_static":
            (MACVGG(batch_norm=True, dtype=jnp.bfloat16, int8_all=True,
                    int8_static=True), vars_cal),
    }
    results, preds = {}, {}
    for name, (m, v) in variants.items():
        enc = jax.jit(m.apply)

        def enc_fn(imgs, enc=enc, v=v):
            return enc(v, imgs)

        trip = triplet_accuracy(enc_fn, n_cat, per_cat, batch_size)
        ei = np.asarray(enc_fn(jnp.asarray(index_arr)))
        eq = np.asarray(enc_fn(jnp.asarray(query_arr)))
        top1 = np.argmax(eq @ ei.T, axis=1)
        acc = float(np.mean([labels[t] == q_labels[i]
                             for i, t in enumerate(top1)]))
        preds[name] = top1
        results[name] = {"triplet_acc": round(trip, 4),
                         "query_top1_acc": round(acc, 4)}
    for name in variants:
        if name != "f32":
            results[name]["top1_agreement_vs_f32"] = round(
                float((preds[name] == preds["f32"]).mean()), 4)
    print(json.dumps({"int8_fidelity": results}), flush=True)
    return results


def pure_triplet_main(args):
    """Supervised triplet sanity run: anchor = domain-shifted view,
    pos/neg = clean gallery views, hierarchical adaptive margin
    (ops/losses.py:hierarchical_triplet_loss), Adam. No GAN — isolates
    "can the encoder + triplet objective learn this hierarchy at all"."""
    import jax
    import jax.numpy as jnp
    import optax

    from cvpce_tpu.models.embedders import MACVGG
    from cvpce_tpu.ops.losses import hierarchical_triplet_loss
    from cvpce_tpu.train.dihe import hierarchy_similarity

    model_t = MACVGG(batch_norm=True, train=True)
    model_e = MACVGG(batch_norm=True, train=False)
    rng = jax.random.PRNGKey(0)
    variables = model_t.init(rng, jnp.zeros((2, 256, 256, 3)))
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(args.enc_lr)
    opt = tx.init(params)
    encode = jax.jit(model_e.apply)
    gallery = SyntheticGallery(args.n_cat, args.per_cat, args.views)

    def enc_with(params_, stats_):
        warmed = warm_batch_stats(model_t, params_, stats_, gallery,
                                  args.batch_size)

        def f(imgs):
            return encode({"params": params_, "batch_stats": warmed}, imgs)
        return f

    base_trip = triplet_accuracy(enc_with(params, stats), args.n_cat,
                                 args.per_cat, args.batch_size)
    print(json.dumps({"baseline_triplet_acc": round(base_trip, 4)}),
          flush=True)

    b = args.batch_size

    @jax.jit
    def step(params, stats, opt, anchors, pos, neg, sim):
        def loss_fn(p):
            x = jnp.concatenate([anchors, pos, neg])
            emb, mut = model_t.apply(
                {"params": p, "batch_stats": stats}, x,
                mutable=["batch_stats"])
            ea, ep, en = emb[:b], emb[b:2 * b], emb[2 * b:]
            return hierarchical_triplet_loss(ea, ep, en, sim),                 mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_stats, new_opt,             loss

    rng_np = np.random.default_rng(0)
    t0 = time.time()
    for it in range(args.steps):
        anchors, poss, negs, ph, nh = [], [], [], [], []
        for _ in range(b):
            c, pd = int(rng_np.integers(args.n_cat)), int(
                rng_np.integers(args.per_cat))
            while True:
                c2, p2 = int(rng_np.integers(args.n_cat)), int(
                    rng_np.integers(args.per_cat))
                if (c2, p2) != (c, pd):
                    break
            anchors.append(product_image(c, pd, rng_np, jitter=0.15))
            poss.append(product_image(c, pd, rng_np, jitter=0.02))
            negs.append(product_image(c2, p2, rng_np, jitter=0.02))
            ph.append([f"Cat{c}", f"Prod{c}_{pd}"])
            nh.append([f"Cat{c2}", f"Prod{c2}_{p2}"])
        sim = jnp.asarray(hierarchy_similarity(ph, nh))
        params, stats, opt, loss = step(
            params, stats, opt,
            jnp.asarray(np.stack(anchors)) * 2 - 1,
            jnp.asarray(np.stack(poss)) * 2 - 1,
            jnp.asarray(np.stack(negs)) * 2 - 1, sim)
        if it % 50 == 0:
            print(json.dumps({"step": it, "loss": round(float(loss), 4)}),
                  flush=True)

    trained_trip = triplet_accuracy(enc_with(params, stats), args.n_cat,
                                    args.per_cat, args.batch_size)
    if args.int8_check:
        warmed = warm_batch_stats(model_t, params, stats, gallery,
                                  args.batch_size)
        int8_fidelity_report(params, warmed, args.n_cat, args.per_cat,
                             args.batch_size)
    print(json.dumps({
        "mode": "pure_triplet",
        "trained_triplet_acc": round(trained_trip, 4),
        "baseline_triplet_acc": round(base_trip, 4),
        "triplet_above_chance": bool(trained_trip > 0.5),
        "triplet_improved": bool(trained_trip > base_trip),
        "steps": args.steps,
        "wall": round(time.time() - t0, 1),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-cat", type=int, default=4)
    ap.add_argument("--per-cat", type=int, default=6)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--gan-steps", type=int, default=240)
    ap.add_argument("--enc-lr", type=float, default=2e-6)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--out", default="/tmp/dihe_convergence")
    ap.add_argument("--reuse-gan", action="store_true",
                    help="restore gan_checkpoint from --out instead of "
                    "pretraining again")
    ap.add_argument("--pure-triplet", action="store_true",
                    help="sanity mode: supervised hierarchical-triplet "
                    "training with clean anchors (no GAN), Adam — proves "
                    "the triplet machinery + encoder learn the hierarchy")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--int8-check", action="store_true",
                    help="after pure-triplet training, report int8 "
                         "embed fidelity on the trained weights")
    args = ap.parse_args()

    if args.pure_triplet:
        pure_triplet_main(args)
        return

    import jax

    from cvpce_tpu.eval.classification import eval_dihe
    from cvpce_tpu.models.embedders import MACVGG
    from cvpce_tpu.train.dihe import DIHETrainConfig
    from cvpce_tpu.train.loops import pretrain_gan, train_dihe

    n_products = args.n_cat * args.per_cat
    gallery = SyntheticGallery(args.n_cat, args.per_cat, args.views)
    gallery_eval = SyntheticGallery(args.n_cat, args.per_cat, 1, seed=9)
    discset = ShelfCrops(args.n_cat, args.per_cat, 128)
    queries = QueryScenes(args.n_cat, args.per_cat)

    cfg = DIHETrainConfig(enc_lr=args.enc_lr)

    # --- baseline: untrained (random-init) encoder ---
    model = MACVGG(batch_norm=cfg.batchnorm, train=False)
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    variables = model.init(rng, jnp.zeros((1, 256, 256, 3)))
    encode = jax.jit(model.apply)
    model_train = MACVGG(batch_norm=cfg.batchnorm, train=True)
    base_stats = warm_batch_stats(model_train, variables["params"],
                                  variables["batch_stats"], gallery,
                                  args.batch_size)

    def enc_fn(imgs):
        return encode({"params": variables["params"],
                       "batch_stats": base_stats}, imgs)

    base_acc = eval_dihe(enc_fn, 1024, gallery_eval, queries,
                         batch_size=args.batch_size, k=(1,), verbose=False)
    base_trip = triplet_accuracy(enc_fn, args.n_cat, args.per_cat,
                                 args.batch_size)
    print(json.dumps({"baseline_top1": round(base_acc[1], 4),
                      "baseline_triplet_acc": round(base_trip, 4),
                      "chance": round(1.0 / n_products, 4)}), flush=True)

    # --- GAN pretrain (generator learns shelf-domain translation) ---
    t0 = time.time()
    if args.reuse_gan:
        from cvpce_tpu.train.checkpoint import CheckpointManager
        from cvpce_tpu.train.dihe import (GANPretrainConfig,
                                          make_gan_pretrain_step)

        init, _ = make_gan_pretrain_step(GANPretrainConfig())
        template = init(jax.random.PRNGKey(0), gen_channels=3)
        manager = CheckpointManager(args.out, name="gan_checkpoint")
        gan_result = {"state": manager.restore(template)}
        print(json.dumps({"gan_reused": True}), flush=True)
    else:
        gan_epochs = max(1, args.gan_steps
                         // max(1, len(gallery) // args.batch_size))
        gan_result = pretrain_gan(gallery, discset, args.out,
                                  epochs=gan_epochs,
                                  batch_size=args.batch_size)
        print(json.dumps({"gan_pretrain_wall":
                          round(time.time() - t0, 1)}), flush=True)

    gs = gan_result["state"]
    gan_state = {k: gs[k] for k in
                 ("gen_params", "gen_stats", "disc_params", "disc_stats")}

    # --- DIHE 3-player training ---
    t0 = time.time()
    result = train_dihe(gallery, discset, gallery_eval, queries, args.out,
                        gan_state=gan_state, epochs=args.epochs,
                        batch_size=args.batch_size, checkpoint_interval=500,
                        eval_interval=2, train_cfg=cfg, use_mesh=False)
    state = result["state"]
    trained_stats = warm_batch_stats(model_train, state.emb_params,
                                     state.emb_stats, gallery,
                                     args.batch_size)

    def trained_fn(imgs):
        return encode({"params": state.emb_params,
                       "batch_stats": trained_stats}, imgs)

    acc = eval_dihe(trained_fn, 1024, gallery_eval, queries,
                    batch_size=args.batch_size, k=(1,), verbose=False)
    trained_trip = triplet_accuracy(trained_fn, args.n_cat, args.per_cat,
                                    args.batch_size)
    summary = {
        "trained_top1": round(acc[1], 4),
        "baseline_top1": round(base_acc[1], 4),
        "trained_triplet_acc": round(trained_trip, 4),
        "baseline_triplet_acc": round(base_trip, 4),
        "chance_top1": round(1.0 / n_products, 4),
        "top1_improved": bool(acc[1] > base_acc[1]),
        "triplet_above_chance": bool(trained_trip > 0.5),
        "triplet_improved": bool(trained_trip > base_trip),
        "train_wall": round(time.time() - t0, 1),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
