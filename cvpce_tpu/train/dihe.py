"""DIHE training: the three-player (embedder / discriminator / generator)
loop as one jitted step.

Re-design of cvpce/classification_training.py:334-541:
- per batch, three sequential updates (encoder on the hierarchical triplet
  loss with a GAN-generated anchor; discriminator on real/fake BCE;
  generator on adversarial + negative-ZNCC + 0.1 * (-embedding distance
  fake<->positive), classification_training.py:479-517),
- the loader yields 2 x batch_size items, first half positives / second
  half negatives (classification_training.py:474-477),
- hierarchy similarity is computed host-side on category paths
  (classification_training.py:181-194) and enters the step as a (B,)
  array,
- like the reference, the generator runs fresh in every sub-step (the
  reference re-runs generator(gen_batch) three times per iteration —
  SURVEY.md §3.2 notes this as a parity quirk).

DP over a mesh replaces the reference's three DDP wrappers with
broadcast_buffers=False (classification_training.py:420-427): batch arrays
shard on 'data', params replicate, XLA inserts the grad all-reduces.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.embedders import MACVGG
from ..models.gan import AveragingPatchGAN, UNetGenerator
from ..ops.knn import cosine_distance
from ..ops.losses import hierarchical_triplet_loss, masked_zncc, zncc

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class DIHETrainConfig:
    # cvpce/classification_training.py:38-47 defaults
    min_margin: float = 0.05
    max_margin: float = 0.5
    enc_lr: float = 1e-6
    enc_multiplier: float = 1.0
    gan_lr: float = 1e-5  # "learning rates from the DIHE paper"
    batchnorm: bool = True
    masks: bool = False
    steps_per_epoch: int = 1000
    emb_weight: float = 0.1  # Tonioni weighting, line 513
    gen_downs: int = 8  # U-Net depth; 8 for 256px (tests shrink it)


class DIHETrainState(struct.PyTreeNode):
    step: Array
    emb_params: Any
    emb_stats: Any
    gen_params: Any
    gen_stats: Any
    disc_params: Any
    disc_stats: Any
    emb_opt: Any
    gen_opt: Any
    disc_opt: Any


def hierarchy_similarity(positives: Sequence[Sequence[str]],
                         negatives: Sequence[Sequence[str]]) -> np.ndarray:
    """Fraction of the shared category-path prefix; 1.0 if the negative
    path is a prefix of the positive ("Tonioni Eq 2",
    classification_training.py:181-194). Host-side on string paths."""
    assert len(positives) == len(negatives)
    sim = np.empty(len(positives), np.float32)
    for i, (pos, neg) in enumerate(zip(positives, negatives)):
        for j, p in enumerate(pos):
            if j >= len(neg) or p != neg[j]:
                sim[i] = j / len(pos)
                break
        else:
            sim[i] = 1.0
    return sim


def _bce(pred: Array, target: float, eps: float = 1e-7) -> Array:
    """binary_cross_entropy on probabilities (the discriminator outputs a
    sigmoid-averaged scalar, cvpce/models/classification.py:10-18)."""
    p = jnp.clip(pred, eps, 1 - eps)
    if target == 1.0:
        return -jnp.log(p).mean()
    return -jnp.log(1 - p).mean()


def build_models(cfg: DIHETrainConfig):
    embedder = MACVGG(batch_norm=cfg.batchnorm, train=True)
    generator = UNetGenerator(train=True, num_downs=cfg.gen_downs)
    discriminator = AveragingPatchGAN(train=True)
    return embedder, generator, discriminator


def build_optimizers(cfg: DIHETrainConfig):
    def enc_schedule(step):
        return cfg.enc_lr * cfg.enc_multiplier ** (step // cfg.steps_per_epoch)

    return (optax.adam(enc_schedule), optax.adam(cfg.gan_lr),
            optax.adam(cfg.gan_lr))


def init_dihe_state(cfg: DIHETrainConfig, rng: jax.Array,
                    image_size: int = 256,
                    gen_channels: int = 3,
                    variables: Dict | None = None) -> Tuple[DIHETrainState, Tuple]:
    embedder, generator, discriminator = build_models(cfg)
    opts = build_optimizers(cfg)
    r1, r2, r3 = jax.random.split(rng, 3)
    img = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    gen_img = jnp.zeros((1, image_size, image_size, gen_channels),
                        jnp.float32)
    if variables is None:
        ev = embedder.init(r1, img)
        gv = generator.init(r2, gen_img)
        dv = discriminator.init(r3, img)
        variables = {"embedder": ev, "generator": gv, "discriminator": dv}
    ev, gv, dv = (variables["embedder"], variables["generator"],
                  variables["discriminator"])
    state = DIHETrainState(
        step=jnp.zeros((), jnp.int32),
        emb_params=ev["params"], emb_stats=ev.get("batch_stats", {}),
        gen_params=gv["params"], gen_stats=gv.get("batch_stats", {}),
        disc_params=dv["params"], disc_stats=dv.get("batch_stats", {}),
        emb_opt=opts[0].init(ev["params"]),
        gen_opt=opts[1].init(gv["params"]),
        disc_opt=opts[2].init(dv["params"]),
    )
    return state, opts


def make_dihe_train_step(cfg: DIHETrainConfig, optimizers: Tuple):
    embedder, generator, discriminator = build_models(cfg)
    emb_tx, gen_tx, disc_tx = optimizers

    def gen_fwd(params, stats, gen_batch):
        out, mut = generator.apply(
            {"params": params, "batch_stats": stats}, gen_batch,
            mutable=["batch_stats"])
        return out, mut["batch_stats"]

    def emb_fwd(params, stats, imgs):
        out, mut = embedder.apply(
            {"params": params, "batch_stats": stats}, imgs,
            mutable=["batch_stats"])
        return out, mut["batch_stats"]

    def disc_fwd(params, stats, imgs):
        out, mut = discriminator.apply(
            {"params": params, "batch_stats": stats}, imgs,
            mutable=["batch_stats"])
        return out, mut["batch_stats"]

    def train_step(state: DIHETrainState, positives, negatives, gen_batch,
                   disc_batch, similarity):
        """positives/negatives: (B, 256, 256, 3) tanh-scale; gen_batch
        (B, 256, 256, 3 or 4); disc_batch (B, 256, 256, 3) tanh-scale;
        similarity (B,)."""
        metrics = {}

        # ---- encoder step (classification_training.py:479-489)
        def enc_loss_fn(emb_params):
            fake, gen_stats = gen_fwd(state.gen_params, state.gen_stats,
                                      gen_batch)
            anchor, s1 = emb_fwd(emb_params, state.emb_stats, fake)
            pos, s2 = emb_fwd(emb_params, s1, positives)
            neg, s3 = emb_fwd(emb_params, s2, negatives)
            loss = hierarchical_triplet_loss(
                anchor, pos, neg, similarity, cfg.min_margin, cfg.max_margin)
            return loss, (s3, gen_stats)

        (enc_loss, (emb_stats, gen_stats)), enc_grads = jax.value_and_grad(
            enc_loss_fn, has_aux=True)(state.emb_params)
        upd, emb_opt = emb_tx.update(enc_grads, state.emb_opt,
                                     state.emb_params)
        emb_params = optax.apply_updates(state.emb_params, upd)
        metrics["dihe"] = enc_loss

        # ---- discriminator step (classification_training.py:491-502)
        fake, gen_stats = gen_fwd(state.gen_params, gen_stats, gen_batch)
        fake = jax.lax.stop_gradient(fake)

        def disc_loss_fn(disc_params):
            pred_fake, s1 = disc_fwd(disc_params, state.disc_stats, fake)
            pred_real, s2 = disc_fwd(disc_params, s1, disc_batch)
            loss_fake = _bce(pred_fake, 0.0)
            loss_real = _bce(pred_real, 1.0)
            return loss_fake + loss_real, (loss_fake, loss_real, s2)

        (_, (loss_fake, loss_real, disc_stats)), disc_grads = \
            jax.value_and_grad(disc_loss_fn, has_aux=True)(state.disc_params)
        upd, disc_opt = disc_tx.update(disc_grads, state.disc_opt,
                                       state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, upd)
        metrics["disc_fake"] = loss_fake
        metrics["disc_real"] = loss_real

        # ---- generator step (classification_training.py:504-517)
        gen_rgb = gen_batch[..., :3]
        mask = (gen_batch[..., 3] == 0) if cfg.masks else None

        def gen_loss_fn(gen_params):
            fake_g, g_stats = gen_fwd(gen_params, gen_stats, gen_batch)
            pred_fake, _ = disc_fwd(disc_params, disc_stats, fake_g)
            pos_emb, s1 = emb_fwd(emb_params, emb_stats, positives)
            fake_emb, _ = emb_fwd(emb_params, s1, fake_g)
            loss_adv = _bce(pred_fake, 1.0)
            if cfg.masks:
                loss_reg = -masked_zncc(fake_g, gen_rgb, mask)
            else:
                loss_reg = -zncc(fake_g, gen_rgb)
            loss_emb = -cosine_distance(fake_emb, pos_emb, axis=1).mean()
            total = loss_adv + loss_reg + cfg.emb_weight * loss_emb
            return total, (loss_adv, loss_reg, loss_emb, g_stats)

        (_, (loss_adv, loss_reg, loss_emb, gen_stats)), gen_grads = \
            jax.value_and_grad(gen_loss_fn, has_aux=True)(state.gen_params)
        upd, gen_opt = gen_tx.update(gen_grads, state.gen_opt,
                                     state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, upd)
        metrics.update(gen_adv=loss_adv, gen_reg=loss_reg, gen_emb=loss_emb)

        new_state = state.replace(
            step=state.step + 1,
            emb_params=emb_params, emb_stats=emb_stats, emb_opt=emb_opt,
            gen_params=gen_params, gen_stats=gen_stats, gen_opt=gen_opt,
            disc_params=disc_params, disc_stats=disc_stats,
            disc_opt=disc_opt,
        )
        return new_state, metrics

    return train_step


@dataclasses.dataclass(frozen=True)
class GANPretrainConfig:
    lr: float = 1e-5  # Adam, both nets (classification_training.py:280-281)
    masks: bool = False
    gen_downs: int = 8  # U-Net depth; 8 for 256px (tests shrink it)


def make_gan_pretrain_step(cfg: GANPretrainConfig):
    """GAN pretraining step (cvpce/classification_training.py:257-332):
    D on BCE real/fake, G on BCE-adversarial + negative-ZNCC."""
    generator = UNetGenerator(train=True, num_downs=cfg.gen_downs)
    discriminator = AveragingPatchGAN(train=True)
    tx = optax.adam(cfg.lr)

    def init(rng, image_size=256, gen_channels=3):
        r1, r2 = jax.random.split(rng)
        gv = generator.init(
            r1, jnp.zeros((1, image_size, image_size, gen_channels)))
        dv = discriminator.init(
            r2, jnp.zeros((1, image_size, image_size, 3)))
        return {
            "gen_params": gv["params"],
            "gen_stats": gv.get("batch_stats", {}),
            "disc_params": dv["params"],
            "disc_stats": dv.get("batch_stats", {}),
            "gen_opt": tx.init(gv["params"]),
            "disc_opt": tx.init(dv["params"]),
        }

    def step(state: Dict, gen_batch, disc_batch):
        gen_rgb = gen_batch[..., :3]
        mask = (gen_batch[..., 3] == 0) if cfg.masks else None

        fake, gen_stats = generator.apply(
            {"params": state["gen_params"],
             "batch_stats": state["gen_stats"]},
            gen_batch, mutable=["batch_stats"])
        fake = fake if isinstance(fake, jnp.ndarray) else fake
        gen_stats = gen_stats["batch_stats"]
        fake_sg = jax.lax.stop_gradient(fake)

        def disc_loss_fn(params):
            pf, m1 = discriminator.apply(
                {"params": params, "batch_stats": state["disc_stats"]},
                fake_sg, mutable=["batch_stats"])
            pr, m2 = discriminator.apply(
                {"params": params, "batch_stats": m1["batch_stats"]},
                disc_batch, mutable=["batch_stats"])
            lf = _bce(pf, 0.0)
            lr_ = _bce(pr, 1.0)
            return lf + lr_, (lf, lr_, m2["batch_stats"])

        (_, (loss_fake, loss_real, disc_stats)), dg = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state["disc_params"])
        upd, disc_opt = tx.update(dg, state["disc_opt"],
                                  state["disc_params"])
        disc_params = optax.apply_updates(state["disc_params"], upd)

        def gen_loss_fn(params):
            fk, mg = generator.apply(
                {"params": params, "batch_stats": gen_stats},
                gen_batch, mutable=["batch_stats"])
            pf, _ = discriminator.apply(
                {"params": disc_params, "batch_stats": disc_stats},
                fk, mutable=["batch_stats"])
            adv = _bce(pf, 1.0)
            if cfg.masks:
                reg = -masked_zncc(fk, gen_rgb, mask)
            else:
                reg = -zncc(fk, gen_rgb)
            return adv + reg, (adv, reg, mg["batch_stats"])

        (_, (loss_adv, loss_reg, gen_stats)), gg = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state["gen_params"])
        upd, gen_opt = tx.update(gg, state["gen_opt"], state["gen_params"])
        gen_params = optax.apply_updates(state["gen_params"], upd)

        new_state = {
            "gen_params": gen_params, "gen_stats": gen_stats,
            "disc_params": disc_params, "disc_stats": disc_stats,
            "gen_opt": gen_opt, "disc_opt": disc_opt,
        }
        metrics = {"disc_real": loss_real, "disc_fake": loss_fake,
                   "gen_adv": loss_adv, "gen_reg": loss_reg}
        return new_state, metrics

    return init, step
