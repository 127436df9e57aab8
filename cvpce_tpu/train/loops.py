"""Host training loops orchestrating the jitted steps.

Parity with the reference's loop semantics (cvpce/proposals_training.py:
123-271, cvpce/classification_training.py:257-541): per-iteration loss
logging every 50 steps, periodic rotating checkpoints, per-epoch stats
dumps with delete-older-than-2, eval every `eval_interval` epochs keeping
the best-metric model, exploded-loss guard (> 5000), resume support.

Multi-device: batches go through the DP mesh wrapper (parallel/mesh.py);
there is no rank logic — single-controller JAX replaces the reference's
per-GPU processes, and "rank 0 only" work is just... work.
"""
from __future__ import annotations

import json
import os
import time
from os import path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import PrefetchLoader
from ..data.sku110k import collate_detection
from ..models.gln import GLNConfig
from ..parallel import (data_parallel_mesh, host_local, host_local_tree,
                        make_dp_train_step, put_replicated)
from . import gln as gln_train
from .checkpoint import BestKeeper, CheckpointManager

EXPLODED_LOSS = 5000.0  # cvpce/proposals_training.py:238


def _resume_position(meta: Dict, steps_per_epoch: int, loader):
    """(start_epoch, skip_batches) for a resumed run.

    Checkpoints record `epoch_step` = the last completed batch index
    within `epoch`. A loader with `iter_from` (GrainLoader: order is a
    pure function of (seed, epoch, shard)) resumes INSIDE the epoch on
    the exact next batch; otherwise — and for pre-`epoch_step`
    checkpoints — fall back to the reference's semantics of restarting
    at the next epoch (cvpce/proposals_training.py:209-220, which can
    skip up to checkpoint_interval-1 trailing batches)."""
    epoch = meta.get("epoch", -1)
    epoch_step = meta.get("epoch_step")
    if epoch_step is None or not hasattr(loader, "iter_from"):
        return epoch + 1, 0
    if epoch_step + 1 >= steps_per_epoch:
        return epoch + 1, 0
    return epoch, epoch_step + 1


def _epoch_iter(loader, epoch: int, start_epoch: int, skip_batches: int,
                steps_per_epoch: Optional[int] = None):
    """Iterate epoch `epoch`, skipping `skip_batches` on the resumed
    first epoch only. `steps_per_epoch` bounds the epoch to a step count
    common to every host — per-host shard sizes can differ by one batch,
    and an uneven step count would deadlock the cross-host collectives."""
    import itertools

    loader.set_epoch(epoch)
    skip = skip_batches if epoch == start_epoch else 0
    it = loader.iter_from(skip) if skip else iter(loader)
    if steps_per_epoch is None:
        return it
    return itertools.islice(it, max(steps_per_epoch - skip, 0))


def _host_sharding(use_mesh: bool, batch_size: int):
    """(shard_index, num_shards, local_batch) for multi-host training:
    each host loads a disjoint dataset shard and contributes
    batch_size/num_hosts rows of the GLOBAL batch
    (parallel/multihost.py replaces DistributedSampler,
    cvpce/proposals_training.py:191-196)."""
    if not use_mesh:
        return 0, 1, batch_size
    from ..parallel.multihost import host_shard_info

    shard_index, num_shards = host_shard_info()
    if num_shards == 1:
        return 0, 1, batch_size
    assert batch_size % num_shards == 0, (
        f"global batch {batch_size} must divide over {num_shards} hosts")
    return shard_index, num_shards, batch_size // num_shards


def train_proposal_generator(
    dataset, evalset, output_path: str,
    model_cfg: GLNConfig = GLNConfig(),
    train_cfg: Optional[gln_train.GLNTrainConfig] = None,
    batch_size: int = 1, epochs: int = 1,
    checkpoint_interval: int = 1000, eval_interval: int = 3,
    eval_threshold: float = 0.75,
    resume: bool = False, use_mesh: bool = True,
    load_torch: Optional[str] = None,
    load_orbax: Optional[str] = None,
    hyperopt_report=None, seed: int = 0,
    steps_per_call: int = 1,
    loader_cls: type = PrefetchLoader,
) -> Dict:
    """GLN training loop (cvpce/proposals_training.py:123-271).

    `load_torch`: import a reference torch checkpoint as the starting
    point (the reference's --load path, proposals_training.py:180-189;
    optimizer state starts fresh — torch SGD momentum doesn't map).

    `steps_per_call`: scan this many optimizer steps inside one compiled
    call (train/gln.py:make_multi_step) — the state stays in HBM between
    steps and only the per-step loss scalars come back to the host.
    Logging/explode-guard stay per-step; rotating checkpoints land at
    call boundaries (at most steps_per_call-1 iterations late).

    `loader_cls`: PrefetchLoader (threads) or
    data/grain_loader.py:GrainLoader (deterministic multi-host order +
    mid-epoch resumable iterator); both share the constructor surface.
    With GrainLoader, `resume=True` continues INSIDE a partially-trained
    epoch on the exact next batch (checkpoints record `epoch_step`);
    with PrefetchLoader it keeps the reference's restart-at-next-epoch
    semantics.
    """
    from ..eval.proposals import evaluate_gln

    os.makedirs(output_path, exist_ok=True)
    shard_index, num_shards, local_bs = _host_sharding(use_mesh, batch_size)
    loader = loader_cls(dataset, local_bs, collate_detection,
                        shuffle=True, seed=seed,
                        shard_index=shard_index, num_shards=num_shards)
    steps_per_epoch = max(len(loader), 1)
    if num_shards > 1:
        # common per-host step count (shard sizes can differ by one)
        steps_per_epoch = max((len(dataset) // num_shards) // local_bs, 1)
    cfg = train_cfg or gln_train.GLNTrainConfig()
    cfg = gln_train.GLNTrainConfig(**{
        **cfg.__dict__, "steps_per_epoch": steps_per_epoch})

    variables = None
    if load_torch is not None:
        from ..cli.common import load_gln_variables

        variables = load_gln_variables(load_torch, model_cfg)
    elif load_orbax is not None:
        # warm-start from a serving export or training-run dir (params/
        # frozen/batch_stats; optimizer state starts fresh, like the
        # reference's --load, proposals_training.py:180-189) — the
        # fine-tune path: e.g. shift-augmented adaptation of an
        # already-converged detector at a fraction of from-scratch cost
        from ..pipeline.serving import load_gln_variables as _load_serving

        variables = dict(_load_serving(load_orbax))

    anchors, _ = model_cfg.anchors()
    state, optimizer = gln_train.init_train_state(
        model_cfg, cfg, jax.random.PRNGKey(seed), variables=variables)
    step_fn = gln_train.make_train_step(model_cfg, cfg, anchors, optimizer)
    if steps_per_call > 1:
        step_fn = gln_train.make_multi_step(step_fn)
    if use_mesh and len(jax.devices()) > 1:
        mesh = data_parallel_mesh()
        step_fn = make_dp_train_step(
            step_fn, mesh, donate_state=True,
            batch_axis=1 if steps_per_call > 1 else 0)
        state = put_replicated(state, mesh)
    else:
        # donation is a no-op (with a warning) on CPU; only ask on TPU/GPU
        donate = (0,) if jax.default_backend() != "cpu" else ()
        step_fn = jax.jit(step_fn, donate_argnums=donate)

    manager = CheckpointManager(output_path)
    keeper = BestKeeper(manager, "ap")
    start_epoch = 0
    iteration = 0
    skip_batches = 0  # mid-epoch resume offset into start_epoch
    if resume:
        meta = manager.load_meta()
        if meta:
            state = manager.restore(state)
            iteration = meta.get("iteration", -1) + 1
            keeper.best = meta.get("best", keeper.best)
            start_epoch, skip_batches = _resume_position(
                meta, steps_per_epoch, loader)

    # checkpoint-time sample render (proposals_training.py:91-101);
    # the inference fn takes variables as an argument so one compilation
    # serves every checkpoint and epoch eval of this run
    sample = dataset[0] if len(dataset) else None
    infer_fn = None

    def get_infer_fn():
        nonlocal infer_fn
        if infer_fn is None:
            from ..eval.proposals import make_variables_inference_fn

            infer_fn = make_variables_inference_fn(model_cfg)
        return infer_fn

    def save_sample_pictures(tag: str) -> None:
        if sample is None:
            return
        try:
            from ..utils.viz import save_boxes, save_heatmap

            # host-local copies: inference jits run per-host
            variables = host_local_tree(
                {"params": state.params, "frozen": state.frozen,
                 "batch_stats": state.batch_stats})
            res = get_infer_fn()(
                variables,
                jnp.asarray(sample["image"][None]),
                jnp.asarray(sample["image_size"][None], jnp.float32))
            keep = np.asarray(res["valid"][0]) \
                & (np.asarray(res["scores"][0]) > 0.5)
            save_boxes(sample["image"],
                       np.asarray(res["boxes"][0])[keep],
                       path.join(output_path, f"{tag}_gt_05.png"))
            save_heatmap(np.asarray(res["gaussians"][0]),
                         path.join(output_path, f"{tag}_gaussians.png"))
        except Exception as e:  # noqa: BLE001 — viz must not kill training
            print(f"sample render failed: {e}")

    losses_log = {"class_loss": [], "reg_loss": [], "gauss_loss": [],
                  "batch_times": []}
    end_epoch = start_epoch + epochs

    epoch_step = -1  # last completed batch index within the epoch

    def run_chunk(chunk, epoch):
        """Execute len(chunk) optimizer steps (one compiled call when
        steps_per_call > 1) and apply the per-step loop semantics."""
        nonlocal state, iteration, epoch_step
        t0 = time.time()
        if steps_per_call > 1:
            stacked = [np.stack([b[key] for b in chunk]) for key in
                       ("images", "boxes", "box_valid", "image_sizes")]
            state, metrics = step_fn(state, *stacked)
            per_step = {k: host_local(v) for k, v in metrics.items()}
        else:
            batch = chunk[0]
            state, metrics = step_fn(
                state, batch["images"], batch["boxes"],
                batch["box_valid"], batch["image_sizes"])
            per_step = {k: host_local(v)[None] for k, v in metrics.items()}
        elapsed = (time.time() - t0) / len(chunk)
        pending_save = False
        for s in range(len(chunk)):
            total = float(per_step["total"][s])
            if total > EXPLODED_LOSS:
                msg = (f"!!! Exploded loss at iteration {iteration}: "
                       f"{ {k: float(v[s]) for k, v in per_step.items()} }")
                if hyperopt_report is not None:
                    raise RuntimeError(msg)
                print(msg)
            losses_log["class_loss"].append(
                float(per_step["classification"][s]))
            losses_log["reg_loss"].append(
                float(per_step["bbox_regression"][s]))
            losses_log["gauss_loss"].append(float(per_step["gaussian"][s]))
            losses_log["batch_times"].append(elapsed)
            if iteration % 50 == 0:
                print(f"batch:{iteration:05d}\t{elapsed:.4f}s"
                      f"\tclass:{losses_log['class_loss'][-1]:.4f}"
                      f"\treg:{losses_log['reg_loss'][-1]:.4f}"
                      f"\tgauss:{losses_log['gauss_loss'][-1]:.4f}")
            if iteration % checkpoint_interval == 0:
                pending_save = True
            iteration += 1
            epoch_step += 1
        if pending_save:
            save_sample_pictures(f"{iteration - 1:05d}")
            manager.save_rotating(state, {
                "epoch": epoch, "iteration": iteration - 1,
                "epoch_step": epoch_step, "best": keeper.best})

    for e in range(start_epoch, end_epoch):
        epoch_step = skip_batches - 1 if e == start_epoch else -1
        chunk = []
        for batch in _epoch_iter(loader, e, start_epoch, skip_batches,
                                 steps_per_epoch):
            chunk.append(batch)
            if len(chunk) == steps_per_call:
                run_chunk(chunk, e)
                chunk = []
        if chunk:
            run_chunk(chunk, e)

        # per-epoch stats dump with delete-older-than-2
        # (proposals_training.py:141-154)
        old = path.join(output_path, f"stats_{e - 2}.json")
        if path.exists(old):
            os.remove(old)
        with open(path.join(output_path, f"stats_{e}.json"), "w") as f:
            json.dump(losses_log, f)

        # end-of-epoch rotating save so resume=True continues from the
        # true epoch boundary (interval saves alone can strand up to
        # checkpoint_interval-1 trailing steps — hyperopt's per-epoch
        # re-invocation depends on this)
        manager.save_rotating(state, {
            "epoch": e, "iteration": iteration - 1,
            "epoch_step": epoch_step, "best": keeper.best})

        final = e == end_epoch - 1
        if e % eval_interval == 0 or final:
            print("Evaluating...")
            variables = host_local_tree(
                {"params": state.params, "frozen": state.frozen,
                 "batch_stats": state.batch_stats})
            res = evaluate_gln(variables, evalset, model_cfg,
                               thresholds=(eval_threshold,),
                               infer_fn=get_infer_fn())
            stats = res[eval_threshold]
            print(f"epoch {e}: AP {stats['ap']:.4f} AR300 "
                  f"{stats['ar_300']:.4f} F1 {stats['f']:.4f}")
            keeper.update(state, e, stats["ap"], final=final)
            if hyperopt_report is not None:
                hyperopt_report(average_precision=stats["ap"], **{
                    k: v for k, v in stats.items() if k != "raw"})
    return {"state": state, "best": keeper.best}


def pretrain_gan(dataset, discriminatorset, output_path: str,
                 epochs: int = 1, batch_size: int = 4,
                 checkpoint_interval: int = 200, masks: bool = False,
                 seed: int = 0, resume: bool = False, train_cfg=None,
                 loader_cls: type = PrefetchLoader) -> Dict:
    """GAN pretraining loop (cvpce/classification_training.py:257-332).

    `resume`: continue from the rotating gan_checkpoint (generator +
    discriminator params/opt states and the epoch/iteration counters),
    matching the reference's three-model checkpoint dance
    (classification_training.py:227-248). Discriminator samples derive
    from (seed, epoch, step), so a resumed run draws the same stream an
    uninterrupted one would."""
    from ..data.transforms import scale_to_tanh
    from .dihe import GANPretrainConfig, make_gan_pretrain_step

    os.makedirs(output_path, exist_ok=True)
    cfg = train_cfg or GANPretrainConfig(masks=masks)
    init, step = make_gan_pretrain_step(cfg)
    state = init(jax.random.PRNGKey(seed),
                 gen_channels=4 if masks else 3)
    step = jax.jit(step)
    manager = CheckpointManager(output_path, name="gan_checkpoint")

    def collate(items):
        return (np.stack([it[1] for it in items]),)

    loader = loader_cls(dataset, batch_size, collate, shuffle=True,
                        seed=seed)
    steps_per_epoch = max(len(loader), 1)

    def save_gan_sample(tag: str, gen_batch) -> None:
        """Source / generated / target triple at checkpoints
        (classification_training.py:204-210)."""
        try:
            from ..models.gan import UNetGenerator
            from ..utils.viz import save_multiple

            gen = UNetGenerator(train=False, num_downs=cfg.gen_downs)
            fake = gen.apply(
                {"params": state["gen_params"],
                 "batch_stats": state["gen_stats"]}, gen_batch[:1])
            src = (gen_batch[0, ..., :3] + 1) / 2
            save_multiple([src, (np.asarray(fake[0]) + 1) / 2],
                          path.join(output_path, f"{tag}.png"))
        except Exception as e:  # noqa: BLE001
            print(f"gan sample render failed: {e}")

    start_epoch = 0
    iteration = 0
    skip_batches = 0
    if resume:
        meta = manager.load_meta()
        if meta:
            state = manager.restore(state)
            iteration = meta.get("iteration", -1) + 1
            start_epoch, skip_batches = _resume_position(
                meta, steps_per_epoch, loader)

    end_epoch = start_epoch + epochs
    for e in range(start_epoch, end_epoch):
        epoch_step = skip_batches - 1 if e == start_epoch else -1
        for (gen_batch,) in _epoch_iter(loader, e, start_epoch,
                                        skip_batches, steps_per_epoch):
            bstep = epoch_step + 1
            # per-step derived stream -> identical draws across resume
            step_rng = np.random.default_rng((seed, 17, e, bstep))
            disc_idx = step_rng.integers(0, len(discriminatorset),
                                         len(gen_batch))
            disc_batch = scale_to_tanh(np.stack(
                [discriminatorset[int(j)] for j in disc_idx]))
            state, metrics = step(state, gen_batch, disc_batch)
            if iteration % 50 == 0:
                print(f"batch:{iteration}\t" + "\t".join(
                    f"{k}:{float(v):.4f}" for k, v in metrics.items()))
            if iteration % checkpoint_interval == 0:
                save_gan_sample(f"{iteration:05d}", gen_batch)
                manager.save_rotating(state, {"epoch": e,
                                              "iteration": iteration,
                                              "epoch_step": bstep})
            iteration += 1
            epoch_step = bstep
        manager.save_rotating(state, {"epoch": e,
                                      "iteration": iteration - 1,
                                      "epoch_step": epoch_step})
    return {"state": state}


def train_dihe(dataset, discriminatorset, evaldata, evalset,
               output_path: str, gan_state: Optional[Dict] = None,
               epochs: int = 1, batch_size: int = 4,
               checkpoint_interval: int = 200, eval_interval: int = 1,
               train_cfg=None, seed: int = 0, use_mesh: bool = True,
               hyperopt_report=None, resume: bool = False,
               init_embedder: Optional[Dict] = None,
               loader_cls: type = PrefetchLoader) -> Dict:
    """DIHE training loop (cvpce/classification_training.py:334-541).

    `resume`: continue from the rotating embedder_checkpoint (all three
    players' params/opt states), mirroring the GLN loop's resume —
    including exact mid-epoch resume with GrainLoader. Discriminator
    samples derive from (seed, epoch, step), so resumed and
    uninterrupted runs draw identical streams."""
    from ..data.transforms import scale_to_tanh
    from ..eval.classification import eval_dihe
    from ..models.embedders import MACVGG
    from .dihe import (DIHETrainConfig, hierarchy_similarity,
                       init_dihe_state, make_dihe_train_step)

    os.makedirs(output_path, exist_ok=True)

    def collate(items):
        # loader yields 2 x batch_size: first half positives, second
        # negatives (classification_training.py:474-477)
        embs = np.stack([it[0] for it in items])
        gens = np.stack([it[1] for it in items])
        hiers = [it[2] for it in items]
        return embs, gens, hiers

    shard_index, num_shards, local_bs = _host_sharding(use_mesh, batch_size)
    loader = loader_cls(dataset, local_bs * 2, collate, shuffle=True,
                        seed=seed,
                        shard_index=shard_index, num_shards=num_shards)
    steps_per_epoch = max(len(loader), 1)
    if num_shards > 1:
        steps_per_epoch = max(
            (len(dataset) // num_shards) // (local_bs * 2), 1)
    cfg = train_cfg or DIHETrainConfig()
    cfg = DIHETrainConfig(**{**cfg.__dict__,
                             "steps_per_epoch": steps_per_epoch})

    state, opts = init_dihe_state(
        cfg, jax.random.PRNGKey(seed),
        gen_channels=4 if cfg.masks else 3)
    if init_embedder is not None:
        # pretrained starting point (the reference never trains DIHE
        # from scratch: macvgg_embedder(pretrained=...) pulls ImageNet
        # weights, cvpce/models/classification.py:97-109). Partial
        # overlay: imported conv/bn leaves replace their random-init
        # counterparts; the fresh Adam state (zeros) stays valid.
        def overlay(base, update):
            out = dict(base)
            for k, v in update.items():
                if isinstance(v, dict) and isinstance(out.get(k), dict):
                    out[k] = overlay(out[k], v)
                else:
                    assert k in out and np.shape(out[k]) == np.shape(v), (
                        f"init_embedder leaf {k}: shape "
                        f"{np.shape(v)} vs {np.shape(out.get(k))}")
                    out[k] = jnp.asarray(v)
            return out

        state = state.replace(
            emb_params=overlay(state.emb_params,
                               init_embedder.get("params", {})),
            emb_stats=overlay(state.emb_stats,
                              init_embedder.get("batch_stats", {})))
    if gan_state is not None:  # pretrained GAN required for real runs
        state = state.replace(
            gen_params=gan_state["gen_params"],
            gen_stats=gan_state["gen_stats"],
            disc_params=gan_state["disc_params"],
            disc_stats=gan_state["disc_stats"],
        )
    step = make_dihe_train_step(cfg, opts)
    if use_mesh and len(jax.devices()) > 1 and batch_size >= len(
            jax.devices()):
        # DP over the mesh replaces the reference's three DDP wrappers
        # (classification_training.py:420-427)
        mesh = data_parallel_mesh()
        step = make_dp_train_step(step, mesh, donate_state=True)
        state = put_replicated(state, mesh)
    else:
        step = jax.jit(step)

    manager = CheckpointManager(output_path, name="embedder_checkpoint")
    keeper = BestKeeper(manager, "accuracy")

    # variables enter as traced args so one compilation serves every
    # epoch eval (a closure over `state` would retrace per snapshot)
    _enc_model = MACVGG(batch_norm=cfg.batchnorm, train=False)
    _encode = jax.jit(_enc_model.apply)

    def encoder_fn_factory():
        def encode(imgs):
            return _encode(host_local_tree(
                {"params": state.emb_params,
                 "batch_stats": state.emb_stats}), imgs)
        return encode

    start_epoch = 0
    iteration = 0
    skip_batches = 0
    if resume:
        meta = manager.load_meta()
        if meta:
            state = manager.restore(state)
            iteration = meta.get("iteration", -1) + 1
            keeper.best = meta.get("best", keeper.best)
            start_epoch, skip_batches = _resume_position(
                meta, steps_per_epoch, loader)

    end_epoch = start_epoch + epochs
    for e in range(start_epoch, end_epoch):
        epoch_step = skip_batches - 1 if e == start_epoch else -1
        for embs, gens, hiers in _epoch_iter(loader, e, start_epoch,
                                             skip_batches,
                                             steps_per_epoch):
            block = len(embs) // 2
            if block == 0:
                continue
            positives = embs[:block]
            negatives = embs[block:2 * block]
            gen_batch = gens[:block]
            sim = hierarchy_similarity(hiers[:block], hiers[block:2 * block])
            # per-step derived stream: a resumed run draws the same
            # discriminator samples an uninterrupted one would
            step_rng = np.random.default_rng((seed, 29, e, epoch_step + 1))
            disc_idx = step_rng.integers(0, len(discriminatorset), block)
            disc_batch = scale_to_tanh(np.stack(
                [discriminatorset[int(j)] for j in disc_idx]))
            state, metrics = step(state, positives, negatives, gen_batch,
                                  disc_batch, sim)
            if iteration % 50 == 0:
                print(f"batch:{iteration}\t" + "\t".join(
                    f"{k}:{float(host_local(v)):.4f}"
                    for k, v in metrics.items()))
            iteration += 1
            epoch_step += 1
            if (iteration - 1) % checkpoint_interval == 0:
                manager.save_rotating(state, {"epoch": e,
                                              "iteration": iteration - 1,
                                              "epoch_step": epoch_step,
                                              "best": keeper.best})

        # end-of-epoch rotating save (resume continuity — see the GLN
        # loop's equivalent)
        manager.save_rotating(state, {"epoch": e,
                                      "iteration": iteration - 1,
                                      "epoch_step": epoch_step,
                                      "best": keeper.best})

        final = e == end_epoch - 1
        if e % eval_interval == 0 or final:
            acc = eval_dihe(encoder_fn_factory(), 1024, evaldata, evalset,
                            batch_size=batch_size, k=(1,), verbose=False)
            accuracy = acc.get(1, 0.0)
            print(f"epoch {e}: top-1 accuracy {accuracy:.4f}")
            keeper.update(state, e, accuracy, final=final)
            if hyperopt_report is not None:
                hyperopt_report(accuracy=accuracy)
    return {"state": state, "best": keeper.best}
