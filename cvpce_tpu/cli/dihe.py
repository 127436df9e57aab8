"""`dihe` command group (reference: cvpce/cli/dihe.py)."""
from __future__ import annotations

import json

import click
import numpy as np

from ..data import defaults
from .common import load_embedder

# hyperopt'd preset (cvpce/cli/dihe.py:159-162)
HYPEROPT_ENC_LR = 8e-7
HYPEROPT_ENC_MULTIPLIER = 0.9


@click.group()
def dihe():
    """Domain-Invariant Hierarchical Embedding: product classification."""


def _gp_options(f):
    f = click.option("--source", multiple=True,
                     default=defaults.GP_TRAIN_FOLDERS, show_default=True)(f)
    f = click.option("--imgs", default=defaults.SKU110K_IMG_DIR,
                     show_default=True)(f)
    f = click.option("--annotations",
                     default=defaults.SKU110K_ANNOTATION_FILE,
                     show_default=True)(f)
    return f


@dihe.command("pretrain-gan")
@_gp_options
@click.option("--out", required=True, type=click.Path())
@click.option("--epochs", default=1, show_default=True)
@click.option("--batch-size", default=4, show_default=True)
@click.option("--masks", is_flag=True)
@click.option("--resume", is_flag=True,
              help="continue from --out's rotating gan_checkpoint")
def pretrain_gan_cmd(source, imgs, annotations, out, epochs, batch_size,
                     masks, resume):
    """Pretrain the U-Net/PatchGAN domain adapter
    (cvpce/cli/dihe.py:31-75)."""
    from ..data.grocery import GroceryProductsDataset
    from ..data.sku110k import TargetDomainDataset
    from ..train.loops import pretrain_gan

    dataset = GroceryProductsDataset(list(source), include_masks=masks)
    discset = TargetDomainDataset(imgs, annotations,
                                  skip=defaults.SKU110K_SKIP)
    pretrain_gan(dataset, discset, out, epochs=epochs,
                 batch_size=batch_size, masks=masks, resume=resume)


@dihe.command()
@_gp_options
@click.option("--source-type", type=click.Choice(["gp", "internal"]),
              default="gp", show_default=True,
              help="training gallery type (cvpce/cli/dihe.py:85)")
@click.option("--only", multiple=True,
              help="only train with these top-level data groups "
                   "(cvpce/cli/dihe.py:87)")
@click.option("--eval-data", multiple=True,
              help="separate eval gallery roots (used with internal "
                   "source, cvpce/cli/dihe.py:145)")
@click.option("--test-imgs", default=defaults.GP_TEST_DIR, show_default=True)
@click.option("--test-annotations", default=defaults.GP_ANN_DIR,
              show_default=True)
@click.option("--out", required=True, type=click.Path())
@click.option("--gan", "gan_path", default=None,
              help="pretrained GAN checkpoint dir (required for real runs)")
@click.option("--epochs", default=1, show_default=True)
@click.option("--batch-size", default=4, show_default=True)
@click.option("--masks", is_flag=True)
@click.option("--no-batchnorm", is_flag=True)
@click.option("--hyperopt-params", is_flag=True,
              help="enc lr 8e-7, multiplier 0.9 (cli/dihe.py:159-162)")
@click.option("--grain", is_flag=True,
              help="grain input pipeline (deterministic multi-host "
                   "order, mid-epoch resumable)")
@click.option("--resume", is_flag=True,
              help="continue from the rotating embedder_checkpoint in "
                   "--out (the reference's --load-enc, "
                   "cvpce/cli/dihe.py:132)")
@click.option("--imagenet", "imagenet_path", default=None,
              type=click.Path(exists=True),
              help="initialize the embedder from a torchvision "
                   "vgg16(_bn) ImageNet state_dict (layout only, no "
                   "torchvision needed) — the reference's pretrained "
                   "start, cvpce/models/classification.py:97-109")
def train(source, source_type, only, eval_data, imgs, annotations,
          test_imgs, test_annotations, out, gan_path, epochs, batch_size,
          masks, no_batchnorm, hyperopt_params, grain, resume,
          imagenet_path):
    """Train DIHE (cvpce/cli/dihe.py:77-167)."""
    from ..data.grocery import (GroceryProductsDataset,
                                GroceryProductsTestSet, InternalTrainSet)
    from ..data.sku110k import TargetDomainDataset
    from ..train.checkpoint import CheckpointManager
    from ..train.dihe import DIHETrainConfig
    from ..train.loops import train_dihe

    if source_type == "gp":
        dataset = GroceryProductsDataset(list(source), include_masks=masks,
                                         include_annotations=True,
                                         only=list(only) or None)
    else:
        dataset = InternalTrainSet(source[0], include_masks=masks,
                                   include_annotations=True)
    evaldata = dataset
    if eval_data:
        evaldata = GroceryProductsDataset(list(eval_data),
                                          include_masks=masks,
                                          include_annotations=True,
                                          only=list(only) or None)
    discset = TargetDomainDataset(imgs, annotations,
                                  skip=defaults.SKU110K_SKIP)
    evalset = GroceryProductsTestSet(
        test_imgs, test_annotations,
        only=defaults.GP_TEST_VALIDATION_SET_SIZE)
    cfg = DIHETrainConfig(
        enc_lr=HYPEROPT_ENC_LR if hyperopt_params else 1e-6,
        enc_multiplier=HYPEROPT_ENC_MULTIPLIER if hyperopt_params else 1.0,
        batchnorm=not no_batchnorm, masks=masks,
    )
    gan_state = None
    if gan_path:
        manager = CheckpointManager(gan_path, name="gan_checkpoint")
        from ..train.dihe import GANPretrainConfig, make_gan_pretrain_step
        import jax
        init, _ = make_gan_pretrain_step(GANPretrainConfig(masks=masks))
        abstract = init(jax.random.PRNGKey(0),
                        gen_channels=4 if masks else 3)
        gan_state = manager.restore(abstract)
    kwargs = {}
    if grain:
        from ..data.grain_loader import GrainLoader

        kwargs["loader_cls"] = GrainLoader
    if imagenet_path:
        from ..utils.torch_import import (import_vgg16_features,
                                          load_state_dict)

        kwargs["init_embedder"] = import_vgg16_features(
            load_state_dict(imagenet_path),
            batch_norm=not no_batchnorm)
    train_dihe(dataset, discset, evaldata, evalset, out,
               gan_state=gan_state, epochs=epochs, batch_size=batch_size,
               train_cfg=cfg, resume=resume, **kwargs)


@dihe.command("eval")
@_gp_options
@click.option("--test-imgs", default=defaults.GP_TEST_DIR, show_default=True)
@click.option("--test-annotations", default=defaults.GP_ANN_DIR,
              show_default=True)
@click.option("--weights", default=None,
              help="embedder weights (torch vgg16_bn or MACVGG checkpoint); "
              "omit for ImageNet-init eval like cli/dihe.py:301-309")
@click.option("--k", multiple=True, type=int, default=(1, 5),
              show_default=True)
@click.option("--batch-size", default=32, show_default=True)
@click.option("--encoder", type=click.Choice(["vgg16", "resnet50"]),
              default="vgg16", show_default=True)
@click.option("--resnet-layers", multiple=True, type=int, default=(2, 3),
              show_default=True,
              help="resnet50 descriptor layers (reference layer l = our "
                   "stage c(l+1); cvpce/cli/dihe.py:278)")
@click.option("--int8", is_flag=True,
              help="int8 MXU embed fast path (vgg16 only)")
@click.option("--index", default=None,
              help="prebuilt classifier index (skips gallery embedding)")
@click.option("--only", type=click.Choice(["none", "test", "val"]),
              default="none", show_default=True,
              help="all annotations, or only the test/validation split "
                   "(first 2 per image = val; cvpce/cli/dihe.py:284-298)")
@click.option("--validation", is_flag=True,
              help="alias for --only val (defaults.py:24-26)")
@click.option("--sharded-gallery", is_flag=True,
              help="shard the gallery across all devices "
                   "(ops/knn_sharded.py pod-scale search)")
def eval_cmd(source, imgs, annotations, test_imgs, test_annotations,
             weights, k, batch_size, encoder, resnet_layers, int8, index,
             only, validation, sharded_gallery):
    """Gallery-kNN classification accuracy (cvpce/cli/dihe.py:257-309)."""
    from ..data.grocery import (GroceryProductsDataset,
                                GroceryProductsTestSet)
    from ..eval.classification import eval_dihe

    encoder_fn, emb_size = load_embedder(weights, encoder=encoder,
                                         int8=int8,
                                         resnet_layers=tuple(resnet_layers))
    mesh = None
    if sharded_gallery:
        from ..parallel.mesh import data_parallel_mesh

        mesh = data_parallel_mesh()
    sampleset = None if index else GroceryProductsDataset(
        list(source), random_crop=False, include_annotations=True)
    split = "val" if validation else only
    testset = GroceryProductsTestSet(
        test_imgs, test_annotations,
        only=defaults.GP_TEST_VALIDATION_SET_SIZE if split == "val"
        else None,
        skip=defaults.GP_TEST_VALIDATION_SET_SIZE if split == "test"
        else None)
    accuracy = eval_dihe(encoder_fn, emb_size, sampleset, testset,
                         batch_size=batch_size, k=tuple(k),
                         load_index=index, mesh=mesh)
    click.echo(json.dumps({str(kk): v for kk, v in accuracy.items()}))


@dihe.command("prebuild-index")
@_gp_options
@click.option("--datatype", type=click.Choice(["gp", "internal"]),
              default="gp", show_default=True,
              help="gallery dataset type (cvpce/cli/dihe.py:390)")
@click.option("--weights", default=None)
@click.option("--out", required=True, type=click.Path())
@click.option("--batch-size", default=32, show_default=True)
@click.option("--int8", is_flag=True,
              help="int8 MXU embed fast path")
def prebuild_index(source, datatype, imgs, annotations, weights, out,
                   batch_size, int8):
    """Embed the gallery once and save the classifier index
    (cvpce/cli/dihe.py:382-423)."""
    from ..data.grocery import GroceryProductsDataset, InternalTrainSet
    from ..pipeline.classifier import Classifier

    encoder_fn, emb_size = load_embedder(weights, int8=int8)
    if datatype == "gp":
        sampleset = GroceryProductsDataset(list(source), random_crop=False,
                                           include_annotations=True)
    else:
        sampleset = InternalTrainSet(source[0], random_crop=False,
                                     include_annotations=True)
    classifier = Classifier(encoder_fn, emb_size, sampleset,
                            batch_size=batch_size, verbose=True)
    classifier.save_index(out)
    click.echo(f"index with {len(classifier.annotations)} entries -> {out}")


@dihe.command("visualize-performance")
@click.option("--index", required=True, help="prebuilt classifier index")
@click.option("--weights", default=None)
@click.argument("images", nargs=-1, type=click.Path(exists=True))
@click.option("--out", required=True)
@click.option("--k", default=5, show_default=True)
def visualize_performance(index, weights, images, out, k):
    """kNN grid visualization (cvpce/cli/dihe.py:311-380)."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    from ..data import transforms as T
    from ..pipeline.classifier import Classifier

    encoder_fn, emb_size = load_embedder(weights)
    classifier = Classifier(encoder_fn, emb_size, load=index, k=k)
    fig, axes = plt.subplots(len(images), 1,
                             figsize=(8, 3 * max(len(images), 1)))
    axes = np.atleast_1d(axes)
    for ax, img_path in zip(axes, images):
        img = T.scale_to_tanh(T.resize_for_classification(
            T.load_image(img_path)))
        anns = classifier.classify(img[None])[0]
        ax.imshow(T.scale_from_tanh(img) if hasattr(T, "scale_from_tanh")
                  else (img + 1) / 2)
        ax.set_title(" | ".join(str(a) for a in anns), fontsize=8)
        ax.axis("off")
    fig.savefig(out, bbox_inches="tight", dpi=120)
    click.echo(f"saved {out}")


@dihe.command()
@_gp_options
@click.option("--source-type", type=click.Choice(["gp", "internal"]),
              default="gp", show_default=True,
              help="training gallery type (cvpce/cli/dihe.py:177)")
@click.option("--only", multiple=True,
              help="only train with these top-level data groups "
                   "(cvpce/cli/dihe.py:179)")
@click.option("--test-imgs", default=defaults.GP_TEST_DIR, show_default=True)
@click.option("--test-annotations", default=defaults.GP_ANN_DIR,
              show_default=True)
@click.option("--out", required=True, type=click.Path())
@click.option("--gan", "gan_path", default=None)
@click.option("--trials", default=16, show_default=True,
              help="TOTAL trial budget (incl. restored on --resume)")
@click.option("--max-epochs", default=6, show_default=True)
@click.option("--resume", is_flag=True,
              help="restore search_state.json from --out and continue "
                   "(the reference's --load/--load-algo, "
                   "cvpce/cli/dihe.py:212-213)")
@click.option("--batch-size", default=4, show_default=True)
@click.option("--shared-state", default=None, type=click.Path(),
              help="multi-host search: claim trials from this shared "
                   "flock-backed store (same command on every host, "
                   "distinct --host-id)")
@click.option("--host-id", default=0, show_default=True)
def hyperopt(source, source_type, only, imgs, annotations, test_imgs,
             test_annotations, out, gan_path, trials, max_epochs, resume,
             batch_size, shared_state, host_id):
    """Hyperparameter search over the reference's DIHE space
    (cvpce/cli/dihe.py:224-228: batchnorm, enc_multiplier, enc_lr) with
    ASHA early stopping."""
    import json
    import os
    from os import path

    from ..data.grocery import (GroceryProductsDataset,
                                GroceryProductsTestSet)
    from ..data.sku110k import TargetDomainDataset
    from ..train.dihe import DIHETrainConfig
    from ..train.hyperopt import DIHE_SPACE, run_search
    from ..train.loops import train_dihe

    os.makedirs(out, exist_ok=True)
    if source_type == "gp":
        dataset = GroceryProductsDataset(list(source),
                                         include_annotations=True,
                                         only=list(only) or None)
    else:
        from ..data.grocery import InternalTrainSet

        dataset = InternalTrainSet(source[0], include_annotations=True)
    discset = TargetDomainDataset(imgs, annotations,
                                  skip=defaults.SKU110K_SKIP)
    evalset = GroceryProductsTestSet(
        test_imgs, test_annotations,
        only=defaults.GP_TEST_VALIDATION_SET_SIZE)

    import jax

    from ..train.hyperopt import device_scope, trial_dir_allocator

    new_trial_dir = trial_dir_allocator(out)

    def train_one_epoch(config, epoch, carry, device=None):
        cfg = DIHETrainConfig(enc_lr=config["enc_lr"],
                              enc_multiplier=config["enc_multiplier"],
                              batchnorm=config["batchnorm"])
        metrics = {}

        def report(**kw):
            metrics.update(kw)

        if carry is None:  # first epoch of this trial: own working dir
            carry = new_trial_dir()
        # one trial per device (cvpce/cli/dihe.py:243), no mesh inside
        with device_scope(device):
            # resume from the trial's rotating checkpoint so each epoch
            # CONTINUES the same training run (loops.py saves at every
            # epoch boundary)
            train_dihe(dataset, discset, dataset, evalset,
                       carry, epochs=1, batch_size=batch_size,
                       train_cfg=cfg, use_mesh=False,
                       hyperopt_report=report, resume=epoch > 0)
        return metrics.get("accuracy", 0.0), carry

    if shared_state:
        from ..train.hyperopt import run_search_multihost

        result = run_search_multihost(
            train_one_epoch, DIHE_SPACE, state_path=shared_state,
            num_trials=trials, max_epochs=max_epochs,
            devices=jax.devices(), host_id=host_id)
    else:
        result = run_search(
            train_one_epoch, DIHE_SPACE, num_trials=trials,
            max_epochs=max_epochs, devices=jax.devices(),
            state_path=path.join(out, "search_state.json"),
            resume=resume)
    click.echo(json.dumps({"best_config": result["best_config"],
                           "best_metric": result["best_metric"]}, indent=2))
    with open(path.join(out, "hyperopt_result.json"), "w") as f:
        json.dump({"best_config": result["best_config"],
                   "best_metric": result["best_metric"]}, f)
