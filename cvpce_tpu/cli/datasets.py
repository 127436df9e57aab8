"""`datasets` command group: inspection/visualization utilities
(reference: cvpce/cli/datasets/*)."""
from __future__ import annotations

import click
import numpy as np

from ..data import defaults


@click.group()
def datasets():
    """Dataset inspection and visualization."""


def _save_boxes_viz(img, boxes, out, labels=None, extra_boxes=None):
    """Ground truth in lime; `extra_boxes` (e.g. model detections) in
    cyan."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import patches, pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 9))
    ax.imshow(img)
    for i, (x1, y1, x2, y2) in enumerate(np.asarray(boxes)):
        ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                       fill=False, edgecolor="lime"))
        if labels is not None:
            ax.text(x1, y1, str(labels[i]), color="yellow", fontsize=6)
    if extra_boxes is not None:
        for x1, y1, x2, y2 in np.asarray(extra_boxes):
            ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                           fill=False, edgecolor="cyan",
                                           linestyle="--"))
    ax.axis("off")
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)
    click.echo(f"saved {out}")


@datasets.group()
def sku110k():
    """SKU-110K (cvpce/cli/datasets/sku110k.py)."""


@sku110k.command("visualize")
@click.option("--imgs", default=defaults.SKU110K_IMG_DIR, show_default=True)
@click.option("--annotations", default=defaults.SKU110K_ANNOTATION_FILE,
              show_default=True)
@click.option("--index", default=0, show_default=True)
@click.option("--out", required=True)
@click.option("--flip", is_flag=True,
              help="show the flipped sample "
                   "(cvpce/cli/datasets/sku110k.py:40)")
@click.option("--gaussians", is_flag=True,
              help="also render the heatmap target")
@click.option("--model", default=None,
              help="GLN weights: overlay detections over the ground "
                   "truth (cvpce/cli/datasets/sku110k.py:42)")
@click.option("--conf-thresh", default=0.45, show_default=True)
@click.option("--canvas", nargs=2, type=int, default=(832, 1344),
              show_default=True, help="detector canvas for --model")
@click.option("--max-detections", default=1000, show_default=True)
@click.option("--nms-candidates", default=5120, show_default=True)
def sku_visualize(imgs, annotations, index, out, flip, gaussians, model,
                  conf_thresh, canvas, max_detections, nms_candidates):
    from ..data.sku110k import SKU110KDataset

    ds = SKU110KDataset(imgs, annotations,
                        flip_chance=1.0 if flip else 0.0)
    img, boxes = ds.load_raw(index)
    if flip:
        img = img[:, ::-1]
        flipped = boxes.copy()
        flipped[:, 0] = img.shape[1] - boxes[:, 2]
        flipped[:, 2] = img.shape[1] - boxes[:, 0]
        boxes = flipped
    det_boxes = None
    if model is not None:
        import dataclasses

        from ..pipeline.proposals import ProposalGenerator
        from .common import default_gln_config, load_gln_variables

        config = dataclasses.replace(default_gln_config(),
                                     canvas_h=canvas[0], canvas_w=canvas[1],
                                     detections_per_img=max_detections,
                                     max_nms_candidates=nms_candidates)
        from ..pipeline.calibrate import (calibration_dir_for_weights,
                                          resolve_input_norm)

        variables = load_gln_variables(model, config)
        gen = ProposalGenerator(
            variables, config, confidence_threshold=conf_thresh,
            input_norm=resolve_input_norm(
                calibration_dir_for_weights(model)))
        det_boxes = gen.generate_proposals(img)
    _save_boxes_viz(img, boxes, out, extra_boxes=det_boxes)
    if gaussians:
        from ..ops.gaussians import render_gaussians

        hm = np.asarray(render_gaussians(
            boxes, np.ones(len(boxes), bool),
            height=img.shape[0], width=img.shape[1], method="simple"))
        import matplotlib
        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        plt.imsave(out.replace(".png", "_gauss.png"), hm, cmap="hot")


@sku110k.command("iter")
@click.option("--imgs", default=defaults.SKU110K_IMG_DIR, show_default=True)
@click.option("--annotations", default=defaults.SKU110K_ANNOTATION_FILE,
              show_default=True)
def sku_iter(imgs, annotations):
    """Iterate the dataset checking loadability
    (cvpce/cli/datasets/sku110k.py iter)."""
    from ..data.sku110k import SKU110KDataset

    ds = SKU110KDataset(imgs, annotations, flip_chance=0.0)
    for i in range(len(ds)):
        try:
            ds.load_raw(i)
        except Exception as e:  # noqa: BLE001
            click.echo(f"FAIL {ds.index[i]['image_name']}: {e}")
        if i % 100 == 0:
            click.echo(f"{i}/{len(ds)}")


@datasets.group()
def gp():
    """Grocery Products (cvpce/cli/datasets/gp.py)."""


@gp.command("visualize-test")
@click.option("--imgs", default=defaults.GP_TEST_DIR, show_default=True)
@click.option("--annotations", default=defaults.GP_ANN_DIR,
              show_default=True)
@click.option("--index", default=0, show_default=True)
@click.option("--store", default=None, type=int,
              help="select by store id instead of --index "
                   "(cvpce/cli/datasets/gp.py:75)")
@click.option("--image", "image_id", default=None, type=int,
              help="select by image id (with --store)")
@click.option("--out", required=True)
def gp_visualize_test(imgs, annotations, index, store, image_id, out):
    from ..data.grocery import GroceryProductsTestSet

    ds = GroceryProductsTestSet(imgs, annotations)
    if store is not None and image_id is not None:
        found = ds.get_index_for(str(store), str(image_id))
        if found is None:
            raise click.UsageError(f"no test image s{store}_{image_id}")
        index = found
    img, anns, boxes = ds[index]
    _save_boxes_viz(img, boxes, out, labels=anns)


@gp.command("test-distribution")
@click.option("--imgs", default=defaults.GP_TEST_DIR, show_default=True)
@click.option("--annotations", default=defaults.GP_ANN_DIR,
              show_default=True)
@click.option("--only", type=click.Choice(
    ["none", "test", "val", "keep2", "skip2"]), default="none",
    show_default=True,
    help="full set, or the test (skip first 2 anns/img) / validation "
         "(keep first 2) split (cvpce/cli/datasets/gp.py:201)")
def gp_test_distribution(imgs, annotations, only):
    """Per-category annotation counts (cvpce/cli/datasets/gp.py
    distribution commands)."""
    from collections import Counter

    from ..data.grocery import GroceryProductsTestSet

    n = defaults.GP_TEST_VALIDATION_SET_SIZE
    ds = GroceryProductsTestSet(
        imgs, annotations,
        only=n if only in ("val", "keep2") else None,
        skip=n if only in ("test", "skip2") else None)
    # apply the per-image split slice on the index directly (no image IO)
    sl = slice(ds.toskip, ds.tokeep)
    counts = Counter(a.split("/")[0] if "/" in a else a
                     for e in ds.index for a in e["anns"][sl])
    for name, cnt in counts.most_common():
        click.echo(f"{cnt:6d}  {name}")


@gp.command("visualize-planoset")
@click.option("--imgs", default=defaults.GP_TEST_DIR, show_default=True)
@click.option("--annotations", default=defaults.GP_ANN_DIR,
              show_default=True)
@click.option("--planograms", default=defaults.GP_PLANO_DIR,
              show_default=True)
@click.option("--index", default=0, show_default=True)
@click.option("--out", required=True)
def gp_visualize_planoset(imgs, annotations, planograms, index, out):
    from ..data.planograms import PlanogramTestSet

    ds = PlanogramTestSet(imgs, annotations, planograms)
    img, anns, boxes, plano = ds[index]
    _save_boxes_viz(img, boxes, out, labels=anns)
    _save_boxes_viz(np.ones((10, 10, 3)), plano["boxes"],
                    out.replace(".png", "_plano.png"),
                    labels=plano["labels"])


@gp.command("mask-test")
@click.argument("image", type=click.Path(exists=True))
@click.option("--out", required=True)
def gp_mask_test(image, out):
    """White-background mask visualization (cvpce/cli/datasets/gp.py
    mask-test)."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    from ..data import transforms as T

    img = T.load_image(image)
    mask = T.build_white_background_mask(img)
    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    axes[0].imshow(img)
    axes[1].imshow(mask, cmap="gray")
    for ax in axes:
        ax.axis("off")
    fig.savefig(out, bbox_inches="tight", dpi=120)
    click.echo(f"saved {out}")


@datasets.group()
def grozi():
    """GroZi-120 (cvpce/cli/datasets/grozi.py)."""


@grozi.command("extract-test-images")
@click.option("--root", default=defaults.GROZI_ROOT, show_default=True)
def grozi_extract(root):
    from ..data.grozi import extract_grozi_test_imgs

    extract_grozi_test_imgs(root)


@grozi.command("visualize-test")
@click.option("--root", default=defaults.GROZI_ROOT, show_default=True)
@click.option("--index", default=0, show_default=True)
@click.option("--select-from", type=click.Choice(["none", "min", "max"]),
              default="none", show_default=True,
              help="pick --index within the least/most annotated images "
                   "(cvpce/cli/datasets/grozi.py:32)")
@click.option("--out", required=True)
def grozi_visualize_test(root, index, select_from, out):
    from ..data.grozi import GroZiTestSet

    ds = GroZiTestSet(root)
    if select_from != "none":
        idxset = (ds.least_annotated() if select_from == "min"
                  else ds.most_annotated())
        click.echo(f"{len(idxset)} {select_from}-annotated images")
        index = idxset[index % len(idxset)]
    img, anns, boxes = ds[index]
    click.echo(f"annotations in image: {len(anns)}")
    _save_boxes_viz(img, boxes, out, labels=list(anns))


@grozi.command("visualize")
@click.option("--root", default=defaults.GROZI_ROOT, show_default=True)
@click.option("--out", required=True)
@click.option("--seed", default=0, show_default=True)
def grozi_visualize(root, out, seed):
    """Dataset overview: 2 random test frames with boxes + the training
    images of the products they contain, padded to 8 with random products
    (cvpce/cli/datasets/grozi.py visualize)."""
    import numpy as np

    from ..data.grozi import GroZiDataset, GroZiTestSet
    from ..utils.viz import save_dataset_sample

    rng = np.random.default_rng(seed)
    train_set = GroZiDataset(root)
    test_set = GroZiTestSet(root)
    picks = [test_set[int(rng.integers(len(test_set)))] for _ in range(2)]
    test_imgs = [p[0] for p in picks]
    test_anns = [[int(a) for a in p[1]] for p in picks]
    test_boxes = [p[2] for p in picks]

    uniq = sorted(set(test_anns[0]) | set(test_anns[1]))
    train_imgs, train_anns = [], []
    for ann in uniq:
        idx = train_set.index_for_ann(ann)
        if idx is not None:
            img, a = train_set[idx]
            train_imgs.append(img)
            train_anns.append(a)
    while len(train_imgs) < 8:
        img, a = train_set[int(rng.integers(len(train_set)))]
        train_imgs.append(img)
        train_anns.append(a)
    save_dataset_sample(test_imgs, test_boxes, test_anns,
                        train_imgs, train_anns, out)
    click.echo(f"saved {out} (test products: {uniq})")


@datasets.group()
def internal():
    """Internal dataset (cvpce/cli/datasets/internal.py)."""


@internal.command("visualize-train")
@click.option("--root", required=True)
@click.option("--index", default=None, type=int,
              help="item index; random when omitted")
@click.option("--out", required=True)
@click.option("--seed", default=0, show_default=True)
def internal_visualize_train(root, index, out, seed):
    """One training item: embedder input / generator input / alpha mask
    triple + its hierarchy and annotation
    (cvpce/cli/datasets/internal.py visualize-train)."""
    import numpy as np

    from ..data.grocery import InternalTrainSet
    from ..ops.image import scale_from_tanh
    from ..utils.viz import save_multiple

    ds = InternalTrainSet(root, include_annotations=True,
                          include_masks=True)
    if index is None:
        index = int(np.random.default_rng(seed).integers(len(ds)))
    img, gen, hier, ann = ds[index]
    mask = gen[..., 3]
    save_multiple([scale_from_tanh(img), scale_from_tanh(gen[..., :3]),
                   np.stack([mask, mask, mask], -1)], out)
    click.echo(" - ".join(hier))
    click.echo(f"{ann} -> {out}")


@internal.command("visualize")
@click.option("--root", required=True)
@click.option("--out", required=True)
@click.option("--seed", default=0, show_default=True)
def internal_visualize_overview(root, out, seed):
    """Dataset overview: 2 random planoset scenes + 8 random training
    products (cvpce/cli/datasets/internal.py visualize)."""
    from os import path as osp

    import numpy as np

    from ..data.grocery import InternalTrainSet
    from ..data.planograms import InternalPlanoSet
    from ..ops.image import scale_from_tanh
    from ..utils.viz import save_dataset_sample

    rng = np.random.default_rng(seed)
    test_set = InternalPlanoSet(root)
    train_set = InternalTrainSet(osp.join(root, "ConvertedProducts"),
                                 include_annotations=True,
                                 random_crop=False, resize=False)
    test_imgs = [test_set[int(rng.integers(len(test_set)))][0]
                 for _ in range(2)]
    train_imgs, train_anns = [], []
    for _ in range(8):
        img, _, _, ann = train_set[int(rng.integers(len(train_set)))]
        train_imgs.append(scale_from_tanh(img))
        train_anns.append(ann[:8])
    click.echo(f"Different products: {len(set(train_set.annotations))}")
    save_dataset_sample(test_imgs, [[], []], [[], []],
                        train_imgs, train_anns, out)
    click.echo(f"saved {out}")


@internal.command("visualize-planoset")
@click.option("--root", required=True)
@click.option("--index", default=0, show_default=True)
@click.option("--out", required=True)
def internal_visualize(root, index, out):
    from ..data.planograms import InternalPlanoSet

    ds = InternalPlanoSet(root)
    img, plano = ds[index]
    _save_boxes_viz(img, plano["boxes"], out, labels=plano["labels"])


@gp.command("visualize-train")
@click.option("--source", multiple=True, default=defaults.GP_TRAIN_FOLDERS,
              show_default=True)
@click.option("--only", multiple=True,
              help="top-level group filter (cvpce/cli/datasets/gp.py:55)")
@click.option("--index", default=0, show_default=True)
@click.option("--out", required=True)
def gp_visualize_train(source, only, index, out):
    """Training gallery item: embedder input vs generator crop
    (cvpce/cli/datasets/gp.py visualize-train)."""
    from ..data.grocery import GroceryProductsDataset
    from ..utils.viz import save_multiple

    ds = GroceryProductsDataset(list(source), only=list(only) or None)
    emb, gen, hier = ds[index]
    save_multiple([(emb + 1) / 2, (gen[..., :3] + 1) / 2], out)
    click.echo(f"{'/'.join(hier)} -> {out}")


@gp.command("train-distribution")
@click.option("--source", multiple=True, default=defaults.GP_TRAIN_FOLDERS,
              show_default=True)
@click.option("--only", multiple=True,
              help="top-level group filter (cvpce/cli/datasets/gp.py:182)")
@click.option("--out", default=None, help="save a treemap here")
def gp_train_distribution(source, only, out):
    """Top-level category counts of the training gallery
    (cvpce/cli/datasets/gp.py train-distribution treemaps)."""
    from collections import Counter

    from ..data.grocery import GroceryProductsDataset

    ds = GroceryProductsDataset(list(source), random_crop=False,
                                only=list(only) or None)
    counts = Counter(c[0] if c else "(root)" for c in ds.categories)
    for name, n in counts.most_common():
        click.echo(f"{n:6d}  {name}")
    if out:
        from ..utils.viz import category_treemap

        category_treemap(dict(counts), out)
        click.echo(f"saved {out}")


@sku110k.command("visualize-discriminator-target")
@click.option("--imgs", default=defaults.SKU110K_IMG_DIR, show_default=True)
@click.option("--annotations", default=defaults.SKU110K_ANNOTATION_FILE,
              show_default=True)
@click.option("--index", default=0, show_default=True)
@click.option("--out", required=True)
def sku_visualize_discriminator_target(imgs, annotations, index, out):
    """One 'real' 256x256 product crop as the GAN discriminator sees it
    (cvpce/cli/datasets/sku110k.py visualize-discriminator-target)."""
    from ..data.sku110k import TargetDomainDataset
    from ..utils.viz import save_multiple

    ds = TargetDomainDataset(imgs, annotations,
                             skip=defaults.SKU110K_SKIP)
    save_multiple([ds[index]], out)
    click.echo(f"saved {out} ({len(ds)} crops total)")


@grozi.command("visualize-train")
@click.option("--root", default=defaults.GROZI_ROOT, show_default=True)
@click.option("--index", default=0, show_default=True)
@click.option("--out", required=True)
def grozi_visualize_train(root, index, out):
    from ..data.grozi import GroZiDataset
    from ..utils.viz import save_multiple

    ds = GroZiDataset(root)
    img, ann = ds[index]
    save_multiple([img], out)
    click.echo(f"product {ann} -> {out}")


@internal.command("iter-train")
@click.option("--root", required=True)
def internal_iter_train(root):
    """Iterate the internal trainset checking loadability
    (cvpce/cli/datasets/internal.py iter-train)."""
    from ..data.grocery import InternalTrainSet

    ds = InternalTrainSet(root)
    for i in range(len(ds)):
        try:
            ds[i]
        except Exception as e:  # noqa: BLE001
            click.echo(f"FAIL {ds.paths[i]}: {e}")
        if i % 100 == 0:
            click.echo(f"{i}/{len(ds)}")


@datasets.command("visualize-coco")
@click.option("--imgs", default=defaults.DATA_DIR + "/coco/val2017",
              show_default=True)
@click.option("--annotations",
              default=defaults.DATA_DIR
              + "/coco/annotations/instances_val2017.json",
              show_default=True)
@click.option("--index", default=0, show_default=True)
@click.option("--out", required=True)
@click.option("--gaussians", is_flag=True,
              help="also render the Gaussian target preview")
def visualize_coco(imgs, annotations, index, out, gaussians):
    """COCO visualization + optional Gaussian-target preview
    (cvpce/cli/datasets/misc.py, without pycocotools)."""
    from ..data.coco import CocoDetectionDataset

    ds = CocoDetectionDataset(imgs, annotations)
    img, entry = ds[index]
    labels = [ds.categories.get(int(c), str(c)) for c in entry["labels"]]
    _save_boxes_viz(img, entry["boxes"], out, labels=labels)
    if gaussians:
        from ..ops.gaussians import render_gaussians

        hm = np.asarray(render_gaussians(
            entry["boxes"], np.ones(len(entry["boxes"]), bool),
            height=img.shape[0], width=img.shape[1], method="simple"))
        import matplotlib
        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        plt.imsave(out.replace(".png", "_gauss.png"), hm, cmap="hot")
        click.echo(f"saved {out.replace('.png', '_gauss.png')}")


@gp.command("fix")
@click.option("--source", required=True,
              type=click.Path(exists=True, file_okay=False))
@click.option("--out", required=True, type=click.Path(file_okay=False))
@click.option("--dry-run", is_flag=True)
def gp_fix(source, out, dry_run):
    """Repair a Grocery Products download whose files were renamed to
    food_<n>.jpg: restore the sequential 1.jpg.. naming the Tonioni
    annotations expect (cvpce/cli/datasets/gp.py fix). The first file in
    each directory is a duplicate artifact and is dropped."""
    import os
    import re
    import shutil

    renamed_re = re.compile(r"food_(\d+).jpg")
    stack = [(source, [])]
    copied = 0
    while stack:
        cur, hier = stack.pop()
        files = []
        for entry in os.scandir(cur):
            if entry.is_dir(follow_symlinks=False):
                stack.append((entry.path, hier + [entry.name]))
            elif entry.is_file():
                m = renamed_re.match(entry.name)
                if m:
                    files.append((int(m.group(1)), entry))
        if not files:
            continue
        files = [e for _, e in sorted(files)]
        new_names = sorted(f"{i}.jpg" for i in range(1, len(files)))
        out_path = os.path.join(out, *hier)
        if not dry_run:
            os.makedirs(out_path, exist_ok=True)
        for f, new in zip(files[1:], new_names):  # first entry is garbage
            if dry_run:
                click.echo(f"{f.path} -> {os.path.join(out_path, new)}")
            else:
                shutil.copy(f.path, os.path.join(out_path, new))
                copied += 1
    click.echo(f"{'(dry run) ' if dry_run else ''}done, {copied} files")


@gp.command("visualize")
@click.option("--source", "train_imgs", multiple=True,
              default=defaults.GP_TRAIN_FOLDERS, show_default=True)
@click.option("--test-imgs", default=defaults.GP_TEST_DIR, show_default=True)
@click.option("--annotations", default=defaults.GP_ANN_DIR,
              show_default=True)
@click.option("--seed", default=0, show_default=True)
@click.option("--out", required=True)
def gp_visualize(train_imgs, test_imgs, annotations, seed, out):
    """Combined dataset overview (cvpce/cli/datasets/gp.py:125-173): two
    test shelves with annotated boxes plus up to 8 training product
    images, preferring the products that appear in the chosen shelves."""
    import re as _re

    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import patches, pyplot as plt

    from ..data import transforms as T
    from ..data.grocery import (GroceryProductsDataset,
                                GroceryProductsTestSet)

    ann_re = _re.compile(r"^(Food/)?(.*?)\..*$")

    def shorten(ann):
        m = ann_re.match(ann)
        return m.group(2) if m else ann

    trainset = GroceryProductsDataset(list(train_imgs), random_crop=False)
    testset = GroceryProductsTestSet(test_imgs, annotations)
    rng = np.random.default_rng(seed)
    picks = rng.choice(len(testset), size=min(2, len(testset)),
                       replace=False)
    samples = [testset[int(i)] for i in picks]

    uniq = {a for _, anns, _ in samples for a in anns}
    prod_idx = [i for i in (trainset.index_for_ann(a) for a in sorted(uniq))
                if i is not None][:8]
    while len(prod_idx) < min(8, len(trainset)):
        j = int(rng.integers(0, len(trainset)))
        if j not in prod_idx:
            prod_idx.append(j)

    fig = plt.figure(figsize=(16, 12))
    for col, (img, anns, boxes) in enumerate(samples):
        ax = fig.add_subplot(3, 2, col + 1)
        ax.imshow(img)
        for (x1, y1, x2, y2), a in zip(boxes, anns):
            ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                           fill=False, edgecolor="lime"))
            ax.text(x1, y1, shorten(a), color="yellow", fontsize=5)
        ax.axis("off")
    for i, idx in enumerate(prod_idx):
        ax = fig.add_subplot(3, 4, 5 + i)
        ax.imshow(T.load_image(trainset.paths[idx]))
        ax.set_title(shorten(trainset.annotations[idx]), fontsize=7)
        ax.axis("off")
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)
    click.echo(f"saved {out}")


@gp.command("visualize-baseline")
@click.option("--imgs", default=defaults.GP_TEST_DIR, show_default=True)
@click.option("--annotations", default=defaults.GP_BASELINE_ANN_FILE,
              show_default=True)
@click.option("--index", default=0, show_default=True)
@click.option("--out", required=True)
def gp_visualize_baseline(imgs, annotations, index, out):
    """Tonioni baseline annotations overlay
    (cvpce/cli/datasets/gp.py visualize-baseline)."""
    from ..data.grocery import GPBaselineDataset

    ds = GPBaselineDataset(imgs, annotations)
    img, boxes = ds[index]
    _save_boxes_viz(img, boxes, out)


@gp.command("planogram-test")
@click.option("--planograms", default=defaults.GP_PLANO_DIR,
              show_default=True)
def gp_planogram_test(planograms):
    """Parse every GP-180 planogram JSON and report box counts / failures
    (cvpce/cli/datasets/gp.py planogram-test)."""
    import os

    from ..data.planograms import read_tonioni_planogram

    ok, failed = 0, 0
    for entry in sorted(os.scandir(planograms), key=lambda e: e.name):
        if not entry.name.endswith(".json"):
            continue
        try:
            boxes, labels, g = read_tonioni_planogram(entry.path)
            click.echo(f"{entry.name}: {len(boxes)} boxes, "
                       f"{g.number_of_edges()} edges")
            ok += 1
        except Exception as e:  # noqa: BLE001
            click.echo(f"{entry.name}: FAILED ({e})")
            failed += 1
    click.echo(f"{ok} parsed, {failed} failed")
