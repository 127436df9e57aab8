"""`datasets` command group: inspection/visualization utilities
(reference: cvpce/cli/datasets/*)."""
from __future__ import annotations

import click
import numpy as np

from ..data import defaults


@click.group()
def datasets():
    """Dataset inspection and visualization."""


def _save_boxes_viz(img, boxes, out, labels=None):
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
@click.option("--gaussians", is_flag=True,
              help="also render the heatmap target")
def sku_visualize(imgs, annotations, index, out, gaussians):
    from ..data.sku110k import SKU110KDataset

    ds = SKU110KDataset(imgs, annotations, flip_chance=0.0)
    img, boxes = ds.load_raw(index)
    _save_boxes_viz(img, boxes, out)
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
@click.option("--out", required=True)
def gp_visualize_test(imgs, annotations, index, out):
    from ..data.grocery import GroceryProductsTestSet

    ds = GroceryProductsTestSet(imgs, annotations)
    img, anns, boxes = ds[index]
    _save_boxes_viz(img, boxes, out, labels=anns)


@gp.command("test-distribution")
@click.option("--imgs", default=defaults.GP_TEST_DIR, show_default=True)
@click.option("--annotations", default=defaults.GP_ANN_DIR,
              show_default=True)
def gp_test_distribution(imgs, annotations):
    """Per-category annotation counts (cvpce/cli/datasets/gp.py
    distribution commands)."""
    from collections import Counter

    from ..data.grocery import GroceryProductsTestSet

    ds = GroceryProductsTestSet(imgs, annotations)
    counts = Counter(a.split("/")[0] if "/" in a else a
                     for e in ds.index for a in e["anns"])
    for name, n in counts.most_common():
        click.echo(f"{n:6d}  {name}")


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
@click.option("--out", required=True)
def grozi_visualize_test(root, index, out):
    from ..data.grozi import GroZiTestSet

    ds = GroZiTestSet(root)
    img, anns, boxes = ds[index]
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
@click.option("--index", default=0, show_default=True)
@click.option("--out", required=True)
def gp_visualize_train(source, index, out):
    """Training gallery item: embedder input vs generator crop
    (cvpce/cli/datasets/gp.py visualize-train)."""
    from ..data.grocery import GroceryProductsDataset
    from ..utils.viz import save_multiple

    ds = GroceryProductsDataset(list(source))
    emb, gen, hier = ds[index]
    save_multiple([(emb + 1) / 2, (gen[..., :3] + 1) / 2], out)
    click.echo(f"{'/'.join(hier)} -> {out}")


@gp.command("train-distribution")
@click.option("--source", multiple=True, default=defaults.GP_TRAIN_FOLDERS,
              show_default=True)
@click.option("--out", default=None, help="save a treemap here")
def gp_train_distribution(source, out):
    """Top-level category counts of the training gallery
    (cvpce/cli/datasets/gp.py train-distribution treemaps)."""
    from collections import Counter

    from ..data.grocery import GroceryProductsDataset

    ds = GroceryProductsDataset(list(source), random_crop=False)
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
