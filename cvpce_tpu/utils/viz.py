"""Visualization utilities (reference: cvpce/utils.py:25-261).

All savers use the Agg backend; nothing here touches the device except
`pca`, which is one jnp SVD (replacing torch.svd at cvpce/utils.py:286-288).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    return plt


def pca(embeddings: np.ndarray, keepdims: int = 2) -> np.ndarray:
    """Project embeddings to their top principal components
    (cvpce/utils.py:286-288 semantics: u[:, i] * s[i])."""
    import jax.numpy as jnp

    u, s, _ = jnp.linalg.svd(jnp.asarray(embeddings), full_matrices=False)
    return np.asarray(
        jnp.stack([u[:, i] * s[i] for i in range(keepdims)], axis=1))


def save_boxes(img: np.ndarray, boxes, out: str, labels=None,
               color: str = "lime") -> None:
    """Detection/annotation overlay (cvpce/utils.py:25-63)."""
    plt = _plt()
    from matplotlib import patches

    fig, ax = plt.subplots(figsize=(12, 9))
    ax.imshow(np.clip(img, 0, 1))
    for i, (x1, y1, x2, y2) in enumerate(np.asarray(boxes)):
        ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                       fill=False, edgecolor=color))
        if labels is not None:
            ax.text(x1, y1, str(labels[i]), color="yellow", fontsize=6)
    ax.axis("off")
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)


def save_heatmap(heatmap: np.ndarray, out: str) -> None:
    """Gaussian heatmap render (used by GLN checkpoints,
    proposals_training.py:100)."""
    plt = _plt()
    hm = np.asarray(heatmap).squeeze()
    plt.imsave(out, hm, cmap="hot")


def save_multiple(images: Sequence[np.ndarray], out: str) -> None:
    """Side-by-side image strip (cvpce/utils.py save_multiple analogue,
    used for GAN source/fake/target triplets)."""
    plt = _plt()
    n = len(images)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
    axes = np.atleast_1d(axes)
    for ax, img in zip(axes, images):
        ax.imshow(np.clip(np.asarray(img).squeeze(), 0, 1))
        ax.axis("off")
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)


def save_embedding_scatter(embeddings: np.ndarray, out: str,
                           labels: Optional[Sequence] = None,
                           fake_embeddings: Optional[np.ndarray] = None
                           ) -> None:
    """PCA scatter of embeddings, optionally real-vs-generated
    (cvpce/utils.py:65-136 analogue)."""
    plt = _plt()
    proj = pca(embeddings)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(proj[:, 0], proj[:, 1], s=12, label="real")
    if fake_embeddings is not None:
        both = np.concatenate([embeddings, fake_embeddings])
        proj_all = pca(both)
        n = len(embeddings)
        ax.clear()
        ax.scatter(proj_all[:n, 0], proj_all[:n, 1], s=12, label="real")
        ax.scatter(proj_all[n:, 0], proj_all[n:, 1], s=12, marker="x",
                   label="generated")
    if labels is not None:
        for i, lbl in enumerate(labels):
            ax.annotate(str(lbl), proj[i], fontsize=5)
    ax.legend()
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)


def draw_planogram(boxes: np.ndarray, labels: Sequence, out: str,
                   matched: Optional[np.ndarray] = None) -> None:
    """Abstract planogram layout drawing (cvpce/utils.py:159-203)."""
    plt = _plt()
    from matplotlib import patches

    boxes = np.asarray(boxes)
    fig, ax = plt.subplots(figsize=(10, 6))
    ax.set_xlim(boxes[:, 0].min() - 1, boxes[:, 2].max() + 1)
    ax.set_ylim(boxes[:, 1].min() - 1, boxes[:, 3].max() + 1)
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        color = "green" if matched is None or matched[i] else "red"
        ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                       fill=False, edgecolor=color))
        ax.text((x1 + x2) / 2, (y1 + y2) / 2, str(labels[i]), fontsize=5,
                ha="center", va="center")
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)
