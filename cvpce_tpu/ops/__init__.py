"""Core device-side ops: boxes, metrics, kNN, heatmaps, NMS, images,
RANSAC, anchors, matching, losses (+ Pallas kernels for NMS and kNN)."""

from . import (  # noqa: F401
    anchors,
    boxes,
    gaussians,
    image,
    knn,
    losses,
    matching,
    metrics,
    nms,
    ransac,
)
