"""Core device-side ops: boxes, metrics, kNN, heatmaps, NMS, images, RANSAC."""

from . import boxes, gaussians, knn, metrics  # noqa: F401
