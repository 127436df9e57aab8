"""Spatially-sharded inference: split the image across the mesh.

The extension slot SURVEY.md §2.8 identifies beyond the reference's
data-parallel-only design: for very large shelf photos, shard the canvas
WIDTH across devices and let XLA's SPMD partitioner run each conv on its
strip, inserting halo exchanges (collective-permutes) at strip borders
automatically — the "annotate shardings, let XLA insert collectives"
recipe. Params stay replicated; detection head outputs come back
replicated for postprocessing.

No kernel changes: this is pure sharding annotation over the same GLN.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gln import GLN, GLNConfig, postprocess_detections


def spatial_mesh(devices: Optional[Sequence] = None,
                 axis: str = "width") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def make_spatial_infer(variables: Dict, config: GLNConfig, mesh: Mesh,
                       axis: str = "width") -> Callable:
    """Jitted GLN inference with images sharded (batch, H, W@axis, C).

    The canvas width must divide evenly by the mesh size times 128 so
    every level's feature strips stay aligned.
    """
    anchors, counts = config.anchors()
    model = GLN(config=config, train=False)
    anchors_j = jnp.asarray(anchors)

    img_sharding = NamedSharding(mesh, P(None, None, axis, None))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def infer(images, image_sizes):
        images = jax.lax.with_sharding_constraint(images, img_sharding)
        outputs = model.apply(variables, images)
        # postprocess on replicated outputs (top-k/NMS are global ops)
        outputs = {k: jax.lax.with_sharding_constraint(v, repl)
                   for k, v in outputs.items()}
        return postprocess_detections(outputs, anchors_j, counts,
                                      image_sizes, config)

    def run(images: np.ndarray, image_sizes: np.ndarray):
        images = jax.device_put(jnp.asarray(images), img_sharding)
        sizes = jax.device_put(jnp.asarray(image_sizes, jnp.float32), repl)
        return infer(images, sizes)

    return run
