"""Benchmark: detect+embed images/sec/chip on the flagship pipeline.

Measures the BASELINE.json north-star metric — GLN detection (ResNet-50
FPN RetinaNet + Gaussian branch, fixed 832x1344 canvas, fixed-shape NMS)
followed by per-detection crop + MACVGG embedding — end-to-end on device,
steady state, single chip.

`vs_baseline` compares against an estimated reference throughput of 10
images/sec for the torch CUDA path (RetinaNet-800px inference ~ 15 fps on
a V100-class GPU minus the reference's host-side crop loop and per-crop
embedding batches; the reference repo publishes no numbers — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

import numpy as np

REFERENCE_IMAGES_PER_SEC = 10.0  # documented estimate, see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from cvpce_tpu.models.embedders import MACVGG
    from cvpce_tpu.models.gln import GLN, GLNConfig, postprocess_detections
    from cvpce_tpu.ops.image import crop_resize_square_mxu, scale_to_tanh

    platform = jax.devices()[0].platform
    # TPU-sized config on accelerators; shrink on CPU so the bench completes
    if platform == "cpu":
        config = GLNConfig(canvas_h=256, canvas_w=320,
                           max_nms_candidates=512, detections_per_img=128)
        batch = 1
        crops_per_image = 32
        embed_chunk = 32
        iters, warmup = 3, 1
    else:
        # bf16 conv stacks (MXU-native) + Pallas NMS + approx top-k
        config = GLNConfig(compute_dtype="bfloat16", use_pallas_nms=True,
                           use_approx_topk=True)
        batch = 4
        crops_per_image = 128
        embed_chunk = 128  # VGG activations cap HBM; chunk the crops
        iters, warmup = 10, 3

    rng = jax.random.PRNGKey(0)
    gln = GLN(config=config, train=False)
    images = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (batch, config.canvas_h, config.canvas_w, 3)).astype(
            np.float32))
    gln_vars = gln.init(rng, images)
    anchors, counts = config.anchors()
    anchors_j = jnp.asarray(anchors)
    sizes = jnp.full((batch, 2), 0, jnp.float32).at[:, 0].set(
        config.canvas_h).at[:, 1].set(config.canvas_w)

    import jax.numpy as jnp_  # embedder in the same compute dtype
    embedder = MACVGG(batch_norm=True,
                      dtype=jnp_.bfloat16 if platform != "cpu"
                      else jnp_.float32)
    crop_batch = jnp.zeros((crops_per_image, 256, 256, 3), jnp.float32)
    emb_vars = embedder.init(jax.random.PRNGKey(1), crop_batch)

    @jax.jit
    def detect_embed(imgs):
        outputs = gln.apply(gln_vars, imgs)
        res = postprocess_detections(outputs, anchors_j, counts, sizes,
                                     config)
        top_boxes = res["boxes"][:, :crops_per_image]

        crops = jax.vmap(crop_resize_square_mxu)(imgs, top_boxes)
        crops = scale_to_tanh(crops).reshape(
            batch * crops_per_image, 256, 256, 3)
        # chunk the embed stage to bound peak HBM (f32 VGG activations)
        chunked = crops.reshape(-1, embed_chunk, 256, 256, 3)
        embs = jax.lax.map(lambda c: embedder.apply(emb_vars, c), chunked)
        return res["boxes"], res["scores"], embs

    # warmup + compile
    for _ in range(warmup):
        out = detect_embed(images)
    jax.block_until_ready(out)

    start = time.perf_counter()
    for _ in range(iters):
        out = detect_embed(images)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    images_per_sec = batch * iters / elapsed
    print(json.dumps({
        "metric": "detect_embed_images_per_sec_per_chip",
        "value": round(images_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / REFERENCE_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
