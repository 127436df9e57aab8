"""Honest train-step throughput on the real TPU. Prints JSON lines.

The training loop's wall-clock per chunk includes the dev-tunnel's state
pytree round-trip (~310 MB at ~25 MB/s — CLAUDE.md timing caveat). Here
we time a k-step `make_multi_step` scan where the only host fetch is the
final scalar loss: the k-step device time divided by k is the true
per-step cost a real TPU host would see.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(canvas=(832, 1344), batch=2, k=10, boxes_per_img=400):
    from cvpce_tpu.models.gln import GLNConfig
    from cvpce_tpu.train.gln import (GLNTrainConfig, init_train_state,
                                     make_multi_step, make_train_step)

    h, w = canvas
    model_cfg = GLNConfig(canvas_h=h, canvas_w=w, compute_dtype="bfloat16",
                          max_nms_candidates=1024, detections_per_img=256)
    train_cfg = GLNTrainConfig()
    anchors, _ = model_cfg.anchors()
    state, optimizer = init_train_state(model_cfg, train_cfg,
                                        jax.random.PRNGKey(0))
    step = make_train_step(model_cfg, train_cfg, anchors, optimizer)
    multi = jax.jit(make_multi_step(step), donate_argnums=(0,))

    t = boxes_per_img
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (k, batch, h, w, 3)).astype(np.float32)
    bxy = rng.uniform(0, [w - 60, h - 60], (k, batch, t, 2)).astype(
        np.float32)
    bwh = rng.uniform(20, 60, (k, batch, t, 2)).astype(np.float32)
    boxes = np.concatenate([bxy, bxy + bwh], -1)
    valid = np.ones((k, batch, t), bool)
    sizes = np.full((k, batch, 2), 0, np.int32)
    sizes[..., 0], sizes[..., 1] = h, w

    args = tuple(jnp.asarray(a) for a in (images, boxes, valid, sizes))

    # compile + warm
    state, metrics = multi(state, *args)
    float(metrics["total"][-1])  # fetch scalars only

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = multi(state, *args)
        float(metrics["total"][-1])
    sec_per_step = (time.perf_counter() - t0) / (iters * k)
    print(json.dumps({
        "name": f"train_step_{h}x{w}_b{batch}",
        "ms_per_step": round(sec_per_step * 1000, 2),
        "train_imgs_per_sec": round(batch / sec_per_step, 1),
        "k": k,
    }), flush=True)


if __name__ == "__main__":
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    main()
    main(canvas=(256, 320), batch=4, k=25, boxes_per_img=128)
    print(json.dumps({"name": "DONE"}), flush=True)
