"""Capture jax profiler traces of the train step and detect+embed on the
real TPU (VERDICT r1 #4). Writes to --out (default /tmp/cvpce_traces)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/cvpce_traces")
    args = ap.parse_args()

    from cvpce_tpu.models.gln import GLNConfig
    from cvpce_tpu.train.gln import (GLNTrainConfig, init_train_state,
                                     make_multi_step, make_train_step)
    from cvpce_tpu.utils.profiling import trace

    model_cfg = GLNConfig(canvas_h=256, canvas_w=320,
                          compute_dtype="bfloat16",
                          max_nms_candidates=1024, detections_per_img=256)
    train_cfg = GLNTrainConfig(match_chunk=8192, min_negatives=256)
    anchors, _ = model_cfg.anchors()
    state, optimizer = init_train_state(model_cfg, train_cfg,
                                        jax.random.PRNGKey(0))
    step = make_train_step(model_cfg, train_cfg, anchors, optimizer)
    multi = jax.jit(make_multi_step(step), donate_argnums=(0,))

    k, b, t = 10, 4, 128
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (k, b, 256, 320, 3)).astype(
        np.float32))
    bxy = rng.uniform(0, [260, 196], (k, b, t, 2)).astype(np.float32)
    bwh = rng.uniform(12, 40, (k, b, t, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([bxy, bxy + bwh], -1))
    valid = jnp.ones((k, b, t), bool)
    sizes = jnp.asarray(np.broadcast_to(np.array([256, 320], np.int32),
                                        (k, b, 2)).copy())

    state, metrics = multi(state, images, boxes, valid, sizes)  # compile
    float(metrics["total"][-1])

    train_dir = os.path.join(args.out, "train_step")
    with trace(train_dir):
        state, metrics = multi(state, images, boxes, valid, sizes)
        float(metrics["total"][-1])
    print(json.dumps({"trace": train_dir}), flush=True)


if __name__ == "__main__":
    main()
