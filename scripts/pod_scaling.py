"""Pod-ready scaling measurement harness (VERDICT r2 #9 / NEXT #6).

Given a device mesh, measures the three pod-scale serving/training
surfaces as a function of device count and problem size:

1. DP detection serving (`ProposalGenerator.detect_batch`) throughput
   at 1, 2, 4, ... N devices;
2. DP training step throughput (same sweep);
3. sharded-gallery kNN vs single-device kNN across gallery sizes — the
   crossover point where sharding the gallery pays for its all_gather.

Runs today on the virtual CPU mesh for correctness (`--cpu --devices 8`
forces `xla_force_host_platform_device_count`; numbers are then about
harness correctness, not hardware); on a real pod the same invocation
produces the turnkey scaling table. Prints JSON lines; the last line is
a machine-readable summary. Smoke-tested in
tests/test_pod_scaling_harness.py.

Usage:
  python scripts/pod_scaling.py --cpu --devices 8 --canvas 128 160
  python scripts/pod_scaling.py                  # real chips, full size
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def report(**kw):
    print(json.dumps(kw), flush=True)


def _bench(fn, warmup: int = 1, iters: int = 3) -> float:
    """Median wall seconds of fn() (fn must block on the result)."""
    import numpy as np

    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def measure_detect_scaling(devices, canvas, batch_per_device, det_cfg):
    """detect_batch images/sec at growing mesh sizes."""
    import jax
    import numpy as np

    from cvpce_tpu.data.synthetic import shelf_scene
    from cvpce_tpu.parallel.mesh import data_parallel_mesh
    from cvpce_tpu.pipeline.proposals import ProposalGenerator
    from cvpce_tpu.models.gln import GLN

    h, w = canvas
    model = GLN(config=det_cfg, train=False)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, h, w, 3), np.float32))
    rows = []
    n = 1
    while n <= len(devices):
        mesh = data_parallel_mesh(devices[:n])
        gen = ProposalGenerator(variables, det_cfg, mesh=mesh)
        images = [shelf_scene(h, w, np.random.default_rng((1, i)))[0]
                  for i in range(batch_per_device * n)]
        dt = _bench(lambda: gen.detect_batch(images))
        rows.append({"devices": n, "images": len(images),
                     "sec": round(dt, 4),
                     "images_per_sec": round(len(images) / dt, 2)})
        report(stage="detect_dp", **rows[-1])
        n *= 2
    return rows


def measure_train_scaling(devices, canvas, batch_per_device, det_cfg):
    """DP train-step steps/sec at growing mesh sizes (the loop's real
    step through parallel/mesh.py:make_dp_train_step)."""
    import jax
    import numpy as np

    from cvpce_tpu.data.sku110k import collate_detection
    from cvpce_tpu.data.synthetic import SyntheticShelfDataset
    from cvpce_tpu.parallel import (data_parallel_mesh, make_dp_train_step,
                                    put_replicated)
    from cvpce_tpu.train import gln as gln_train
    from cvpce_tpu.train.gln import GLNTrainConfig

    h, w = canvas
    train_cfg = GLNTrainConfig(match_chunk=1024, min_negatives=64,
                               steps_per_epoch=8)
    dataset = SyntheticShelfDataset(8, h, w, seed=0)
    anchors, _ = det_cfg.anchors()
    rows = []
    n = 1
    while n <= len(devices):
        mesh = data_parallel_mesh(devices[:n])
        state, optimizer = gln_train.init_train_state(
            det_cfg, train_cfg, jax.random.PRNGKey(0))
        step = gln_train.make_train_step(det_cfg, train_cfg, anchors,
                                         optimizer)
        dp_step = make_dp_train_step(step, mesh, donate_state=False)
        state_r = put_replicated(state, mesh)
        batch = collate_detection(
            [dataset[i % len(dataset)]
             for i in range(batch_per_device * n)], box_bucket=256)

        holder = {"state": state_r}

        def run():
            holder["state"], metrics = dp_step(
                holder["state"], batch["images"], batch["boxes"],
                batch["box_valid"], batch["image_sizes"])
            jax.block_until_ready(metrics)

        dt = _bench(run)
        rows.append({"devices": n, "batch": batch_per_device * n,
                     "sec": round(dt, 4),
                     "steps_per_sec": round(1.0 / dt, 3),
                     "images_per_sec": round(batch_per_device * n / dt,
                                             2)})
        report(stage="train_dp", **rows[-1])
        n *= 2
    return rows


def measure_knn_crossover(devices, gallery_sizes, emb_dim, n_queries,
                          k=5):
    """Single-device vs sharded-gallery kNN across gallery sizes. The
    sharded path all_gathers only (Q, devices*k) candidates, so it wins
    once per-device distance work dominates — this measures where."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cvpce_tpu.ops.knn import nearest_neighbors
    from cvpce_tpu.ops.knn_sharded import (gallery_sharding,
                                           make_sharded_nn, pad_gallery)
    from cvpce_tpu.parallel.mesh import data_parallel_mesh

    mesh = data_parallel_mesh(devices)
    rng = np.random.default_rng(0)
    queries = jnp.asarray(rng.normal(0, 1, (n_queries, emb_dim)
                                     ).astype(np.float32))
    single = jax.jit(lambda a, q: nearest_neighbors(a, q, k))
    search = make_sharded_nn(mesh, k)
    sh = gallery_sharding(mesh)
    rows = []
    for size in gallery_sizes:
        gallery = rng.normal(0, 1, (size, emb_dim)).astype(np.float32)
        g_dev = jax.device_put(jnp.asarray(gallery), jax.devices()[0])
        t_single = _bench(
            lambda: jax.block_until_ready(single(g_dev, queries)))
        padded, valid = pad_gallery(gallery, mesh.devices.size)
        g_sh = jax.device_put(jnp.asarray(padded), sh)
        v_sh = jax.device_put(jnp.asarray(valid), sh)
        t_shard = _bench(
            lambda: jax.block_until_ready(search(g_sh, v_sh, queries)))
        rows.append({"gallery": size,
                     "single_ms": round(t_single * 1e3, 3),
                     "sharded_ms": round(t_shard * 1e3, 3),
                     "sharded_wins": bool(t_shard < t_single)})
        report(stage="knn_crossover", **rows[-1])
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="force a virtual CPU mesh of this size "
                         "(0 = use the real platform's devices)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--canvas", nargs=2, type=int, default=(832, 1344))
    ap.add_argument("--batch-per-device", type=int, default=2)
    ap.add_argument("--gallery-sizes", nargs="+", type=int,
                    default=(4096, 16384, 65536))
    ap.add_argument("--emb-dim", type=int, default=1024)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--skip", nargs="*", default=(),
                    choices=["detect", "train", "knn"],
                    help="skip stages (e.g. train on tiny smoke runs)")
    args = ap.parse_args()

    if args.devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{args.devices}").strip()

    import jax

    if args.cpu or args.devices:
        jax.config.update("jax_platforms", "cpu")

    from cvpce_tpu.models.gln import GLNConfig

    devices = jax.devices()
    h, w = args.canvas
    det_cfg = GLNConfig(canvas_h=h, canvas_w=w,
                        max_nms_candidates=512 if args.cpu else 5120,
                        detections_per_img=128 if args.cpu else 1000,
                        use_pallas_nms=devices[0].platform == "tpu")
    report(platform=devices[0].platform, devices=len(devices),
           canvas=[h, w])

    summary = {}
    if "detect" not in args.skip:
        summary["detect_dp"] = measure_detect_scaling(
            devices, args.canvas, args.batch_per_device, det_cfg)
    if "train" not in args.skip:
        summary["train_dp"] = measure_train_scaling(
            devices, args.canvas, args.batch_per_device, det_cfg)
    if "knn" not in args.skip:
        summary["knn_crossover"] = measure_knn_crossover(
            devices, args.gallery_sizes, args.emb_dim, args.queries)
    report(name="SUMMARY", **summary)


if __name__ == "__main__":
    main()
