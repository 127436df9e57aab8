"""Quantify the dev-tunnel output-fetch cost in the bench loop.

CLAUDE.md: the axon tunnel materializes jit outputs to host per call.
bench.py's detect_embed returns the full embedding tensor
(batch*crops x 1024 f32 ~ 5 MB) — if fetching that serializes into the
timed loop, the bench number underreports on-device throughput, and the
honest fix is to consume embeddings where production consumes them: a
device-resident gallery kNN (pipeline/classifier.py), returning only
top-k indices.

Probes (TPU, steady state):
  1. raw host fetch of a (1280, 1024) f32 device array
  2. trivial jit (x * 1.0001) returning the full array vs its mean
  3. the real embed stage returning embeddings vs a fused gallery-kNN
     head returning (idx, dist) only
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn()
    _block(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _block(out)
    return (time.perf_counter() - start) / iters


def _block(out):
    import jax

    jax.block_until_ready(out)


def main():
    import jax
    import jax.numpy as jnp

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    big_np = rng.normal(size=(1280, 1024)).astype(np.float32)
    big = jnp.asarray(big_np)
    _block(big)

    t = timeit(lambda: np.asarray(big))
    print(f"raw np.asarray fetch of 5.2 MB: {t*1e3:.2f} ms "
          f"({big_np.nbytes / t / 1e6:.0f} MB/s)", flush=True)

    f_big = jax.jit(lambda x: x * 1.0001)
    f_small = jax.jit(lambda x: (x * 1.0001).mean())
    t_big = timeit(lambda: f_big(big))
    t_small = timeit(lambda: f_small(big))
    print(f"trivial jit, big output: {t_big*1e3:.2f} ms | "
          f"scalar output: {t_small*1e3:.2f} ms", flush=True)

    # real embed stage, int8-static path as in bench defaults
    from cvpce_tpu.models.embedders import MACVGG, fold_bn_variables

    bn_model = MACVGG(batch_norm=True)
    bn_vars = bn_model.init(jax.random.PRNGKey(1),
                            jnp.zeros((8, 256, 256, 3), jnp.float32))
    emb_vars = fold_bn_variables(bn_vars)
    embedder = MACVGG(batch_norm=False, int8_all=True, int8_static=True,
                      dtype=jnp.bfloat16)
    crops_np = rng.uniform(-1, 1, (1280, 256, 256, 3)).astype(np.float32)
    crops = jnp.asarray(crops_np)
    _block(crops)

    from cvpce_tpu.models.embedders import calibrate_int8_scales

    cal_model = embedder.clone(int8_static=False, int8_calibrate=True)
    emb_vars = calibrate_int8_scales(cal_model, emb_vars, [crops[:128]])

    chunk = 128

    @jax.jit
    def embed_full(c):
        chunked = c.reshape(-1, chunk, 256, 256, 3)
        return jax.lax.map(lambda x: embedder.apply(emb_vars, x), chunked)

    gallery = jnp.asarray(
        rng.normal(size=(4096, 1024)).astype(np.float32))

    @jax.jit
    def embed_knn(c, g):
        chunked = c.reshape(-1, chunk, 256, 256, 3)
        embs = jax.lax.map(lambda x: embedder.apply(emb_vars, x), chunked)
        embs = embs.reshape(-1, embs.shape[-1])
        from cvpce_tpu.ops.knn import l2_normalize

        sim = jnp.dot(l2_normalize(embs), l2_normalize(g).T,
                      preferred_element_type=jnp.float32)
        d = 1.0 - sim
        neg, idx = jax.lax.top_k(-d, 1)
        return idx.astype(jnp.int32), -neg

    t_embs = timeit(lambda: embed_full(crops), iters=5, warmup=2)
    t_knn = timeit(lambda: embed_knn(crops, gallery), iters=5, warmup=2)
    print(f"embed 1280 crops, return embeddings: {t_embs*1e3:.1f} ms",
          flush=True)
    print(f"embed 1280 crops + gallery kNN, return idx: "
          f"{t_knn*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
