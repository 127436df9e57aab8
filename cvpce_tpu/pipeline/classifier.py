"""Gallery classifier: embed a product gallery once, classify crops by
cosine-kNN.

Re-design of cvpce/production.py:22-74. The gallery index is built with a
jitted batched encoder forward; queries run through the same jitted encoder
and one MXU distance matmul + top-k (ops/knn.py) instead of the reference's
meshgrid gather + argsort (models/classification.py:90-95).
"""
from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import nearest_neighbors

Array = jnp.ndarray


class Classifier:
    def __init__(self, encoder_fn: Callable[[Array], Array],
                 embedding_size: int,
                 sample_set=None, batch_size: int = 32, k: int = 1,
                 load: Optional[str] = None, verbose: bool = False,
                 mesh=None, index_average: int = 1):
        """
        Args:
          encoder_fn: jitted (B, 256, 256, 3) [-1,1]-scaled -> (B, D)
            embedding function (already closed over params).
          sample_set: dataset yielding (emb_img, gen_img, hierarchy, ann)
            tuples (gp_annotated semantics) or (img, img, cls, cls).
          mesh: optional 1-D jax.sharding.Mesh — the gallery lives
            row-sharded across its devices and searches run via
            ops/knn_sharded.py (per-shard top-k + all_gather merge,
            result identical to the single-device path). Scales index
            HBM with chip count for pod-size galleries.
          index_average: >1 collapses each run of `index_average`
            CONSECUTIVE sample_set items (which must share an
            annotation, e.g. data/synthetic.py:AugmentedGallerySet
            variants) into ONE index entry holding their mean
            embedding — the product's expected embedding under the
            variant distribution. Cosine search renormalizes, so the
            entry is the normalized centroid direction.
        """
        self.encoder_fn = encoder_fn
        self.embedding_size = embedding_size
        self.batch_size = batch_size
        self.k = k
        self.index_average = index_average
        if load is not None:
            if index_average > 1:
                import warnings

                # averaging happens at build time only; a flat saved
                # index restores per-variant entries as-is (ADVICE r4)
                warnings.warn(
                    "index_average>1 is ignored when loading a saved "
                    "index; it only applies in build_index", stacklevel=2)
            self.embedding, self.annotations, scales = self._load_index(
                load)
            if scales is not None and hasattr(encoder_fn, "set_scales"):
                # restore the int8 act scales the index was built with so
                # queries embed in the same numerics as the gallery
                encoder_fn.set_scales(scales)
        else:
            assert sample_set is not None
            self.embedding, self.annotations = self.build_index(
                sample_set, verbose)
        self.mesh = mesh
        if mesh is not None:
            from ..ops.knn_sharded import (gallery_sharding,
                                           make_sharded_nn, pad_gallery)

            padded, valid = pad_gallery(self.embedding,
                                        mesh.devices.size)
            sh = gallery_sharding(mesh)
            self._anchors_dev = jax.device_put(jnp.asarray(padded), sh)
            self._valid_dev = jax.device_put(jnp.asarray(valid), sh)
            self._sharded_search = make_sharded_nn(mesh, k)
            self._use_fused = False
            return
        # keep the gallery resident on device; re-uploading it per
        # classify() call costs more than the search itself
        self._anchors_dev = jnp.asarray(self.embedding)
        # fused Pallas kNN pays off once the gallery spans many tiles
        self._use_fused = len(self.embedding) >= 4096 and k <= 8

    def build_index(self, sample_set, verbose: bool = False):
        embeddings: List[np.ndarray] = []
        annotations: List = []
        n = len(sample_set)
        if getattr(self.encoder_fn, "needs_calibration", False) and n:
            # int8 static-scale encoder: calibrate activation scales on
            # the gallery itself before embedding it (scales persist
            # with the index via save_index)
            cal_batches = []
            for start in range(0, min(n, 4 * self.batch_size),
                               self.batch_size):
                items = [sample_set[i] for i in
                         range(start, min(start + self.batch_size, n))]
                cal_batches.append(jnp.asarray(
                    np.stack([it[0] for it in items])))
            self.encoder_fn.calibrate(cal_batches)
        for start in range(0, n, self.batch_size):
            idxs = range(start, min(start + self.batch_size, n))
            items = [sample_set[i] for i in idxs]
            imgs = np.stack([it[0] for it in items])
            anns = [it[3] if len(it) > 3 else it[2] for it in items]
            emb = self._embed(imgs)
            embeddings.append(np.asarray(emb))
            annotations += list(anns)
            if verbose and (start // self.batch_size) % 100 == 0:
                print(start)
        embedding = (np.concatenate(embeddings)
                     if embeddings else
                     np.zeros((0, self.embedding_size), np.float32))
        f = self.index_average
        if f > 1 and len(embedding):
            assert len(embedding) % f == 0, \
                f"index_average={f} must divide gallery size {len(embedding)}"
            groups = [annotations[i * f:(i + 1) * f]
                      for i in range(len(annotations) // f)]
            assert all(len(set(map(str, g))) == 1 for g in groups), \
                "index_average groups must share one annotation"
            embedding = embedding.reshape(-1, f,
                                          embedding.shape[-1]).mean(1)
            annotations = annotations[::f]
        return embedding, annotations

    def _embed(self, imgs: np.ndarray) -> np.ndarray:
        """Pad the final partial batch to the static batch size for jit."""
        b = len(imgs)
        if b < self.batch_size:
            pad = np.zeros((self.batch_size - b, *imgs.shape[1:]),
                           imgs.dtype)
            out = self.encoder_fn(jnp.asarray(np.concatenate([imgs, pad])))
            return np.asarray(out)[:b]
        return np.asarray(self.encoder_fn(jnp.asarray(imgs)))

    def save_index(self, path: str) -> None:
        extra = {}
        scales = getattr(self.encoder_fn, "get_scales", lambda: None)()
        if scales is not None:
            # persist the int8 act scales the gallery was embedded with
            extra["act_scales"] = np.array([scales], dtype=object)
        np.savez(path, embedding=self.embedding,
                 annotations=np.array(self.annotations, dtype=object),
                 **extra)

    @staticmethod
    def load_index(path: str):
        emb, anns, _ = Classifier._load_index(path)
        return emb, anns

    @staticmethod
    def _load_index(path: str):
        data = np.load(path, allow_pickle=True)
        scales = (data["act_scales"][0] if "act_scales" in data.files
                  else None)
        return data["embedding"], list(data["annotations"]), scales

    def classify(self, images: np.ndarray,
                 return_embedding: bool = False):
        """images: (N, 256, 256, 3) in [-1, 1] (tanh) scale. Returns a list
        of k-nearest annotation lists per image
        (cvpce/production.py:57-74)."""
        results: List[List] = []
        embs: List[np.ndarray] = []
        anchor = self._anchors_dev
        for start in range(0, len(images), self.batch_size):
            batch = images[start:start + self.batch_size]
            emb = self._embed(np.asarray(batch))
            embs.append(emb)
            if self.mesh is not None:
                _, nearest = self._sharded_search(
                    self._anchors_dev, self._valid_dev, jnp.asarray(emb))
                nearest = np.asarray(nearest)
            elif self._use_fused:
                from ..ops.knn_pallas import nearest_neighbors_fused

                _, nearest = nearest_neighbors_fused(
                    anchor, jnp.asarray(emb), k=self.k)
                nearest = np.asarray(nearest)
            else:
                nearest = np.asarray(nearest_neighbors(
                    anchor, jnp.asarray(emb), k=self.k))
            results += [[self.annotations[j] for j in row]
                        for row in nearest]
        if return_embedding:
            return results, (np.concatenate(embs) if embs else
                             np.zeros((0, self.embedding_size), np.float32))
        return results
