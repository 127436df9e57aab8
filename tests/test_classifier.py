"""Gallery Classifier tests with a stub encoder (no conv nets)."""
import numpy as np
import pytest

from cvpce_tpu.pipeline.classifier import Classifier


def _stub_encoder(dim=16):
    """Encodes an image to the mean color tiled into `dim` dims, L2'd —
    deterministic, separable by color."""
    def encode(imgs):
        import jax.numpy as jnp

        m = jnp.mean(imgs, axis=(1, 2))  # (B, 3)
        reps = dim // 3 + 1
        v = jnp.tile(m, (1, reps))[:, :dim]
        return v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True),
                               1e-8)
    return encode


class _GallerySet:
    """8 products with distinct dominant colors."""

    def __init__(self, n=8, size=32):
        rng = np.random.default_rng(0)
        self.colors = rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
        self.items = []
        for i in range(n):
            img = np.broadcast_to(self.colors[i], (size, size, 3)).copy()
            img += rng.normal(0, 0.01, img.shape).astype(np.float32)
            self.items.append((img, img, ["cat"], f"prod{i}"))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class TestClassifier:
    def test_index_build_and_classify(self):
        gallery = _GallerySet()
        clf = Classifier(_stub_encoder(), 16, gallery, batch_size=4, k=2)
        assert clf.embedding.shape == (8, 16)
        assert clf.annotations == [f"prod{i}" for i in range(8)]

        # query with slightly-noised gallery colors -> top-1 must match
        rng = np.random.default_rng(1)
        queries = np.stack([
            np.broadcast_to(gallery.colors[i], (32, 32, 3))
            + rng.normal(0, 0.02, (32, 32, 3)).astype(np.float32)
            for i in (3, 0, 6)
        ]).astype(np.float32)
        res = clf.classify(queries)
        assert [r[0] for r in res] == ["prod3", "prod0", "prod6"]
        assert all(len(r) == 2 for r in res)

    def test_index_average_collapses_variant_groups(self):
        """index_average=F collapses F consecutive same-annotation items
        into one mean-embedding entry (expected embedding under a
        variant distribution, e.g. AugmentedGallerySet)."""
        gallery = _GallerySet(n=4)

        class Variants:
            def __len__(self):
                return 3 * len(gallery)

            def __getitem__(self, i):
                j, v = divmod(i, 3)
                img, gen, hier, ann = gallery[j]
                out = np.clip(img + 0.05 * v, 0.0, 1.0).astype(np.float32)
                return out, gen, hier, ann

        clf = Classifier(_stub_encoder(), 16, Variants(), batch_size=4,
                         index_average=3)
        assert clf.embedding.shape == (4, 16)
        assert clf.annotations == [f"prod{i}" for i in range(4)]
        # each entry is the raw mean of its variants' embeddings
        flat = Classifier(_stub_encoder(), 16, Variants(), batch_size=4)
        np.testing.assert_allclose(
            clf.embedding, flat.embedding.reshape(4, 3, 16).mean(1),
            rtol=1e-5)
        # mismatched annotations inside a group must be rejected
        class Bad:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                img, gen, hier, _ = gallery[0]
                return img, gen, hier, f"prod{i}"

        with pytest.raises(AssertionError):
            Classifier(_stub_encoder(), 16, Bad(), batch_size=4,
                       index_average=2)

    def test_partial_batch_padding(self):
        gallery = _GallerySet(n=5)
        clf = Classifier(_stub_encoder(), 16, gallery, batch_size=4, k=1)
        assert clf.embedding.shape == (5, 16)  # 4 + padded final 1

    def test_save_load_index(self, tmp_path):
        gallery = _GallerySet()
        clf = Classifier(_stub_encoder(), 16, gallery, batch_size=4)
        path = str(tmp_path / "index.npz")
        clf.save_index(path)

        clf2 = Classifier(_stub_encoder(), 16, load=path, k=1)
        np.testing.assert_allclose(clf2.embedding, clf.embedding)
        assert clf2.annotations == clf.annotations

        q = np.broadcast_to(gallery.colors[2], (1, 32, 32, 3)).astype(
            np.float32)
        assert clf2.classify(q)[0][0] == "prod2"

    def test_return_embedding(self):
        gallery = _GallerySet()
        clf = Classifier(_stub_encoder(), 16, gallery, batch_size=4)
        q = np.stack([gallery.items[0][0], gallery.items[1][0]])
        res, emb = clf.classify(q, return_embedding=True)
        assert emb.shape == (2, 16)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0,
                                   atol=1e-5)
