"""Gallery-sharded kNN (ops/knn_sharded.py) on the virtual 8-device
mesh: the distributed search must reproduce the single-device
`nearest_neighbors` exactly, padding and tie-breaks included."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpce_tpu.ops.knn import nearest_neighbors
from cvpce_tpu.ops.knn_sharded import (gallery_sharding, make_sharded_nn,
                                       pad_gallery,
                                       sharded_nearest_neighbors)
from cvpce_tpu.parallel.mesh import data_parallel_mesh


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual platform")
    return data_parallel_mesh()


class TestShardedKNN:
    def test_matches_single_device(self, mesh):
        rng = np.random.default_rng(0)
        anchors = rng.normal(size=(100, 64)).astype(np.float32)  # 100 % 8 != 0
        queries = rng.normal(size=(17, 64)).astype(np.float32)
        ref = np.asarray(nearest_neighbors(jnp.asarray(anchors),
                                           jnp.asarray(queries), k=3))
        got = np.asarray(sharded_nearest_neighbors(anchors, queries, k=3,
                                                   mesh=mesh))
        np.testing.assert_array_equal(got, ref)

    def test_tie_break_lowest_index(self, mesh):
        # duplicate rows land on different shards: ties must resolve to
        # the lowest GLOBAL index, like single-device top_k
        rng = np.random.default_rng(1)
        base = rng.normal(size=(16, 32)).astype(np.float32)
        anchors = np.concatenate([base, base])  # rows i and i+16 identical
        queries = base[:5] + 0.0
        idx = np.asarray(sharded_nearest_neighbors(anchors, queries, k=2,
                                                   mesh=mesh))
        ref = np.asarray(nearest_neighbors(jnp.asarray(anchors),
                                           jnp.asarray(queries), k=2))
        np.testing.assert_array_equal(idx, ref)
        assert (idx[:, 0] == np.arange(5)).all()

    def test_padded_rows_never_surface(self, mesh):
        rng = np.random.default_rng(2)
        anchors = rng.normal(size=(9, 16)).astype(np.float32)  # pads to 16
        queries = rng.normal(size=(4, 16)).astype(np.float32)
        idx = np.asarray(sharded_nearest_neighbors(anchors, queries, k=9,
                                                   mesh=mesh))
        assert idx.max() < 9
        ref = np.asarray(nearest_neighbors(jnp.asarray(anchors),
                                           jnp.asarray(queries), k=9))
        np.testing.assert_array_equal(idx, ref)

    def test_reusable_search_with_resident_gallery(self, mesh):
        rng = np.random.default_rng(3)
        anchors = rng.normal(size=(64, 32)).astype(np.float32)
        padded, valid = pad_gallery(anchors, mesh.devices.size)
        sh = gallery_sharding(mesh)
        a_dev = jax.device_put(jnp.asarray(padded), sh)
        v_dev = jax.device_put(jnp.asarray(valid), sh)
        search = make_sharded_nn(mesh, k=4)
        for seed in (4, 5):
            queries = np.random.default_rng(seed).normal(
                size=(8, 32)).astype(np.float32)
            dists, idx = search(a_dev, v_dev, jnp.asarray(queries))
            ref = np.asarray(nearest_neighbors(jnp.asarray(anchors),
                                               jnp.asarray(queries), k=4))
            np.testing.assert_array_equal(np.asarray(idx), ref)
            d = np.asarray(dists)
            assert (np.diff(d, axis=1) >= -1e-7).all()


@pytest.mark.slow
def test_cli_dihe_eval_sharded_gallery(mesh, tmp_path):
    """`dihe eval --sharded-gallery` through the real CLI entry point:
    the flag must build the mesh, shard the index, and produce the same
    accuracy dict shape as the single-device path."""
    import json

    from click.testing import CliRunner
    from PIL import Image

    from cvpce_tpu.cli import cli

    rng = np.random.default_rng(3)
    gal = tmp_path / "gal"
    for cat, name in [("Food/Bakery", "p1"), ("Food/Dairy", "p2")]:
        d = gal / cat
        d.mkdir(parents=True, exist_ok=True)
        arr = rng.uniform(0, 255, (64, 48, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{name}.jpg")
    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    (ann_dir / "s1_1.csv").write_text(
        "Food/Bakery/p1.jpg, 5, 5, 45, 60\n"
        "Food/Dairy/p2.jpg, 50, 5, 90, 60\n")
    img_dir = tmp_path / "imgs"
    (img_dir / "store1" / "images").mkdir(parents=True)
    shelf = rng.uniform(0, 255, (80, 100, 3)).astype(np.uint8)
    Image.fromarray(shelf).save(
        img_dir / "store1" / "images" / "store1_1.jpg")

    args = [
        "dihe", "eval", "--source", str(gal), "--validation",
        "--test-imgs", str(img_dir), "--test-annotations", str(ann_dir),
        "--batch-size", "2", "--k", "1"]
    r = CliRunner().invoke(cli, args + ["--sharded-gallery"])
    assert r.exit_code == 0, r.output
    acc = json.loads(r.output.strip().splitlines()[-1])
    assert set(acc) == {"1"}
    assert 0.0 <= acc["1"] <= 1.0


class TestClassifierSharded:
    def test_classifier_mesh_equivalence(self, mesh):
        from tests.test_classifier import _GallerySet, _stub_encoder

        from cvpce_tpu.pipeline.classifier import Classifier

        gallery = _GallerySet()
        clf = Classifier(_stub_encoder(), 16, gallery, batch_size=4, k=2)
        clf_m = Classifier(_stub_encoder(), 16, gallery, batch_size=4,
                           k=2, mesh=mesh)
        rng = np.random.default_rng(7)
        queries = np.stack([
            np.broadcast_to(gallery.colors[i], (32, 32, 3))
            + rng.normal(0, 0.02, (32, 32, 3)).astype(np.float32)
            for i in (3, 0, 6, 5)
        ]).astype(np.float32)
        assert clf_m.classify(queries) == clf.classify(queries)
