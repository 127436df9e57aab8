"""Data-layer tests on synthetic fixtures (no real datasets needed)."""
import json

import numpy as np
import pytest
from PIL import Image

from cvpce_tpu.data import (
    GroceryProductsTestSet,
    PrefetchLoader,
    SKU110KDataset,
    collate_detection,
    read_tonioni_planogram,
)
from cvpce_tpu.data import transforms as T
from cvpce_tpu.utils import labels_to_tensors, tensors_to_labels


@pytest.fixture
def sku_fixture(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for name, (w, h), n_boxes in [("a.jpg", (100, 80), 3),
                                  ("b.jpg", (60, 120), 2)]:
        arr = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / name)
        for _ in range(n_boxes):
            x1 = int(rng.integers(0, w - 20))
            y1 = int(rng.integers(0, h - 20))
            rows.append(f"{name},{x1},{y1},{x1 + 15},{y1 + 15},object,{w},{h}")
    rows.append("malformed,row")  # must be skipped
    ann = tmp_path / "ann.csv"
    ann.write_text("\n".join(rows) + "\n")
    return str(img_dir), str(ann)


class TestSKU110K:
    def test_index_and_items(self, sku_fixture):
        img_dir, ann = sku_fixture
        ds = SKU110KDataset(img_dir, ann, flip_chance=0.0,
                            canvas_h=128, canvas_w=128)
        assert len(ds) == 2
        item = ds[0]
        assert item["image"].shape == (128, 128, 3)
        assert item["boxes"].shape[1] == 4
        # canvas scale: 100x80 -> fits 128 canvas, scale = 128/100
        assert item["image_size"][0] <= 128

    def test_skip_list(self, sku_fixture):
        img_dir, ann = sku_fixture
        ds = SKU110KDataset(img_dir, ann, skip=["a.jpg"], flip_chance=0.0,
                            canvas_h=128, canvas_w=128)
        assert len(ds) == 1

    def test_flip_preserves_box_geometry(self, sku_fixture):
        img_dir, ann = sku_fixture
        ds = SKU110KDataset(img_dir, ann, flip_chance=0.0,
                            canvas_h=128, canvas_w=128)
        img, boxes = ds.load_raw(0)
        fimg, fboxes = T.hflip_with_boxes(img, boxes)
        np.testing.assert_allclose(fboxes[:, 2] - fboxes[:, 0],
                                   boxes[:, 2] - boxes[:, 0])
        np.testing.assert_allclose(fimg[:, ::-1], img)

    def test_collate_static_shapes(self, sku_fixture):
        img_dir, ann = sku_fixture
        ds = SKU110KDataset(img_dir, ann, flip_chance=0.0,
                            canvas_h=128, canvas_w=128)
        batch = collate_detection([ds[0], ds[1]], box_bucket=64)
        assert batch["images"].shape == (2, 128, 128, 3)
        assert batch["boxes"].shape == (2, 64, 4)
        assert batch["box_valid"].sum() == 5

    def test_prefetch_loader(self, sku_fixture):
        img_dir, ann = sku_fixture
        ds = SKU110KDataset(img_dir, ann, flip_chance=0.0,
                            canvas_h=128, canvas_w=128)
        loader = PrefetchLoader(ds, batch_size=1,
                                collate=collate_detection, shuffle=True,
                                num_threads=2, drop_last=False)
        batches = list(loader)
        assert len(batches) == 2


@pytest.fixture
def gp_test_fixture(tmp_path):
    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    (ann_dir / "s1_2.csv").write_text(
        "Food/Bakery/p1.jpg, 10, 20, 50, 80\n"
        "Food/Dairy/p2.jpg, 60, 20, 90, 80\n"
        "bad,row\n"
    )
    img_dir = tmp_path / "imgs"
    (img_dir / "store1" / "images").mkdir(parents=True)
    arr = np.zeros((100, 120, 3), np.uint8)
    Image.fromarray(arr).save(img_dir / "store1" / "images" / "store1_2.jpg")
    return str(img_dir), str(ann_dir)


class TestGPTestSet:
    def test_parse(self, gp_test_fixture):
        img_dir, ann_dir = gp_test_fixture
        ds = GroceryProductsTestSet(img_dir, ann_dir)
        assert len(ds) == 1
        img, anns, boxes = ds[0]
        assert anns == ["Food/Bakery/p1", "Food/Dairy/p2"]
        assert boxes.shape == (2, 4)
        assert img.shape == (100, 120, 3)

    def test_validation_split_slicing(self, gp_test_fixture):
        img_dir, ann_dir = gp_test_fixture
        ds = GroceryProductsTestSet(img_dir, ann_dir, only=1)
        _, anns, boxes = ds[0]
        assert anns == ["Food/Bakery/p1"]
        ds2 = GroceryProductsTestSet(img_dir, ann_dir, skip=1)
        _, anns2, _ = ds2[0]
        assert anns2 == ["Food/Dairy/p2"]


class TestTonioniPlanogram:
    def test_grid_layout(self, tmp_path):
        # 2x2 grid in Tonioni JSON convention: n/s/e/w neighbor indices,
        # -1 = none. Node order: 0 TL, 1 TR, 2 BL, 3 BR.
        plano = {
            "graph": [
                {"ogg": 0, "n": -1, "s": 2, "e": 1, "w": -1},
                {"ogg": 1, "n": -1, "s": 3, "e": -1, "w": 0},
                {"ogg": 0, "n": 0, "s": -1, "e": 3, "w": -1},
                {"ogg": 1, "n": 1, "s": -1, "e": -1, "w": 2},
            ],
            "objects": [
                {"width": 2.0, "height": 3.0, "img_path": "prodA.png"},
                {"width": 2.0, "height": 3.0, "img_path": "prodB.png"},
            ],
        }
        p = tmp_path / "plano.json"
        p.write_text(json.dumps(plano))
        boxes, labels, g = read_tonioni_planogram(str(p))
        assert boxes.shape == (4, 4)
        assert labels == ["prodA", "prodB", "prodA", "prodB"]
        # all boxes 2 x 3
        np.testing.assert_allclose(boxes[:, 2] - boxes[:, 0], 2.0)
        np.testing.assert_allclose(boxes[:, 3] - boxes[:, 1], 3.0)
        # two columns at distinct x, two rows at distinct y
        assert len(set(boxes[:, 0].tolist())) == 2
        assert len(set(boxes[:, 1].tolist())) == 2
        # left column nodes share x, top row nodes share y
        assert boxes[0, 0] == boxes[2, 0]
        assert boxes[1, 0] == boxes[3, 0]
        assert boxes[0, 1] == boxes[1, 1]
        assert boxes[2, 1] == boxes[3, 1]
        # graph got relabeled with product labels
        assert g.nodes[0]["label"] == "prodA"
        assert g[0][1]["dir"] == "E"


class TestLabelMapping:
    def test_roundtrip(self):
        l1 = ["a", "b", "a", "c"]
        l2 = ["c", "d"]
        a1, a2, key = labels_to_tensors(l1, l2)
        assert len(key) == 4
        back1, back2 = tensors_to_labels(key, a1, a2)
        assert back1 == l1
        assert back2 == l2


class TestTransforms:
    def test_detection_canvas_scales_boxes(self):
        img = np.zeros((200, 100, 3), np.float32)
        boxes = np.array([[10, 20, 50, 100]], np.float32)
        canvas, sboxes, (ch, cw), scale = T.detection_canvas(
            img, boxes, 256, 256, min_size=200, max_size=400)
        assert canvas.shape == (256, 256, 3)
        assert ch == 256 and cw == 128
        np.testing.assert_allclose(sboxes, [[12.8, 25.6, 64, 128]],
                                   rtol=1e-5)

    def test_resize_for_classification_pads_gray(self):
        img = np.ones((10, 20, 3), np.float32)
        out = T.resize_for_classification(img, size=32)
        assert out.shape == (32, 32, 3)
        assert out[31, 0, 0] == pytest.approx(0.5, abs=0.01)  # bottom pad
        assert out[0, 0, 0] == pytest.approx(1.0, abs=0.01)

    def test_white_background_mask(self):
        img = np.ones((32, 32, 3), np.float32)
        img[8:24, 8:24] = 0.2  # dark product in the middle
        mask = T.build_white_background_mask(img)
        assert mask[0, 0] and mask[31, 31]
        assert not mask[16, 16]


class TestDetectionEvalAdapter:
    def test_wraps_any_image_boxes_dataset(self):
        from cvpce_tpu.eval.proposals import DetectionEvalAdapter

        rng = np.random.default_rng(0)

        class _Base:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                img = rng.uniform(0, 1, (100, 80, 3)).astype(np.float32)
                boxes = np.array([[10, 10, 40, 50]], np.float32)
                return img, ["ann"], boxes

        ds = DetectionEvalAdapter(_Base(), lambda it: (it[0], it[2]),
                                  canvas_h=128, canvas_w=128)
        assert len(ds) == 2
        item = ds[0]
        assert item["image"].shape == (128, 128, 3)
        assert item["orig_boxes"].shape == (1, 4)
        # boxes scaled by the canvas transform scale
        np.testing.assert_allclose(
            item["boxes"][0] / item["scale"], item["orig_boxes"][0],
            rtol=1e-3, atol=0.51)
