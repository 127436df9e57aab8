"""Native record-cache loader tests."""
import numpy as np
import pytest

from cvpce_tpu.data.cache import (
    CachedDetectionDataset,
    RecordCache,
    native_available,
)


class _FakeDetectionSet:
    def __init__(self, n=6, h=32, w=48):
        self.n, self.h, self.w = n, h, w
        self.rng = np.random.default_rng(0)
        self.items = []
        for i in range(n):
            nb = int(self.rng.integers(1, 5))
            self.items.append({
                "image": self.rng.uniform(
                    size=(h, w, 3)).astype(np.float32),
                "boxes": self.rng.uniform(
                    0, 30, (nb, 4)).astype(np.float32),
                "image_size": np.array([h, w], np.int32),
                "scale": np.float32(1.0),
            })

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.items[i]


def test_native_lib_builds():
    assert native_available()


def test_roundtrip(tmp_path):
    spec = {"a": ((4, 4), np.float32), "b": ((3,), np.int32)}
    cache = RecordCache(str(tmp_path / "c.bin"), spec)
    rng = np.random.default_rng(1)
    data = [{"a": rng.uniform(size=(4, 4)).astype(np.float32),
             "b": rng.integers(0, 100, 3).astype(np.int32)}
            for _ in range(10)]

    class _DS:
        def __len__(self):
            return 10

    cache.build(_DS(), lambda i: data[i], verbose=False)
    cache.open()
    assert len(cache) == 10

    batch = cache.read_batch([3, 7, 0])
    np.testing.assert_array_equal(batch["a"][0], data[3]["a"])
    np.testing.assert_array_equal(batch["a"][1], data[7]["a"])
    np.testing.assert_array_equal(batch["b"][2], data[0]["b"])
    cache.close()


def test_cached_detection_dataset(tmp_path):
    base = _FakeDetectionSet()
    ds = CachedDetectionDataset(base, str(tmp_path / "det.bin"),
                                box_bucket=8, verbose=False)
    assert len(ds) == 6
    item = ds[2]
    np.testing.assert_allclose(item["images"], base[2]["image"])
    nb = len(base[2]["boxes"])
    np.testing.assert_allclose(item["boxes"][:nb], base[2]["boxes"])
    assert item["box_valid"].sum() == nb

    batch = ds.read_batch([0, 5])
    assert batch["images"].shape == (2, 32, 48, 3)
    assert batch["boxes"].shape == (2, 8, 4)


def test_out_of_range_rejected(tmp_path):
    if not native_available():
        pytest.skip("no native lib")
    spec = {"a": ((2,), np.float32)}
    cache = RecordCache(str(tmp_path / "c2.bin"), spec)

    class _DS:
        def __len__(self):
            return 3

    cache.build(_DS(), lambda i: {"a": np.zeros(2, np.float32)},
                verbose=False)
    cache.open()
    with pytest.raises(AssertionError):
        cache.read_batch([5])
