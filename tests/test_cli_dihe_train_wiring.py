"""`dihe train` CLI wiring: --resume (the reference's --load-enc,
cvpce/cli/dihe.py:132) and --grain must reach train_dihe with the right
kwargs. Dataset construction and the loop itself are faked — loop
semantics are covered by tests/test_train_loops.py and
tests/test_grain_loader.py."""
from click.testing import CliRunner


def test_dihe_train_passes_resume_and_loader(monkeypatch, tmp_path):
    import cvpce_tpu.cli.dihe  # noqa: F401 — ensure module import first
    from cvpce_tpu.cli import cli
    from cvpce_tpu.data.grain_loader import GrainLoader

    calls = {}

    def fake_train_dihe(dataset, discset, evaldata, evalset, out, **kw):
        calls.update(kw, out=out)
        return {"state": None, "best": {}}

    class _FakeSet:
        def __init__(self, *a, **k):
            pass

        def __len__(self):
            return 0

    monkeypatch.setattr("cvpce_tpu.train.loops.train_dihe",
                        fake_train_dihe)
    monkeypatch.setattr(
        "cvpce_tpu.data.grocery.GroceryProductsDataset", _FakeSet)
    monkeypatch.setattr(
        "cvpce_tpu.data.grocery.GroceryProductsTestSet", _FakeSet)
    monkeypatch.setattr(
        "cvpce_tpu.data.sku110k.TargetDomainDataset", _FakeSet)

    r = CliRunner().invoke(cli, [
        "dihe", "train", "--source", str(tmp_path),
        "--imgs", str(tmp_path), "--annotations", str(tmp_path),
        "--out", str(tmp_path / "run"), "--epochs", "1",
        "--resume", "--grain"], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert calls["resume"] is True
    assert calls["loader_cls"] is GrainLoader

    calls.clear()
    r = CliRunner().invoke(cli, [
        "dihe", "train", "--source", str(tmp_path),
        "--imgs", str(tmp_path), "--annotations", str(tmp_path),
        "--out", str(tmp_path / "run")], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert calls["resume"] is False
    assert "loader_cls" not in calls


def test_dihe_train_source_type_and_only(monkeypatch, tmp_path):
    """--source-type internal routes to InternalTrainSet; --only filters
    the gp gallery (cvpce/cli/dihe.py:85-87,141-145)."""
    from cvpce_tpu.cli import cli

    seen = {}

    def fake_train_dihe(dataset, discset, evaldata, evalset, out, **kw):
        seen["dataset"] = dataset
        seen["evaldata"] = evaldata
        return {"state": None, "best": {}}

    class _FakeGP:
        def __init__(self, roots, *a, only=None, **k):
            self.roots = roots
            self.only = only

        def __len__(self):
            return 0

    class _FakeInternal:
        def __init__(self, root, **k):
            self.root = root

        def __len__(self):
            return 0

    monkeypatch.setattr("cvpce_tpu.train.loops.train_dihe",
                        fake_train_dihe)
    monkeypatch.setattr(
        "cvpce_tpu.data.grocery.GroceryProductsDataset", _FakeGP)
    monkeypatch.setattr(
        "cvpce_tpu.data.grocery.InternalTrainSet", _FakeInternal)
    monkeypatch.setattr(
        "cvpce_tpu.data.grocery.GroceryProductsTestSet", _FakeGP)
    monkeypatch.setattr(
        "cvpce_tpu.data.sku110k.TargetDomainDataset", _FakeGP)

    base = ["dihe", "train", "--imgs", str(tmp_path),
            "--annotations", str(tmp_path), "--out", str(tmp_path / "o")]
    r = CliRunner().invoke(cli, base + [
        "--source", str(tmp_path), "--only", "Food",
        "--only", "Drinks"], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert isinstance(seen["dataset"], _FakeGP)
    assert seen["dataset"].only == ["Food", "Drinks"]
    assert seen["evaldata"] is seen["dataset"]

    r = CliRunner().invoke(cli, base + [
        "--source", str(tmp_path), "--source-type", "internal",
        "--eval-data", str(tmp_path)], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert isinstance(seen["dataset"], _FakeInternal)
    assert isinstance(seen["evaldata"], _FakeGP)


def test_dihe_eval_split_mapping(monkeypatch, tmp_path):
    """--only none/test/val -> GroceryProductsTestSet only/skip kwargs
    (cvpce/cli/dihe.py:284-298: val = first 2 anns/img, test = rest)."""
    from cvpce_tpu.cli import cli
    from cvpce_tpu.data import defaults

    seen = {}

    class _FakeTestSet:
        def __init__(self, imgs, anns, only=None, skip=None):
            seen["only"], seen["skip"] = only, skip

        def __len__(self):
            return 0

    monkeypatch.setattr(
        "cvpce_tpu.data.grocery.GroceryProductsTestSet", _FakeTestSet)
    monkeypatch.setattr(
        "cvpce_tpu.eval.classification.eval_dihe",
        lambda *a, **k: {1: 0.0})
    # cli.dihe binds load_embedder at module import — patch that name
    monkeypatch.setattr(
        "cvpce_tpu.cli.dihe.load_embedder",
        lambda *a, **k: (None, 0))

    n = defaults.GP_TEST_VALIDATION_SET_SIZE
    base = ["dihe", "eval", "--index", str(tmp_path / "idx.npz")]
    for args, want in [([], (None, None)),
                       (["--only", "val"], (n, None)),
                       (["--only", "test"], (None, n)),
                       (["--validation"], (n, None))]:
        r = CliRunner().invoke(cli, base + args, catch_exceptions=False)
        assert r.exit_code == 0, (args, r.output)
        assert (seen["only"], seen["skip"]) == want, args
