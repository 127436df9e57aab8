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
